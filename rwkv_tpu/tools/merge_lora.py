"""Merge a LoRA .pth into a .bin model (parity: python/merge_lora_into_ggml.py).

Usage: python -m rwkv_tpu.tools.merge_lora SRC.bin v5.2 LORA.pth 32 DEST.bin
"""

import argparse

from rwkv_tpu.formats.lora import merge_lora_file


def main():
    p = argparse.ArgumentParser(description="Merge a PyTorch LoRA checkpoint into a .bin model")
    p.add_argument("src_path")
    p.add_argument("rwkv_arch_version", choices=["v4", "v5.1", "v5.2", "v6.0", "v7.0"])
    p.add_argument("lora_path")
    p.add_argument("lora_alpha", type=int)
    p.add_argument("dest_path")
    args = p.parse_args()
    merge_lora_file(
        args.src_path, args.rwkv_arch_version, args.lora_path, args.lora_alpha, args.dest_path
    )
    print("Done")


if __name__ == "__main__":
    main()
