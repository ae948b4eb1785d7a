"""Convert a PyTorch RWKV checkpoint to the .bin model format
(parity: python/convert_pytorch_to_ggml.py).

Usage: python -m rwkv_tpu.tools.convert model.pth model.bin FP16
"""

import argparse

from rwkv_tpu.formats.convert import convert_pth


def main():
    p = argparse.ArgumentParser(description="Convert a PyTorch RWKV checkpoint to .bin")
    p.add_argument("src_path")
    p.add_argument("dest_path")
    p.add_argument("data_type", choices=["FP16", "FP32", "float16", "float32"], default="FP16")
    args = p.parse_args()
    convert_pth(args.src_path, args.dest_path, args.data_type)
    print("Done")


if __name__ == "__main__":
    main()
