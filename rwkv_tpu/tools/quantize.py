"""Quantize an FP32/FP16 .bin model file (parity: python/quantize.py + extras/quantize.c).

Usage: python -m rwkv_tpu.tools.quantize IN.bin OUT.bin Q5_1
"""

import argparse

from rwkv_tpu.formats import container
from rwkv_tpu.formats.quantize import quantize_model_file


def main():
    p = argparse.ArgumentParser(description="Quantize an RWKV model file")
    p.add_argument("src_path")
    p.add_argument("dest_path")
    p.add_argument("format_name", choices=list(container.QUANT_TARGETS))
    args = p.parse_args()
    quantize_model_file(args.src_path, args.dest_path, args.format_name, verbose=True)


if __name__ == "__main__":
    main()
