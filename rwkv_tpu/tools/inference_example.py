"""Minimal API usage example (parity: python/inference_example.py).

Usage: python -m rwkv_tpu.tools.inference_example MODEL.bin [tokenizer]
"""

import argparse

import numpy as np

from rwkv_tpu.runtime.context import Context
from rwkv_tpu.utils.sampling import sample_logits
from rwkv_tpu.utils.tokenizer import get_tokenizer


def main():
    p = argparse.ArgumentParser(description="Minimal RWKV inference example")
    p.add_argument("model_path")
    p.add_argument("tokenizer", nargs="?", default="auto")
    args = p.parse_args()

    ctx = Context(args.model_path)
    decode, encode = get_tokenizer(args.tokenizer, ctx.n_vocab)

    prompt = "One upon a time,"
    print(prompt, end="")
    logits, state = ctx.eval_sequence_in_chunks(encode(prompt), chunk_size=16)
    tokens = []
    for _ in range(32):
        token = sample_logits(np.asarray(logits), temperature=1.0, top_p=0.8)
        tokens.append(token)
        logits, state = ctx.eval(token, state)
    print(decode(tokens))


if __name__ == "__main__":
    main()
