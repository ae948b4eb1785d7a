"""Measure perplexity + latency on a text file (parity: python/measure_pexplexity.py).

Usage: python -m rwkv_tpu.tools.measure_perplexity MODEL.bin TEXT.txt \
           IGNORE_FIRST_N [TOKEN_LIMIT] [tokenizer]
"""

import argparse
import os

from rwkv_tpu.runtime.context import Context
from rwkv_tpu.utils.perplexity import measure_perplexity
from rwkv_tpu.utils.tokenizer import get_tokenizer


def main():
    p = argparse.ArgumentParser(description="Measure perplexity of an RWKV model on a text file")
    p.add_argument("model_path")
    p.add_argument("text_path")
    p.add_argument("ignore_first_n_tokens", type=int)
    p.add_argument("token_limit", nargs="?", type=int, default=-1)
    p.add_argument("tokenizer", nargs="?", default="auto")
    args = p.parse_args()

    print("Loading model")
    ctx = Context(args.model_path)
    print("Loading text")
    text = open(args.text_path, encoding="utf-8").read()
    _, encode = get_tokenizer(args.tokenizer, ctx.n_vocab)
    tokens = encode(text)
    print(f"{len(tokens)} tokens in the text")

    if not (args.token_limit == -1 or args.token_limit > 0):
        raise ValueError("Invalid token_limit")
    if args.token_limit != -1 and len(tokens) > args.token_limit:
        tokens = tokens[: args.token_limit]
        print(f"Text was limited to {args.token_limit} tokens")

    r = measure_perplexity(ctx, tokens, args.ignore_first_n_tokens)
    print(
        f"Model: {os.path.basename(args.model_path)}, "
        f"data: {os.path.basename(args.text_path)} with {r.token_count} tokens, "
        f"skipped {r.skipped} tokens, "
        f"averages: loss [{r.loss:.3f}], perplexity {r.perplexity:.3f}, "
        f"latency {int(r.ms_per_token)} ms per token"
    )


if __name__ == "__main__":
    main()
