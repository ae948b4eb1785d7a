"""Generate completions from a prompt (parity: python/generate_completions.py).

Usage: python -m rwkv_tpu.tools.generate_completions MODEL.bin [tokenizer] \
           [--prompt TEXT] [--count 3] [--tokens 100] [--temperature 0.8] [--top-p 0.5]
"""

import argparse
import time

import numpy as np

from rwkv_tpu.runtime.context import Context, system_info
from rwkv_tpu.utils.sampling import sample_logits
from rwkv_tpu.utils.tokenizer import get_tokenizer

DEFAULT_PROMPT = """# rwkv_tpu

A TPU-native inference engine for RWKV language models, supporting FP32, FP16 and
quantized INT4/INT5/INT8 model files, built on JAX, XLA and Pallas."""


def main():
    p = argparse.ArgumentParser(description="Generate completions from an RWKV model")
    p.add_argument("model_path")
    p.add_argument("tokenizer", nargs="?", default="auto", help="auto | 20B | world")
    p.add_argument("--prompt", default=DEFAULT_PROMPT)
    p.add_argument("--count", type=int, default=3)
    p.add_argument("--tokens", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=0.5)
    args = p.parse_args()

    print(f"System info: {system_info()}")
    ctx = Context(args.model_path)
    decode, encode = get_tokenizer(args.tokenizer, ctx.n_vocab)

    prompt_tokens = encode(args.prompt)
    print(f"{len(prompt_tokens)} tokens in prompt")
    init_logits, init_state = ctx.eval_sequence_in_chunks(prompt_tokens, chunk_size=16)

    for generation in range(args.count):
        print(f"\n--- Generation {generation} ---\n")
        print(args.prompt, end="[")
        start = time.time()
        logits, state = init_logits, init_state
        out_tokens = []
        for _ in range(args.tokens):
            token = sample_logits(np.asarray(logits), args.temperature, args.top_p)
            out_tokens.append(token)
            logits, state = ctx.eval(token, state)
        print(decode(out_tokens), end="]")
        dt = time.time() - start
        print(f"\nTook {dt:.3f} sec, {int(1000*dt/args.tokens)} ms per token")


if __name__ == "__main__":
    main()
