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


def _spec_generate(ctx, args, prompt_tokens, decode):
    """Speculative decoding path: all `count` generations run as one batch of
    streams, each emitting the target's exact greedy stream (temperature 0)
    or exact sampled distribution (runtime/speculative.py)."""
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops import linear as L
    from rwkv_tpu.runtime import generate as G
    from rwkv_tpu.runtime import speculative as S

    tcfg, tprm = ctx.cfg, ctx._params
    B = args.count

    if args.draft == "lookup":
        # draft-free prompt-lookup speculation (greedy only)
        if args.temperature != 0:
            raise SystemExit("--draft lookup is greedy-only; use --temperature 0")
        window = 512
        hist = prompt_tokens[:-1][-(window - 2):]
        tok0 = jnp.full((B,), prompt_tokens[-1], jnp.int32)
        tst = G.batched_init_state(tcfg, B)
        if hist:
            pre = jnp.asarray([hist] * B, jnp.int32)
            lens = jnp.full((B,), len(hist), jnp.int32)
            _, tst = G.prefill(tprm, tcfg, pre, tst, lens)
        history = jnp.asarray([hist or [0]] * B, jnp.int32)
        hlen = jnp.full((B,), len(hist), jnp.int32)
        start = time.time()
        out, accept, _ = S.lookup_generate(
            tprm, tcfg, tok0, tst, history, hlen, steps=args.tokens,
            k=args.spec_k, window=window)
        dt = time.time() - start
        for g in range(B):
            print(f"\n--- Generation {g} (speculative, prompt-lookup) ---\n")
            print(args.prompt, end="[")
            print(decode(out[g].tolist()), end="]\n")
        print(f"\nTook {dt:.3f} sec for {B}x{args.tokens} tokens "
              f"({1000 * dt / (B * args.tokens):.1f} ms per token effective); "
              f"draft accept rate {accept:.2f}")
        return

    modes = {"int8": "block", "int4": "int4", "int5": "int5",
             "w8a8": "w8a8", "w4a8": "w4a8"}
    if args.draft in modes:
        dcfg = tcfg
        dprm = L.quantize_params_device(tprm, mode=modes[args.draft])
        label = f"self-speculation/{args.draft}"
    else:
        dcfg, dprm = P.load_params(args.draft, parity=False)
        dprm = jax.tree.map(jnp.asarray, dprm)
        label = args.draft

    tok0 = jnp.full((B,), prompt_tokens[-1], jnp.int32)
    tst = G.batched_init_state(tcfg, B)
    dst = G.batched_init_state(dcfg, B)
    if len(prompt_tokens) > 1:
        pre = jnp.asarray([prompt_tokens[:-1]] * B, jnp.int32)
        lens = jnp.full((B,), pre.shape[1], jnp.int32)
        _, tst = G.prefill(tprm, tcfg, pre, tst, lens)
        _, dst = G.prefill(dprm, dcfg, pre, dst, lens)

    temp = None if args.temperature == 0 else args.temperature
    start = time.time()
    out, accept, _ = S.speculative_generate(
        dprm, dcfg, tprm, tcfg, tok0, dst, tst, steps=args.tokens,
        k=args.spec_k, temperature=temp, top_p=args.top_p,
        key=jax.random.PRNGKey(0))
    dt = time.time() - start
    for g in range(B):
        print(f"\n--- Generation {g} (speculative, draft={label}) ---\n")
        print(args.prompt, end="[")
        print(decode(out[g].tolist()), end="]\n")
    print(f"\nTook {dt:.3f} sec for {B}x{args.tokens} tokens "
          f"({1000 * dt / (B * args.tokens):.1f} ms per token effective); "
          f"draft accept rate {accept:.2f}")


def main():
    p = argparse.ArgumentParser(description="Generate completions from an RWKV model")
    p.add_argument("model_path")
    p.add_argument("tokenizer", nargs="?", default="auto", help="auto | 20B | world")
    p.add_argument("--prompt", default=DEFAULT_PROMPT)
    p.add_argument("--count", type=int, default=3)
    p.add_argument("--tokens", type=int, default=100)
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=0.5)
    p.add_argument("--draft", default=None,
                   help="speculative decoding: int8|int4|int5|w8a8|w4a8 "
                        "(self-speculation with the same weights quantized), "
                        "a path to a smaller draft model file, or 'lookup' "
                        "(draft-free n-gram prompt lookup, greedy only)")
    p.add_argument("--spec-k", type=int, default=5,
                   help="draft tokens proposed per speculative round")
    args = p.parse_args()

    print(f"System info: {system_info()}")
    ctx = Context(args.model_path)
    decode, encode = get_tokenizer(args.tokenizer, ctx.n_vocab)

    prompt_tokens = encode(args.prompt)
    print(f"{len(prompt_tokens)} tokens in prompt")

    if args.draft:
        _spec_generate(ctx, args, prompt_tokens, decode)
        return
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
