"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: decode throughput (tokens/sec/chip) on an RWKV-7 World 1.5B-class
config (L24 D2048 H32 S64, bf16 dense weights), batch of 8 independent
streams, whole decode loop on device (runtime/generate.py).

vs_baseline compares against the reference's RWKV-4 1.5B FP16 CPU latency
(117 ms/token -> 8.547 tok/s, README.md:30 / BASELINE.md) — the closest
published single-stream 1.5B-class number the reference ships. No real
checkpoints are fetchable in this environment (zero egress), so weights are
synthetic; throughput does not depend on weight values.

Extra metrics go to stderr so stdout stays a single JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from rwkv_tpu.models import synth
    from rwkv_tpu.runtime import generate as G

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
    t0 = time.time()
    params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
    jax.block_until_ready(params)
    print(f"params built on device in {time.time()-t0:.1f}s", file=sys.stderr)

    B = 8
    state = G.batched_init_state(cfg, B)
    tok0 = jnp.zeros((B,), jnp.int32)

    # NOTE: block_until_ready is unreliable over the axon relay (returns before
    # execution completes); jax.device_get of the result is the honest barrier.
    steps = 64
    t0 = time.time()
    toks, st = G.greedy_decode(params, cfg, tok0, state, steps=steps)
    _ = jax.device_get(toks)
    print(f"decode compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)

    reps = 3
    t0 = time.time()
    for _i in range(reps):
        toks, st = G.greedy_decode(params, cfg, tok0, state, steps=steps)
    _ = jax.device_get(toks)
    dt = (time.time() - t0) / reps
    decode_tps = B * steps / dt
    print(
        f"decode: {decode_tps:.1f} tok/s (batch {B}, {steps} steps, "
        f"{1000*dt/steps:.2f} ms/step)", file=sys.stderr,
    )

    # prefill throughput (secondary, stderr only)
    T = 512
    ptoks = jnp.zeros((B, T), jnp.int32)
    plens = jnp.full((B,), T, jnp.int32)
    logits, _ = G.prefill(params, cfg, ptoks, state, plens)
    _ = jax.device_get(logits)
    t0 = time.time()
    for _i in range(reps):
        logits, _ = G.prefill(params, cfg, ptoks, state, plens)
    _ = jax.device_get(logits)
    pdt = (time.time() - t0) / reps
    print(f"prefill: {B*T/pdt:.0f} tok/s (batch {B} x T={T})", file=sys.stderr)

    baseline_tps = 1000.0 / 117.0  # reference RWKV-4 1.5B FP16, ms/token -> tok/s
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip (RWKV-7 1.5B-class bf16, batch 8, on-device loop)",
        "value": round(decode_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(decode_tps / baseline_tps, 2),
    }))


if __name__ == "__main__":
    main()
