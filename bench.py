"""Benchmark entry point: prints ONE JSON line with the headline metric.

Headline: decode throughput (tokens/sec/chip) on an RWKV-7 World 1.5B-class
config (L24 D2048 H32 S64), int8 weight-quantized serving (Q8-class: codes +
per-32 scales in HBM, fused dequant-matmul Pallas kernels, emb/head kept
dense per the reference's quantization policy), batch of 8 independent
streams, whole decode loop on device (runtime/generate.py).

vs_baseline compares against the reference's RWKV-4 1.5B Q8_0 CPU latency
(89 ms/token -> 11.24 tok/s, README.md:29 / BASELINE.md) — the closest
published quantized 1.5B-class number the reference ships. No real
checkpoints are fetchable in this environment (zero egress), so weights are
synthetic; throughput does not depend on weight values.

Extra metrics go to stderr so stdout stays a single JSON line.
"""

import json
import sys
import time

import numpy as np


HBM_PEAK_GBS = 819.0  # TPU v5e HBM bandwidth


def _step_traffic_bytes(params, cfg, batch):
    """HBM bytes one decode step must move: every weight once (decode is
    weight-streaming-bound) + recurrent state read+write."""
    import jax
    import numpy as np

    weight_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
        if hasattr(x, "size") and x.size > 1 << 16
    )
    if cfg.version_major >= 5:
        state_elems = cfg.n_layer * (2 * cfg.n_embed + cfg.head_count * cfg.head_size ** 2)
    else:
        state_elems = cfg.n_layer * 5 * cfg.n_embed
    return weight_bytes + 2 * batch * state_elems * 4


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from rwkv_tpu.models import synth
    from rwkv_tpu.ops import linear as L
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
    steps = 64
    reps = 3

    # NOTE: block_until_ready is unreliable over the axon relay (returns before
    # execution completes); jax.device_get of the result is the honest barrier.
    def measure(p, label):
        t0 = time.time()
        toks, _ = G.greedy_decode(p, cfg, tok0, state, steps=steps)
        _ = jax.device_get(toks)
        print(f"{label}: compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _i in range(reps):
            toks, _ = G.greedy_decode(p, cfg, tok0, state, steps=steps)
        _ = jax.device_get(toks)
        dt = (time.time() - t0) / reps
        tps = B * steps / dt
        gbs = _step_traffic_bytes(p, cfg, B) / (dt / steps) / 1e9
        print(f"{label}: {tps:.1f} tok/s ({1000*dt/steps:.2f} ms/step; "
              f"{gbs:.0f} GB/s achieved = {100*gbs/HBM_PEAK_GBS:.0f}% of "
              f"{HBM_PEAK_GBS:.0f} GB/s HBM peak)", file=sys.stderr)
        return tps

    bf16_tps = measure(params, "decode bf16 dense")
    qparams = L.quantize_params_device(params, merge_rkv=True)
    jax.block_until_ready(jax.tree.leaves(qparams))
    decode_tps = measure(qparams, "decode int8 (Q8-class serving, fused rkv)")

    # throughput-oriented point (stderr only): larger batch
    B32 = 32
    state32 = G.batched_init_state(cfg, B32)
    tok32 = jnp.zeros((B32,), jnp.int32)
    toks, _ = G.greedy_decode(qparams, cfg, tok32, state32, steps=steps)
    _ = jax.device_get(toks)
    t0 = time.time()
    for _i in range(reps):
        toks, _ = G.greedy_decode(qparams, cfg, tok32, state32, steps=steps)
    _ = jax.device_get(toks)
    dt32 = (time.time() - t0) / reps
    print(f"decode int8 batch 32: {B32*steps/dt32:.1f} tok/s "
          f"({1000*dt32/steps:.2f} ms/step)", file=sys.stderr)
    del state32

    # prefill throughput (secondary, stderr only)
    T = 512
    ptoks = jnp.zeros((B, T), jnp.int32)
    plens = jnp.full((B,), T, jnp.int32)
    def measure_prefill(p, label):
        logits, _ = G.prefill(p, cfg, ptoks, state, plens)
        _ = jax.device_get(logits)
        t0 = time.time()
        for _i in range(reps):
            logits, _ = G.prefill(p, cfg, ptoks, state, plens)
        _ = jax.device_get(logits)
        pdt = (time.time() - t0) / reps
        print(f"prefill {label}: {B*T/pdt:.0f} tok/s (batch {B} x T={T})", file=sys.stderr)

    measure_prefill(params, "bf16")
    w8 = L.quantize_params_device(params, mode="w8a8")
    jax.block_until_ready(jax.tree.leaves(w8))
    # measured ~1.06x bf16 FLOPs on v5e (not 2x) — capacity mode, see docs/KERNELS.md
    measure_prefill(w8, "w8a8 (s8 MXU dots)")
    print(f"decode bf16 (for reference): {bf16_tps:.1f} tok/s", file=sys.stderr)

    baseline_tps = 1000.0 / 89.0  # reference RWKV-4 1.5B Q8_0, ms/token -> tok/s
    print(json.dumps({
        "metric": "decode_tokens_per_sec_per_chip (RWKV-7 1.5B-class int8-quantized serving, batch 8, on-device loop)",
        "value": round(decode_tps, 1),
        "unit": "tok/s",
        "vs_baseline": round(decode_tps / baseline_tps, 2),
    }))


if __name__ == "__main__":
    main()
