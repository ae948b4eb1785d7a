"""On-chip (OT, IT) tile autotuning for the fused dequant-matmul kernels.

The decode-regime tile defaults in ops/qmm.py (DECODE_TILES /
DECODE_TILES_I4) were hand-measured on one v5e point; this sweeps candidate
tiles with MODEL-LEVEL decode measurement — the only trustworthy harness
(docs/KERNELS.md "bench harnesses LIE easily": isolated dependent kernel
chains serialize up to 70x worse than the production unrolled loop, so
per-op timing would pick the wrong tile) — and writes the winner back into
the module knobs.

Cost: one XLA+Mosaic compile per candidate (tens of seconds on a remote
chip), which is why serving entry points don't sweep implicitly; run
`python -m rwkv_tpu.ops.autotune` once per (chip generation, model shape)
and bake the winner, or pass --apply to a long-lived server boot.
"""

from __future__ import annotations

import time

import numpy as np


# decode-regime candidates: (OT, IT) — IT is the packed-row tile for int4.
# Wide-OT candidates matter at 7B-class widths: OT=512 tiles read 512-byte
# bursts from 4096-wide weight rows (discontiguous DMA); OT spanning the
# full row makes every weight DMA contiguous. VMEM stays comfortable
# (q tile OT*ITp bytes; <=2 MB double-buffered against ~16 MB).
CANDIDATES_INT8 = [None, (512, 1024), (512, 2048), (256, 2048), (1024, 1024),
                   (2048, 512), (2048, 1024), (4096, 512)]
CANDIDATES_INT4 = [None, (512, 512), (512, 1024), (1024, 512), (256, 512),
                   (1024, 1024), (2048, 512), (2048, 1024), (4096, 512),
                   (4096, 256)]


def _measure_decode(params, cfg, batch: int, steps: int, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    from rwkv_tpu.runtime import generate as G

    state = G.batched_init_state(cfg, batch)
    tok0 = jnp.zeros((batch,), jnp.int32)
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps)
    _ = jax.device_get(toks)  # compile + honest barrier over the relay
    best = None
    for _ in range(reps):
        t0 = time.time()
        toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps)
        _ = jax.device_get(toks)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return batch * steps / best


def autotune_decode_tiles(mode: str = "int4", n_embed: int = 2048,
                          n_layer: int = 24, batch: int = 8, steps: int = 32,
                          reps: int = 3, candidates=None, apply: bool = True,
                          verbose: bool = True):
    """Sweep decode-tile candidates on the CURRENT backend with a synthetic
    model of the given shape; returns [(tiles, tok_s), ...] sorted best
    first. apply=True writes the winner into qmm.DECODE_TILES{_I4}."""
    import jax

    from rwkv_tpu.models import synth
    from rwkv_tpu.ops import qmm

    assert mode in ("int4", "int4bc", "int8")
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=n_embed,
                            n_layer=n_layer)
    params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"),
                                        quantize=mode)
    jax.block_until_ready(jax.tree.leaves(params))
    if candidates is None:
        candidates = CANDIDATES_INT8 if mode == "int8" else CANDIDATES_INT4
    knob = "DECODE_TILES" if mode == "int8" else "DECODE_TILES_I4"
    prev = getattr(qmm, knob)

    results = []
    for tiles in candidates:
        setattr(qmm, knob, tiles)
        # the knob is read at TRACE time: every jit cache between
        # greedy_decode and the kernel wrappers must drop (clearing only an
        # inner cache does nothing while an outer jit wraps it)
        jax.clear_caches()
        try:
            tps = _measure_decode(params, cfg, batch, steps, reps)
        except Exception as e:  # unaligned candidate for this shape etc.
            if verbose:
                print(f"tiles={tiles}: skipped ({type(e).__name__})")
            continue
        results.append((tiles, tps))
        if verbose:
            print(f"tiles={tiles}: {tps:.1f} tok/s")
    results.sort(key=lambda kv: -kv[1])
    setattr(qmm, knob, results[0][0] if (apply and results) else prev)
    if apply and results:
        jax.clear_caches()
        if verbose:
            print(f"applied {knob} = {results[0][0]} ({results[0][1]:.1f} tok/s)")
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("int4", "int4bc", "int8"), default="int4")
    ap.add_argument("--n-embed", type=int, default=2048)
    ap.add_argument("--n-layer", type=int, default=24)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()
    autotune_decode_tiles(mode=args.mode, n_embed=args.n_embed,
                          n_layer=args.n_layer, batch=args.batch,
                          steps=args.steps)
