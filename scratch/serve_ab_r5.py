"""Serving A/B (round 5): steady-state B=32 sampled throughput vs the
serve_window unroll factor (+ optional trace of the best config).
Usage: python scratch/serve_ab_r5.py [unrolls...] [--trace]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime.context import Context
from rwkv_tpu.runtime import serve as SV
from rwkv_tpu.runtime.serve import Server, StreamConfig

args = [a for a in sys.argv[1:] if not a.startswith("--")]
unrolls = [int(x) for x in args] or [1, 4, 8, 16]
do_trace = "--trace" in sys.argv

cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
t0 = time.time()
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
q4 = L.quantize_params_device(params, mode="w4a8bc", merge_rkv=True)
jax.block_until_ready(jax.tree.leaves(q4))
del params
print(f"params {time.time()-t0:.1f}s", file=sys.stderr)
qmm.apply_tuned_decode_tiles(cfg.n_embed)

orig_serve_window = SV.serve_window


def measure(unroll):
    ctx = Context.__new__(Context)
    ctx.cfg = cfg
    ctx._params = q4
    ctx._jit_cache = {}
    ctx.parity = False
    ctx.model_path = "<synthetic>"
    B = 32
    srv = Server(ctx, max_streams=B, seed=0, state_bf16=True)
    scfg = StreamConfig(temperature=1.0, top_p=0.9, presence_penalty=0.4,
                        frequency_penalty=0.4, max_new_tokens=10**9,
                        stop_token=None)
    rng = np.random.default_rng(0)
    for _ in range(B):
        srv.add(rng.integers(0, cfg.n_vocab, size=32).tolist(), scfg)

    # drive through the server but pin the unroll by monkeypatching default
    def patched(*a, **kw):
        kw["unroll"] = unroll
        return orig_serve_window(*a, **kw)

    SV.serve_window = patched
    t0 = time.time()
    srv.step_window(16)
    print(f"unroll={unroll}: compile {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    n = 0
    for _ in range(8):
        out = srv.step_window(16)
        n += sum(len(v) for v in out.values())
    dt = time.time() - t0
    print(f"RESULT serve B=32 unroll={unroll}: {n/dt:.1f} tok/s "
          f"({1000*dt/8/16:.3f} ms/step)")
    SV.serve_window = orig_serve_window
    return srv, n / dt


best = None
for u in unrolls:
    srv, tps = measure(u)
    if best is None or tps > best[1]:
        best = (u, tps, srv)

if do_trace:
    u, _, srv = best
    def patched(*a, **kw):
        kw["unroll"] = u
        return orig_serve_window(*a, **kw)
    SV.serve_window = patched
    out = f"scratch/traces/r5_serve_u{u}"
    with jax.profiler.trace(out):
        srv.step_window(16)
        srv.step_window(16)
    print(f"trace in {out}")
