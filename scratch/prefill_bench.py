"""Prefill benchmark: forward_seq B=8 T=512 on bf16 dense synth params.
Usage: python scratch/prefill_bench.py [VER] [--trace DIR] [--f32]
VER: 7.0 (default) | 6.0 | 5.2 | 4.0
--f32 forces f32 activations (emb cast to f32) for A/B vs bf16-act mode.
Round-2 baselines (f32 acts, double-relayout fold): v7 20.7k, v6 21.4k, v4 30.7k tok/s.
"""
import sys, time
import numpy as np

ver = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "7.0"
trace_dir = None
if "--trace" in sys.argv:
    trace_dir = sys.argv[sys.argv.index("--trace") + 1]
f32 = "--f32" in sys.argv

import os
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.runtime import generate as G
if os.environ.get("RWKV_EXP_CHUNK"):
    from rwkv_tpu.ops import wkv_chunked
    wkv_chunked.CHUNK = int(os.environ["RWKV_EXP_CHUNK"])
    wkv_chunked.CHUNK_V7 = wkv_chunked.CHUNK
    print(f"CHUNK = {wkv_chunked.CHUNK}", file=sys.stderr)
PALLAS = os.environ.get("RWKV_EXP_PALLAS") == "1"
if PALLAS:
    from rwkv_tpu.models import forward as fwd_mod
    from rwkv_tpu.ops import pallas_wkv
    if os.environ.get("RWKV_EXP_PCHUNK"):
        pc = int(os.environ["RWKV_EXP_PCHUNK"])
        phb = int(os.environ.get("RWKV_EXP_PHB", 8))
        pallas_wkv.wkv7_chunked_pallas.__defaults__ = (pc, phb)
        pallas_wkv.wkv7_chunked_pallas_batched.__defaults__ = (pc, phb)
        print(f"pallas chunk = {pc}, head_block = {phb}", file=sys.stderr)
    _orig_fb = fwd_mod.forward_batch
    def _fb(*a, **kw):
        kw["pallas"] = True
        return _orig_fb(*a, **kw)
    fwd_mod.forward_batch = _fb
    import rwkv_tpu.runtime.generate as G2
    print("pallas chunk kernels ON", file=sys.stderr)

cfg = synth.make_config(ver, n_vocab=65536, n_embed=2048, n_layer=24)
t0 = time.time()
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
if f32:
    params = dict(params)
    params["emb"] = params["emb"].astype(jnp.float32)
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", file=sys.stderr)

B, T, reps = 8, 512, 3
state = G.batched_init_state(cfg, B)
toks = jnp.zeros((B, T), jnp.int32)
lens = jnp.full((B,), T, jnp.int32)

t0 = time.time()
logits, _ = G.prefill(params, cfg, toks, state, lens)
_ = jax.device_get(logits)
print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)

if trace_dir:
    with jax.profiler.trace(trace_dir):
        logits, _ = G.prefill(params, cfg, toks, state, lens)
        _ = jax.device_get(logits)
    print("trace written to", trace_dir, file=sys.stderr)

t0 = time.time()
for _ in range(reps):
    logits, _ = G.prefill(params, cfg, toks, state, lens)
_ = jax.device_get(logits)
dt = (time.time() - t0) / reps
mode = "f32" if f32 else "bf16act"
flops = 2 * B * T * (cfg.n_layer * (4 * cfg.n_embed**2 + 2 * 4 * cfg.n_embed**2) + cfg.n_vocab * cfg.n_embed / T)
print(f"RESULT prefill {ver} {mode}: {B*T/dt:.0f} tok/s ({1000*dt:.1f} ms/call, ~{flops/dt/1e12:.0f} TFLOP/s vs 197 peak)")
