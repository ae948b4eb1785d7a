"""Round-5 profiling: the production decode regime (tuned tiles, bf16
state, bc4 head at 7B) under jax.profiler.
Usage: python scratch/profile_r5.py [w4a8bc|int4|int8|bf16] [1p5|7b] [B] [tag]
Writes to scratch/traces/r5_<variant>_<size>_b<B><tag>; summarize with
trace_top.py.
"""
import sys
import time

import numpy as np

variant = sys.argv[1] if len(sys.argv) > 1 else "w4a8bc"
size = sys.argv[2] if len(sys.argv) > 2 else "7b"
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
tag = sys.argv[4] if len(sys.argv) > 4 else ""

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime import generate as G

if size == "7b":
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=4096, n_layer=32)
else:
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)

t0 = time.time()
if variant == "bf16":
    params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
else:
    params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"),
                                        quantize=variant)
if size == "7b" and variant != "bf16":
    params = dict(params)
    params["head"] = L.quantize_dense_bc4_device(params["head"])
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", file=sys.stderr)

qmm.apply_tuned_decode_tiles(cfg.n_embed)
jax.clear_caches()

steps = 32
state = G.batched_init_state(cfg, B)
tok0 = jnp.zeros((B,), jnp.int32)

t0 = time.time()
toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                          state_bf16=True)
_ = jax.device_get(toks)
print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)

out = f"scratch/traces/r5_{variant}_{size}_b{B}{tag}"
with jax.profiler.trace(out):
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                              state_bf16=True)
    _ = jax.device_get(toks)
t0 = time.time()
reps = 3
for _ in range(reps):
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                              state_bf16=True)
_ = jax.device_get(toks)
dt = (time.time() - t0) / reps
print(f"RESULT {variant} {size} B={B}: {B*steps/dt:.1f} tok/s "
      f"({1000*dt/steps:.3f} ms/step); trace in {out}")
