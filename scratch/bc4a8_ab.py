"""A/B the bc4a8 kernel interior schedule at model level (7B decode).
Usage: python scratch/bc4a8_ab.py INTERIOR [1p5|7b] [B] [merge] [OTxIT]
"""
import sys
import time

import numpy as np

interior = sys.argv[1]
size = sys.argv[2] if len(sys.argv) > 2 else "7b"
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime import generate as G

qmm.BC4A8_INTERIOR = interior

if size == "7b":
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=4096, n_layer=32)
else:
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)

merge = len(sys.argv) > 4 and sys.argv[4] == "merge"
t0 = time.time()
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"),
                                    quantize="w4a8bc")
if size == "7b":
    params = dict(params)
    params["head"] = L.quantize_dense_bc4_device(params["head"])
if merge:
    layers = dict(params["layers"])
    layers["att_rkv"] = L.merge_qfast(
        [layers.pop("att_r"), layers.pop("att_k"), layers.pop("att_v")])
    params = dict(params)
    params["layers"] = layers
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", file=sys.stderr)

if len(sys.argv) > 5:
    ot, it = (int(v) for v in sys.argv[5].split("x"))
    qmm.DECODE_TILES_I4 = (ot, it)
else:
    qmm.apply_tuned_decode_tiles(cfg.n_embed)
jax.clear_caches()

steps = 48
state = G.batched_init_state(cfg, B)
tok0 = jnp.zeros((B,), jnp.int32)

t0 = time.time()
toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                          state_bf16=True)
_ = jax.device_get(toks)
print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)
reps = 3
t0 = time.time()
for _ in range(reps):
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                              state_bf16=True)
_ = jax.device_get(toks)
dt = (time.time() - t0) / reps
print(f"RESULT BC4A8={interior} {size} B={B} merge={merge} "
      f"tiles={qmm.DECODE_TILES_I4}: "
      f"{B*steps/dt:.1f} tok/s ({1000*dt/steps:.3f} ms/step)")

import os
if os.environ.get("BC4A8_TRACE"):
    out = f"scratch/traces/bc4a8_{interior}_{size}_b{B}"
    with jax.profiler.trace(out):
        toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                                  state_bf16=True)
        _ = jax.device_get(toks)
    print(f"trace in {out}")
