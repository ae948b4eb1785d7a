"""Model-level decode benchmark: one variant per invocation (fresh process =
clean jit caches). Usage: python scratch/dec_bench.py VARIANT [SIZE]
SIZE: 1p5 (default) | 7b
Variants:
  int4        current default q4fast path
  int8        current qfast path
  bf16        dense
"""
import sys, time
import numpy as np

variant = sys.argv[1] if len(sys.argv) > 1 else "int4"
size = sys.argv[2] if len(sys.argv) > 2 else "1p5"

import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.runtime import generate as G

if size == "7b":
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=4096, n_layer=32)
else:
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)

t0 = time.time()
merge = variant.endswith("m")
base = variant.rstrip("m")
if base in ("int4", "int8"):
    params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"), quantize=base)
    if merge:
        layers = dict(params["layers"])
        names = ["att_r", "att_k", "att_v"]
        parts = [layers[k] for k in names]
        layers["att_rkv"] = L.merge_qfast(parts)
        for k in names:
            del layers[k]
        params = dict(params)
        params["layers"] = layers
else:
    params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", file=sys.stderr)

B = 8
steps = 64
reps = 3
state = G.batched_init_state(cfg, B)
tok0 = jnp.zeros((B,), jnp.int32)

t0 = time.time()
toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps)
_ = jax.device_get(toks)
print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
for _ in range(reps):
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps)
_ = jax.device_get(toks)
dt = (time.time() - t0) / reps
print(f"RESULT {variant} {size}: {B*steps/dt:.1f} tok/s ({1000*dt/steps:.3f} ms/step)")
