"""Trace speculative rounds at B=1 (int8 self-draft): where do the
~12 ms/round of non-pass time go?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime import generate as G
from rwkv_tpu.runtime import speculative as S

cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
draft = L.quantize_params_device(params, merge_rkv=True)
jax.block_until_ready(jax.tree.leaves(draft))
qmm.apply_tuned_decode_tiles(cfg.n_embed)
print("params ready", file=sys.stderr)

B, k, rounds = 1, 7, 9
tok0 = jnp.zeros((B,), jnp.int32)
state = G.batched_init_state(cfg, B)
dst = G.batched_init_state(cfg, B)

t0 = time.time()
_, cnts, _ = S.spec_rounds(draft, cfg, params, cfg, tok0, dst, state,
                           k=k, rounds=rounds)
_ = jax.device_get(cnts)
print(f"compile {time.time()-t0:.1f}s", file=sys.stderr)
reps = 3
t0 = time.time()
for _ in range(reps):
    _, cnts, _ = S.spec_rounds(draft, cfg, params, cfg, tok0, dst, state,
                               k=k, rounds=rounds)
_ = jax.device_get(cnts)
dt = (time.time() - t0) / reps
tot = int(jax.device_get(cnts).sum())
print(f"RESULT spec: {tot/dt:.1f} tok/s, {1000*dt/rounds:.2f} ms/round, "
      f"accept={(float(np.asarray(cnts).mean())-1)/k:.2f}")

with jax.profiler.trace("scratch/traces/spec_b1"):
    _, cnts, _ = S.spec_rounds(draft, cfg, params, cfg, tok0, dst, state,
                               k=k, rounds=rounds)
    _ = jax.device_get(cnts)
print("trace in scratch/traces/spec_b1")
