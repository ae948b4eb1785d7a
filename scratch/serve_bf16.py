"""Serving-path state_bf16 A/B: windowed continuous batching at large slot
counts, with and without the bf16 wkv-state carry (Server(state_bf16=...)).
Usage: python scratch/serve_bf16.py [BATCH] [0|1]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.runtime.context import Context
from rwkv_tpu.runtime.serve import Server, StreamConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
sbf16 = len(sys.argv) > 2 and sys.argv[2] == "1"

cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
q4 = L.quantize_params_device(params, mode="int4", merge_rkv=True)
jax.block_until_ready(jax.tree.leaves(q4))
del params

ctx = Context.__new__(Context)
ctx.cfg = cfg
ctx._params = q4
ctx._jit_cache = {}
ctx.parity = False
ctx.model_path = "<synthetic>"

srv = Server(ctx, max_streams=B, seed=0, state_bf16=sbf16)
scfg = StreamConfig(temperature=1.0, top_p=0.9, presence_penalty=0.4,
                    frequency_penalty=0.4, max_new_tokens=10**9,
                    stop_token=None)
rng = np.random.default_rng(0)
for _ in range(B):
    srv.add(rng.integers(0, cfg.n_vocab, size=32).tolist(), scfg)

t0 = time.time()
srv.step_window(16)
print(f"window compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
n = 0
for _ in range(8):
    out = srv.step_window(16)
    n += sum(len(v) for v in out.values())
dt = time.time() - t0
tag = "sbf16" if sbf16 else "f32"
print(f"RESULT serve-{tag} B={B}: {n/dt:.1f} tok/s steady-state")
