"""Trace the windowed serving step: B=32 sampled streams, w4a8bc params.
Where does the 3x gap vs plain greedy decode at the same batch go?"""
import sys
import time

import numpy as np

import jax

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime.context import Context
from rwkv_tpu.runtime.serve import Server, StreamConfig

cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
q4 = L.quantize_params_device(params, mode="w4a8bc", merge_rkv=True)
jax.block_until_ready(jax.tree.leaves(q4))
qmm.apply_tuned_decode_tiles(cfg.n_embed)
print("params ready", file=sys.stderr)

ctx = Context.__new__(Context)
ctx.cfg = cfg
ctx._params = q4
ctx._jit_cache = {}
ctx.parity = False
ctx.model_path = "<synthetic>"

B = 32
srv = Server(ctx, max_streams=B, seed=0, state_bf16=True)
scfg = StreamConfig(temperature=1.0, top_p=0.9, presence_penalty=0.4,
                    frequency_penalty=0.4, max_new_tokens=10**9, stop_token=None)
rng = np.random.default_rng(0)
for _ in range(B):
    srv.add(rng.integers(0, cfg.n_vocab, size=32).tolist(), scfg)

t0 = time.time()
srv.step_window(16)
print(f"window compile {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
n = 0
for _ in range(4):
    out = srv.step_window(16)
    n += sum(len(v) for v in out.values())
dt = time.time() - t0
print(f"steady: {n/dt:.1f} tok/s ({1000*dt/4:.1f} ms/window of 16)")

with jax.profiler.trace("scratch/traces/serve_w16"):
    srv.step_window(16)
    # step_window returns host data, so it is its own barrier
print("trace written")
