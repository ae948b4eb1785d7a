"""Single-process A/B: packed vs v1 wkv7 step kernel at model level.

Measures (a) serving B=32 sampled steady-state and (b) the raw decode loop
at B=32, each with the packed dispatch ON then OFF (same process, same
params, interleaved repeats so tunnel drift can't masquerade as a win).
"""
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import pallas_wkv as PW
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime.context import Context
from rwkv_tpu.runtime.serve import Server, StreamConfig

cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
t0 = time.time()
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
q4 = L.quantize_params_device(params, mode="w4a8bc", merge_rkv=True)
jax.block_until_ready(jax.tree.leaves(q4))
del params
print(f"params {time.time()-t0:.1f}s", file=sys.stderr)
qmm.apply_tuned_decode_tiles(cfg.n_embed)

_real_use_packed = PW._use_packed
PACKED = {"on": True}


def gated(state, S):
    return PACKED["on"] and _real_use_packed(state, S)


PW._use_packed = gated

# Two separately-traced serve_window executables (the module jit would
# otherwise cache ONE trace and the gate flip would be a no-op).
import functools
from functools import partial
import rwkv_tpu.runtime.serve as SV

_raw = SV.serve_window.__wrapped__


def _mk(name):
    # distinct function OBJECT per mode — jax's pjit cache is keyed on the
    # wrapped function, so two jits of the same _raw share one cache
    @functools.wraps(_raw)
    def f(*a, **k):
        return _raw(*a, **k)
    f.__name__ = name
    return partial(jax.jit, static_argnames=("cfg", "top_k", "steps",
                                             "state_bf16", "unroll"))(f)


_jits = {m: _mk(f"serve_window_{m}") for m in ("on", "off")}


def set_mode(mode, clear=False):
    PACKED["on"] = mode == "on"
    SV.serve_window = _jits[mode]
    if clear:
        # inner module-level jits cache the traced step-kernel choice; clear
        # them so the outer trace re-reads the gate
        import rwkv_tpu.models.forward as FW
        for m in (FW, PW):
            for v in vars(m).values():
                if hasattr(v, "clear_cache"):
                    try:
                        v.clear_cache()
                    except Exception:
                        pass


def make_server():
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
    return srv


servers = {}
for mode in ("on", "off"):
    set_mode(mode, clear=True)
    srv = make_server()
    t0 = time.time()
    srv.step_window(16)
    print(f"packed={mode}: serve compile {time.time()-t0:.1f}s",
          file=sys.stderr)
    servers[mode] = srv

# interleaved repeats
times = {"on": [], "off": []}
for rep in range(6):
    for mode in ("on", "off"):
        set_mode(mode)
        srv = servers[mode]
        t0 = time.time()
        n = 0
        for _ in range(2):
            out = srv.step_window(16)
            n += sum(len(v) for v in out.values())
        dt = time.time() - t0
        times[mode].append(n / dt)

for mode in ("on", "off"):
    v = sorted(times[mode])
    print(f"RESULT serve B=32 packed={mode}: median {v[len(v)//2]:.1f} "
          f"tok/s  all={[f'{x:.0f}' for x in v]}")
