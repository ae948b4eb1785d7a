"""Isolated compile probe of the bc4a8 interiors at 7B shapes (NOT a perf
measurement — perf only trusts model-level runs; this checks whether the
sliced per-group forms compile at all and how long the compile takes).
Usage: python scratch/probe_bc4a8_interior.py [interior ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rwkv_tpu.ops import qmm

interiors = sys.argv[1:] or ["full", "groups", "groupdots"]

inn, out, T, L, g = 4096, 4096, 8, 2, 128
rng = np.random.default_rng(0)
codes = rng.integers(-8, 8, (L, inn, out)).astype(np.int8)
qp = jnp.asarray(qmm.pack_bc4_signed(codes))
d = jnp.asarray(rng.uniform(0.5, 1.5, (L, inn // g, out)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((T, inn)).astype(np.float32))
xt, da = qmm.quantize_acts_s8(x)
qmm.DECODE_TILES_I4 = (4096, 256)

ref = None
for interior in interiors:
    qmm.BC4A8_INTERIOR = interior
    jax.clear_caches()
    t0 = time.time()
    try:
        y = qmm.qmm_bc4a8_stacked(xt, qp, d, 1, group=g)
        y = np.asarray(jax.device_get(y)) * np.asarray(da)
        dt = time.time() - t0
        if ref is None:
            ref = y
        err = np.max(np.abs(y - ref)) / (np.abs(ref).max() + 1e-9)
        print(f"{interior}: compiled+ran in {dt:.1f}s, rel-vs-first {err:.2e}")
    except Exception as e:
        print(f"{interior}: FAIL after {time.time()-t0:.1f}s "
              f"{type(e).__name__}: {str(e)[:300]}")
