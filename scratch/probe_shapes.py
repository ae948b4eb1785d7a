import sys, time
import numpy as np
import jax
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rwkv_tpu.ops import qmm

g = 128
qmm.DECODE_TILES_I4 = (4096, 256)
rng = np.random.default_rng(0)
interior, inn, out, multi = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])

qmm.BC4A8_INTERIOR = interior
codes = rng.integers(-8, 8, (2, inn, out * multi)).astype(np.int8)
qp = jnp.asarray(qmm.pack_bc4_signed(codes))
d = jnp.asarray(rng.uniform(0.5, 1.5, (2, inn // g, out * multi)).astype(np.float32))
x = jnp.asarray(rng.standard_normal((8, inn)).astype(np.float32))
xt, da = qmm.quantize_acts_s8(x)
t0 = time.time()
if multi > 1:
    xts = jnp.stack([xt] * multi)
    y = qmm.qmm_bc4a8_stacked_multi(xts, qp, d, 1, multi, group=g)
else:
    y = qmm.qmm_bc4a8_stacked(xt, qp, d, 1, group=g)
_ = jax.device_get(y)
print(f"{interior} in={inn} out={out} multi={multi}: {time.time()-t0:.1f}s OK")
