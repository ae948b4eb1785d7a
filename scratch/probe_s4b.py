import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")

rng = np.random.default_rng(0)
codes = rng.integers(-8, 8, size=(2, 1024, 512)).astype(np.int8)

s4 = jax.jit(lambda c: c.astype(jnp.int4))(jnp.asarray(codes))
print("s4 created:", s4.shape, s4.dtype)

try:
    y = jax.jit(lambda q: q.astype(jnp.float32).sum())(s4)
    print("trivial jit over S4 arg:", jax.device_get(y))
except Exception as e:
    print("trivial jit FAILED:", type(e).__name__, str(e)[:200])

try:
    y = jax.jit(lambda q: (q.astype(jnp.int8) + 1).sum())(s4)
    print("int8 widen jit:", jax.device_get(y))
except Exception as e:
    print("int8 widen jit FAILED:", type(e).__name__, str(e)[:200])

from rwkv_tpu.ops import qmm
x = rng.standard_normal((8, 1024)).astype(np.float32)
d = (rng.standard_normal((2, 1024 // 32, 512)).astype(np.float32) * 0.01)
try:
    xt, da = qmm.quantize_acts_s8(jnp.asarray(x))
    y = qmm.qmm_w4a8_stacked(xt, s4, jnp.asarray(d), 1)
    print("w4a8 stacked ok:", np.asarray(jax.device_get(y)).shape)
except Exception as e:
    print("w4a8 stacked FAILED:", type(e).__name__, str(e)[:300])
