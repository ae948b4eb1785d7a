# Probe: native s4 dtype in Pallas + XLA on the real chip.
import time, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

print("devices:", jax.devices(), file=sys.stderr)

IN, OUT, T = 2048, 2048, 8
rng = np.random.default_rng(0)
q_np = rng.integers(-8, 8, size=(IN, OUT), dtype=np.int8)
x_np = rng.standard_normal((T, IN)).astype(np.float32)
d_np = rng.standard_normal((IN // 32, OUT)).astype(np.float32) * 0.01

# 1) Does jnp.int4 device array work and how many bytes does it hold?
q4 = jnp.asarray(q_np, dtype=jnp.int4)
print("int4 array ok:", q4.shape, q4.dtype, "nbytes=", q4.nbytes)

# 2) XLA path: dequant + dot fully in XLA on s4 input
@jax.jit
def xla_deq(x, q, d):
    w = q.astype(jnp.float32).reshape(IN // 32, 32, OUT) * d[:, None, :]
    return jnp.dot(x, w.reshape(IN, OUT), preferred_element_type=jnp.float32)

y = xla_deq(x_np, q4, d_np)
y = jax.device_get(y)
print("XLA s4 dequant-dot ok, y[0,:3] =", y[0, :3])

# 3) Pallas: s4 ref load + convert inside kernel
def kern(x_ref, q_ref, d_ref, o_ref):
    q = q_ref[...].astype(jnp.float32)
    nb = q.shape[0] // 32
    d = jnp.broadcast_to(d_ref[...][:, None, :], (nb, 32, q.shape[1])).reshape(q.shape)
    o_ref[...] = jax.lax.dot_general(x_ref[...], q * d,
        dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

try:
    f = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((T, IN), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN, OUT), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IN // 32, OUT), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, OUT), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, OUT), jnp.float32),
    )
    yp = jax.device_get(jax.jit(f)(x_np, q4, d_np))
    print("PALLAS s4 kernel ok, max|diff| vs XLA =", np.abs(yp - y).max())
except Exception as e:
    print("PALLAS s4 kernel FAILED:", type(e).__name__, str(e)[:500])
