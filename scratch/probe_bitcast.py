"""Probe: does pltpu.bitcast(u8 -> i4) + astype lower on real Mosaic, and
what row order does the sublane unpack produce?

If this works, the packed-int4 kernels can replace their explicit
widen/mask/shift/sub VPU chain (~4.5 ops/elem) with a free bitcast + one
hardware convert (~2 ops/elem incl. the scale multiply).
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import jax.experimental.pallas.tpu as pltpu

sys.path.insert(0, "/root/repo")

R, C = 64, 256  # packed rows, cols
rng = np.random.default_rng(0)
codes = rng.integers(-8, 8, size=(2 * R, C)).astype(np.int8)  # signed s4

# row-pair packing, lo-first hypothesis: byte r = (codes[2r] & 15) | ((codes[2r+1] & 15) << 4)
lo = codes[0::2].astype(np.uint8) & 15
hi = codes[1::2].astype(np.uint8) & 15
packed = (lo | (hi << 4)).astype(np.uint8)  # (R, C)


def k_f32(q_ref, o_ref):
    o_ref[...] = pltpu.bitcast(q_ref[...], jnp.int4).astype(jnp.float32)


def k_i8(q_ref, o_ref):
    o_ref[...] = pltpu.bitcast(q_ref[...], jnp.int4).astype(jnp.int8)


def k_dot(x_ref, q_ref, d_ref, o_ref):
    w = pltpu.bitcast(q_ref[...], jnp.int4).astype(jnp.float32)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w * d_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


for name, kern, odt in (("bitcast->f32", k_f32, jnp.float32),
                        ("bitcast->i8", k_i8, jnp.int8)):
    try:
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((2 * R, C), odt),
        )(jnp.asarray(packed))
        y = np.asarray(jax.device_get(y)).astype(np.int32)
        if np.array_equal(y, codes.astype(np.int32)):
            print(f"{name}: OK lo-first (even rows = low nibble)")
        else:
            # hi-first hypothesis
            alt = np.empty_like(codes)
            alt[0::2], alt[1::2] = codes[1::2], codes[0::2]
            if np.array_equal(y, alt.astype(np.int32)):
                print(f"{name}: OK hi-first (even rows = HIGH nibble)")
            else:
                print(f"{name}: lowered but order UNKNOWN; y[:4,:4]=\n", y[:4, :4],
                      "\nexpected lo-first:\n", codes[:4, :4])
    except Exception as e:
        print(f"{name} FAILED:", type(e).__name__, str(e)[-300:])

# dot probe: full f32 matmul against dequantized reference
try:
    x = rng.standard_normal((8, 2 * R)).astype(np.float32)
    d = (rng.standard_normal((2 * R, C)).astype(np.float32) * 0.01)
    y = pl.pallas_call(
        k_dot,
        out_shape=jax.ShapeDtypeStruct((8, C), jnp.float32),
    )(jnp.asarray(x), jnp.asarray(packed), jnp.asarray(d))
    y = np.asarray(jax.device_get(y))
    ref = x @ (codes.astype(np.float32) * d)
    print("dot: max|diff| =", np.abs(y - ref).max())
except Exception as e:
    print("dot FAILED:", type(e).__name__, str(e)[-300:])
