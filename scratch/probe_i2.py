"""Probe: does Mosaic support pltpu.bitcast(u8 tile, int2) + astype(int8)?
Determines feasibility + bit order of the bc5a8 sign-plane design.
Also probes i8 shift-left/multiply legalization (w = n + (sigma << 3)).
Run on the real chip: python scratch/probe_i2.py
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

rng = np.random.default_rng(0)
rows, cols = 8, 128
qb = rng.integers(0, 256, (rows, cols)).astype(np.uint8)


def k_bitcast_i2(q_ref, o_ref):
    w = pltpu.bitcast(q_ref[...], jnp.int2)     # (4*rows, cols)?
    o_ref[...] = w.astype(jnp.int8)


def probe(name, fn, out_shape):
    try:
        y = pl.pallas_call(
            fn,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.int8),
        )(jnp.asarray(qb))
        y = np.asarray(jax.device_get(y))
        print(f"{name}: OK shape={y.shape}")
        return y
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return None


y = probe("bitcast u8->i2 + astype i8", k_bitcast_i2, (4 * rows, cols))
if y is not None:
    # expected lo-first (like i4): byte b -> rows 4r+j = bits (2j, 2j+1)
    exp = np.zeros((4 * rows, cols), np.int8)
    for j in range(4):
        f = (qb.astype(np.int32) >> (2 * j)) & 3
        exp[j::4] = np.where(f >= 2, f - 4, f).astype(np.int8)
    if np.array_equal(y, exp):
        print("  bit order: LO-FIRST interleaved (row 4r+j = bits 2j..2j+1)")
    else:
        # try plane order: rows [j*rows + r]
        exp2 = np.zeros((4 * rows, cols), np.int8)
        for j in range(4):
            f = (qb.astype(np.int32) >> (2 * j)) & 3
            exp2[j * rows:(j + 1) * rows] = np.where(f >= 2, f - 4, f)
        print("  lo-first interleaved match:", np.array_equal(y, exp),
              "| plane-major match:", np.array_equal(y, exp2))
        print("  sample y[:8,0]:", y[:8, 0], "bytes:", qb[:2, 0])


# i8 ALU probes: shl, mul, add at 8-bit vector width
def k_i8_mul(q_ref, o_ref):
    s = pltpu.bitcast(q_ref[...], jnp.int4).astype(jnp.int8)  # (2*rows, cols)
    o_ref[...] = s * jnp.int8(8) + s


def k_i8_shl(q_ref, o_ref):
    s = pltpu.bitcast(q_ref[...], jnp.int4).astype(jnp.int8)
    o_ref[...] = (s << jnp.int8(3)) + s


ym = probe("i8 mul by 8 + add", k_i8_mul, (2 * rows, cols))
ys = probe("i8 shl 3 + add", k_i8_shl, (2 * rows, cols))
if ym is not None:
    lo = (qb.astype(np.int32) & 15)
    hi = (qb.astype(np.int32) >> 4)
    s = np.empty((2 * rows, cols), np.int32)
    s[0::2] = np.where(lo >= 8, lo - 16, lo)
    s[1::2] = np.where(hi >= 8, hi - 16, hi)
    exp = ((s * 8 + s) & 0xFF)
    got = ym.astype(np.int32) & 0xFF
    print("  i8 mul result exact:", np.array_equal(got, exp))

# int2 NATIVE jnp array creation on this backend (outside pallas)
try:
    z = jnp.zeros((8, 128), jnp.int2) + jnp.int2(1)
    print("native jnp.int2 array: OK", np.asarray(z).sum())
except Exception as e:
    print("native jnp.int2 array: FAIL", type(e).__name__, str(e)[:200])
