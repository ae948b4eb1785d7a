"""Fused dequantize + matmul Pallas kernel for block-quantized weights.

The reference's quantized mul_mat is ggml's CPU int-dot path (SURVEY.md §2.2);
the TPU-native equivalent keeps the weight matrix quantized in HBM and
dequantizes tile-by-tile in VMEM at the MXU's feed rate:

    y[T, out] = x[T, in] @ (q * d (+ m))^T

Layout: codes as int8 (out, in) — Q4/Q5 codes fit int8 after bias folding
(decode_blocks already yields signed codes) — with per-32-block f32 scales
d (out, in/32) and optional mins m. The kernel tiles (out, in), expands the
block scales across lanes with pltpu.repeat, and accumulates f32 partials in
a VMEM scratch across the contraction grid dimension.

Codes-as-int8 is 1 byte/element: 2x less HBM traffic than bf16 for every
format and 4x less than f32 (a bit-packed 4-bit layout can halve Q4 again —
future work). Weight values are identical to ggml's dequant, so quality
matches the dequantized fast path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32


def _expand_blocks(d, it, g=QK):
    """(nb, OT) f32 -> (OT, IT): each per-block value spans its g lanes.
    pltpu.repeat tiles (not element-repeat), so expand via a one-hot matmul
    contracting the block axis — MXU-friendly and needs no transposes
    (scales are stored block-major (nb, out) for exactly this reason)."""
    nb = d.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, it), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, it), 1)
    onehot = (cols // g == rows).astype(jnp.float32)
    return jax.lax.dot_general(
        d, onehot, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _qmm_kernel(x_ref, q_ref, d_ref, o_ref, acc_ref, *, with_min, dot_dtype, group):
    @pl.when(pl.program_id(1) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]  # (OT, IT) int8
    it = q.shape[1]
    if with_min:
        w = q.astype(jnp.float32) * _expand_blocks(d_ref[:, :, 0], it, group) \
            + _expand_blocks(d_ref[:, :, 1], it, group)
    else:
        w = q.astype(jnp.float32) * _expand_blocks(d_ref[...], it, group)
    x = x_ref[...]  # (T, IT)
    acc_ref[...] += jax.lax.dot_general(
        x.astype(dot_dtype),
        w.astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("out_tile", "in_tile", "dot_dtype", "group"))
def qmm(x, q, d, m=None, out_tile: int = 256, in_tile: int = 512, dot_dtype=jnp.float32,
        group: int = QK):
    """x: (T, in) f32; q: (out, in) int8; d[, m]: (out, in//group) f32.
    Returns (T, out) f32."""
    t, inn = x.shape
    out = q.shape[0]
    OT = min(out_tile, out)
    while out % OT:
        OT //= 2
    IT = min(in_tile, inn)
    while inn % IT:
        IT //= 2
    if IT % group:
        raise ValueError(f"in_tile {IT} not a multiple of {group}")

    with_min = m is not None
    # scales block-major (nb, out) tile cleanly: (IT//group, OT) has sublane
    # IT//group >= 8 for IT >= 256 and lane OT % 128 == 0
    if with_min:
        dm = jnp.stack([jnp.swapaxes(d, 0, 1), jnp.swapaxes(m, 0, 1)], axis=-1)
        d_spec = pl.BlockSpec((IT // group, OT, 2), lambda o, i: (i, o, 0), memory_space=pltpu.VMEM)
    else:
        dm = jnp.swapaxes(d, 0, 1)
        d_spec = pl.BlockSpec((IT // group, OT), lambda o, i: (i, o), memory_space=pltpu.VMEM)

    grid = (out // OT, inn // IT)
    y = pl.pallas_call(
        functools.partial(_qmm_kernel, with_min=with_min, dot_dtype=dot_dtype, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, IT), lambda o, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((OT, IT), lambda o, i: (o, i), memory_space=pltpu.VMEM),
            d_spec,
        ],
        out_specs=pl.BlockSpec((t, OT), lambda o, i: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, out), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t, OT), jnp.float32)],
    )(x, q, dm)
    return y


def repack_for_qmm(q_codes: np.ndarray, d: np.ndarray, m):
    """Linear quant fields (out, nb, 32)/(out, nb) -> kernel layout
    ((out, in) int8, (out, nb) f32, (out, nb) f32 | None)."""
    out, nb, _ = q_codes.shape
    return (
        np.ascontiguousarray(q_codes.reshape(out, nb * QK)),
        np.ascontiguousarray(d.astype(np.float32)),
        None if m is None else np.ascontiguousarray(m.astype(np.float32)),
    )


def qmm_reference(x, q, d, m=None, group: int = QK):
    """jnp fallback (CPU / non-TPU): identical math, XLA-fused."""
    out, inn = q.shape
    w = q.astype(jnp.float32).reshape(out, inn // group, group) * d[..., None]
    if m is not None:
        w = w + m[..., None]
    return jnp.dot(x, w.reshape(out, inn).T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
