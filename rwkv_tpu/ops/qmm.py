"""Fused dequantize + matmul Pallas kernel for block-quantized weights.

The reference's quantized mul_mat is ggml's CPU int-dot path (SURVEY.md §2.2);
the TPU-native equivalent keeps the weight matrix quantized in HBM and
dequantizes tile-by-tile in VMEM at the MXU's feed rate:

    y[T, out] = x[T, in] @ (q * d (+ m))

Layout (everything contraction-major so the kernel needs zero transposes):
  q: (in, out) int8   — Q4/Q5 codes fit int8 after bias folding
  d: (in/g, out) f32  — per-g-block scales (g = 32, or 16 for Q2/Q3/Q6_K)
  m: (in/g, out) f32  — per-block mins (Q4_1/Q5_1/Q4_K/Q5_K), optional

Kernel recipe (measured at HBM speed-of-light on v5e, ~3 us for a 2048x2048
int8 matrix at T=8 vs ~5.3 us for the same matrix dense bf16 — the int8 codes
move half the bytes):
  - expand block scales across their g lanes with a sublane broadcast+reshape
    (an earlier one-hot-matmul expansion cost ~15x the whole kernel)
  - dequantize into f32 registers, multiply on the MXU at DEFAULT precision
    (one bf16 pass; HIGHEST ran the 6-pass f32 algorithm and dominated
    runtime). Accuracy equals the dense-bf16 fast path.
  - f32 accumulation across the contraction grid dimension in VMEM scratch.

Codes-as-int8 is 1 byte/element: 2x less HBM traffic than bf16 for every
format and 4x less than f32. Weight values are identical to ggml's dequant,
so quality matches the dequantized fast path exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32

# Tunable (OT, IT) tile override for the decode regime (T <= 64), applied
# when the caller passes tiles=None. Module-level so ops/autotune.py's
# on-chip sweep can flip it; jit caches trace-time reads, so clear caches
# after changing it (the autotuner does). v5e sweep round 3: the built-in
# heuristic (None -> OT=512, IT=2048) won for int8 and int4 alike
# (docs/KERNELS.md).
DECODE_TILES = None


def _qmm_kernel(x_ref, q_ref, d_ref, o_ref, acc_ref, *, with_min, group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]  # (IT, OT) int8
    it, ot = q.shape
    nb = it // group

    def expand(s):  # (nb, OT) -> (IT, OT), value repeated across its g sublanes
        return jnp.broadcast_to(s[:, None, :], (nb, group, ot)).reshape(it, ot)

    if with_min:
        w = q.astype(jnp.float32) * expand(d_ref[:, :, 0]) + expand(d_ref[:, :, 1])
    else:
        w = q.astype(jnp.float32) * expand(d_ref[...])
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _pick_tile(dim, want):
    t = min(want, dim)
    while dim % t:
        t //= 2
    return t


def aligned_for_kernel(inn: int, out: int, group: int) -> bool:
    """True when the (in, out) dims tile cleanly for the Pallas kernel:
    out must fill 128-lane tiles and in must split into whole scale groups.
    Callers (ops/linear.py) fall back to qmm_reference otherwise instead of
    letting _pick_tile degrade to pathological 1-wide lane blocks."""
    return out % 128 == 0 and inn % (8 * group) == 0


def _check_aligned(inn, out, group):
    if not aligned_for_kernel(inn, out, group):
        raise ValueError(
            f"qmm kernel needs out % 128 == 0 and in % {8 * group} == 0, got "
            f"(in={inn}, out={out}); use qmm_reference (ops/linear.py does "
            f"this automatically) or pad the operand"
        )


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "tiles"))
def qmm(x, q, d, m=None, group: int = QK, out_dtype=jnp.float32, tiles=None):
    """x: (T, in) f32; q: (in, out) int8; d[, m]: (in//group, out) f32.
    Returns (T, out). tiles=(OT, IT) overrides the tile heuristic."""
    t, inn = x.shape
    out = q.shape[1]
    _check_aligned(inn, out, group)
    if tiles is None and t <= 256:
        tiles = DECODE_TILES
    # decode (small/medium T, through B=128 batched steps): stream full
    # contraction rows; prefill (large T): bound VMEM by tiling the token-row
    # dimension too. The t<=256 boundary is measured: IT=2048 at B=128
    # decode is +6% over IT=512 (7124 vs 6733 tok/s, int8 1.5B).
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(out, tiles[0] if tiles else 512)
    IT = _pick_tile(inn, (tiles[1] if tiles else (2048 if t <= 256 else 512)))
    if IT % group:
        raise ValueError(f"in_tile {IT} not a multiple of {group}")

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_spec = pl.BlockSpec((IT // group, OT, 2), lambda r, o, i: (i, o, 0), memory_space=pltpu.VMEM)
    else:
        dm = d
        d_spec = pl.BlockSpec((IT // group, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM)

    grid = (t // TT, out // OT, inn // IT)
    return pl.pallas_call(
        functools.partial(_qmm_kernel, with_min=with_min, group=group, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TT, IT), lambda r, o, i: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((IT, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM),
            d_spec,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i: (r, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )(x, q, dm)


def _qmm_stacked_kernel(l_ref, x_ref, q_ref, d_ref, o_ref, acc_ref, *, with_min, group,
                        out_dtype):
    # l_ref is the scalar-prefetched layer index (consumed by the index maps)
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (IT, OT) int8
    it, ot = q.shape
    nb = it // group

    def expand(s):
        return jnp.broadcast_to(s[:, None, :], (nb, group, ot)).reshape(it, ot)

    if with_min:
        w = q.astype(jnp.float32) * expand(d_ref[0, :, :, 0]) + expand(d_ref[0, :, :, 1])
    else:
        w = q.astype(jnp.float32) * expand(d_ref[0])
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "tiles"))
def qmm_stacked(x, q, d, m, layer, group: int = QK, out_dtype=jnp.float32, tiles=None):
    """Layer-stacked fused dequant-matmul: q (L, in, out) int8, d/m
    (L, in//group, out) f32, layer a traced scalar index.

    The kernel DMAs tiles of layer `layer` straight out of the stacked HBM
    array via a scalar-prefetch index map. Inside a lax.scan over layers this
    avoids XLA materializing a full copy of each layer's weights per step
    (a dynamic-slice feeding a custom call can't fuse — the copies cost more
    than the matmuls themselves at decode batch sizes)."""
    t, inn = x.shape
    out = q.shape[2]
    _check_aligned(inn, out, group)
    if tiles is None and t <= 256:
        tiles = DECODE_TILES
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(out, tiles[0] if tiles else 512)
    IT = _pick_tile(inn, (tiles[1] if tiles else (2048 if t <= 256 else 512)))

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_spec = pl.BlockSpec(
            (1, IT // group, OT, 2), lambda r, o, i, l: (l[0], i, o, 0), memory_space=pltpu.VMEM
        )
    else:
        dm = d
        d_spec = pl.BlockSpec(
            (1, IT // group, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn // IT),
        in_specs=[
            pl.BlockSpec((TT, IT), lambda r, o, i, l: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM),
            d_spec,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_stacked_kernel, with_min=with_min, group=group,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, q, dm)


def _qmm_stacked_multi_kernel(l_ref, x_ref, q_ref, d_ref, o_ref, acc_ref, *,
                              group, out_dtype):
    # x block selected per output tile by the index map (which sub-matrix
    # this tile belongs to); otherwise identical to _qmm_stacked_kernel
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    it, ot = q.shape
    nb = it // group

    def expand(s):
        return jnp.broadcast_to(s[:, None, :], (nb, group, ot)).reshape(it, ot)

    w = q.astype(jnp.float32) * expand(d_ref[0])
    acc_ref[...] += jax.lax.dot_general(
        x_ref[0], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "group", "out_dtype", "tiles"))
def qmm_stacked_multi(xs, q, d, layer, n_parts: int, group: int = QK,
                      out_dtype=jnp.float32, tiles=None):
    """N projections sharing one kernel pipeline: xs (N, T, in) — one input
    per sub-matrix — against concatenated weights q (L, in, N*Eo), d
    (L, in//group, N*Eo). The output tile's index map picks the matching
    input, so the whole fused r/k/v (or r/k/v/g) projection streams through
    ONE pallas_call per layer instead of N — amortizing the per-call
    pipeline spin-up that shows up at decode batch sizes. Returns (T, N*Eo);
    callers split along the last axis."""
    n, t, inn = xs.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    _check_aligned(inn, out, group)
    if tiles is None and t <= 256:
        tiles = DECODE_TILES
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(eo, tiles[0] if tiles else 512)   # tiles never span parts
    IT = _pick_tile(inn, (tiles[1] if tiles else (2048 if t <= 256 else 512)))
    per = eo // OT  # output tiles per sub-matrix

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn // IT),
        in_specs=[
            pl.BlockSpec((1, TT, IT), lambda r, o, i, l, per=per: (o // per, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT // group, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_stacked_multi_kernel, group=group, out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, q, d)


def qmm_reference(x, q, d, m=None, group: int = QK):
    """jnp fallback (CPU / non-TPU): identical math, XLA-fused."""
    inn, out = q.shape
    w = q.astype(jnp.float32).reshape(inn // group, group, out) * d[:, None, :]
    if m is not None:
        w = w + m[:, None, :]
    return jnp.dot(x, w.reshape(inn, out), preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Packed sub-byte (int4) kernels — the reference's headline capability:
# 4-bit weights whose bytes-on-the-bus are 4 bits (ggml vec_dot reads packed
# 32-element blocks directly; type table rwkv_file_format.inc:5-24, and Q4_0
# is both smaller AND faster than Q8_0 in the reference's own README table).
#
# TPU-native layout ("half-split packing"): a (in, out) matrix of unsigned
# 4-bit codes is stored as (in/2, out) uint8 where byte row r holds unpacked
# row r in its LOW nibble and row r + in/2 in its HIGH nibble. The kernel's
# contraction grid walks packed rows; each step unpacks both nibble planes
# with pure elementwise VPU ops (no sublane shuffles) and issues TWO dots —
# x's lo-half slice against the lo plane and x's hi-half slice against the
# hi plane — so every weight byte is DMA'd exactly once: 0.5 bytes/element,
# half of the int8 'qfast' path's traffic. Decode is weight-streaming-bound,
# so this is a near-proportional latency win.
#
# Codes are stored unsigned [0, 15]; `bias` (static) recovers signed formats
# (Q4_0: value = (code - 8) * d; Q4_1/Q4_K: value = code * d + m, bias 0).
# ---------------------------------------------------------------------------

DECODE_TILES_I4 = None  # autotuned (OT, IT_packed) override for t <= 256

# Model-level-measured decode-tile winners by model width (v5e, B=8, merged
# w4a8bc serving; ops/autotune.py re-derives these on other chips). Wide-OT
# tiles win at 7B width (contiguous weight-row DMA); square 1M tiles win at
# 1.5B. Applied by apply_tuned_decode_tiles (bench.py / serving boot).
TUNED_DECODE_TILES_I4 = {2048: (2048, 512), 4096: (4096, 256)}


def apply_tuned_decode_tiles(n_embed: int) -> None:
    """Set DECODE_TILES_I4 from the measured per-width winners (no-op for
    unmeasured widths — the shape-generic default heuristic applies)."""
    global DECODE_TILES_I4
    DECODE_TILES_I4 = TUNED_DECODE_TILES_I4.get(n_embed, DECODE_TILES_I4)

# In-kernel dequant compute dtype. MEASURED (v5e decode, 1.5B B=8): bf16
# interior is SLOWER than f32 (3.52 vs 3.01 ms/step) — the extra
# f32->bf16/u8->bf16 converts outweigh the halved multiply width, and the
# MXU dot already runs one bf16 pass on f32 inputs at DEFAULT precision.
# Keep f32; bf16 stays available for experiments.
I4_COMPUTE = jnp.float32

# Unpack domain for the nibble planes. 'i32' (widen first) is the ONLY
# domain current Mosaic lowers: 8-bit bitwise ops fail to legalize
# (arith.shrui on u8), and u8->f32 casts are unimplemented — both verified
# on-chip 2026-08-17. 'u8' is kept for when Mosaic grows 8-bit ALU support.
I4_UNPACK = "i32"


def pack_i4(q, bias: int = 0):
    """Codes (..., in, out) int8/int: values+bias must fit [0, 15]. Returns
    (..., in/2, out) uint8 half-split packed (row r lo-nibble, row r+in/2
    hi-nibble). numpy in, numpy out."""
    import numpy as np

    q = np.asarray(q).astype(np.int32) + bias
    if q.min() < 0 or q.max() > 15:
        raise ValueError(f"codes+bias outside [0,15]: [{q.min()}, {q.max()}]")
    inn = q.shape[-2]
    if inn % 2:
        raise ValueError(f"contraction dim {inn} must be even to pack")
    lo = q[..., : inn // 2, :].astype(np.uint8)
    hi = q[..., inn // 2 :, :].astype(np.uint8)
    return lo | (hi << 4)


def unpack_i4(qp):
    """(..., in/2, out) uint8 -> (..., in, out) int32 codes [0, 15] (jnp)."""
    qi = qp.astype(jnp.int32)
    return jnp.concatenate([qi & 15, qi >> 4], axis=-2)


def aligned_i4(inn: int, out: int, group: int = QK) -> bool:
    """Tiling feasibility for the packed kernels: out fills 128-lane tiles
    and each packed half splits into whole 8-sublane scale-group tiles."""
    return out % 128 == 0 and inn % (16 * group) == 0


def _check_aligned_i4(inn, out, group):
    if not aligned_i4(inn, out, group):
        raise ValueError(
            f"qmm_i4 kernel needs out % 128 == 0 and in % {16 * group} == 0, "
            f"got (in={inn}, out={out}); use qmm_i4_reference"
        )


def _i4_tiles(t, inn, out, group, tiles):
    if tiles is None and t <= 256:
        tiles = DECODE_TILES_I4
    half = inn // 2
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(out, tiles[0] if tiles else 512)
    # packed-row tile; default matches the int8 kernel's unpacked span
    # (IT=2048 worth of weights per step at decode shapes)
    ITp = _pick_tile(half, (tiles[1] if tiles else (1024 if t <= 256 else 256)))
    if ITp % group:
        raise ValueError(f"packed in_tile {ITp} not a multiple of {group}")
    return TT, OT, ITp


def _expand_scales(s, group):
    nb, ot = s.shape
    return jnp.broadcast_to(s[:, None, :], (nb, group, ot)).reshape(nb * group, ot)


def _i4_planes(q, bias, compute):
    if I4_UNPACK == "u8":
        # bit-ops at 8-bit vector width; Mosaic has no u8->f32 cast, so hop
        # through i8 (values <= 15, exact) the way the int8 kernel converts
        lo = (q & jnp.uint8(15)).astype(jnp.int8).astype(compute) - bias
        hi = (q >> jnp.uint8(4)).astype(jnp.int8).astype(compute) - bias
    elif I4_UNPACK == "i16":
        # 16-bit ALU domain: twice the vector width of i32 if Mosaic keeps
        # the ops at native 16-bit packing
        qi = q.astype(jnp.int16)
        lo = ((qi & jnp.int16(15)) - jnp.int16(bias)).astype(compute)
        hi = ((qi >> jnp.int16(4)) - jnp.int16(bias)).astype(compute)
    else:
        qi = q.astype(jnp.int32)
        lo = ((qi & 15) - bias).astype(compute)
        hi = ((qi >> 4) - bias).astype(compute)
    return lo, hi


def _i4_weights(q, dlo, dhi, mlo, mhi, *, with_min, group, bias, compute):
    """Unpack one packed tile into its (w_lo, w_hi) dequantized planes."""
    lo, hi = _i4_planes(q, bias, compute)
    if with_min:
        w_lo = lo * _expand_scales(dlo.astype(compute), group) + _expand_scales(mlo.astype(compute), group)
        w_hi = hi * _expand_scales(dhi.astype(compute), group) + _expand_scales(mhi.astype(compute), group)
    else:
        w_lo = lo * _expand_scales(dlo.astype(compute), group)
        w_hi = hi * _expand_scales(dhi.astype(compute), group)
    return w_lo, w_hi


def _qmm_i4_kernel(x_lo_ref, x_hi_ref, q_ref, dlo_ref, dhi_ref, o_ref, acc_ref,
                   *, with_min, group, bias, out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if with_min:
        args = (dlo_ref[:, :, 0], dhi_ref[:, :, 0], dlo_ref[:, :, 1], dhi_ref[:, :, 1])
    else:
        args = (dlo_ref[...], dhi_ref[...], None, None)
    w_lo, w_hi = _i4_weights(q_ref[...], *args, with_min=with_min, group=group,
                             bias=bias, compute=compute)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[...].astype(compute), w_lo, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[...].astype(compute), w_hi, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bias", "group", "out_dtype",
                                             "tiles", "compute"))
def qmm_i4(x, q, d, m=None, bias: int = 8, group: int = QK,
           out_dtype=jnp.float32, tiles=None, compute=None):
    """x: (T, in) f32; q: (in/2, out) uint8 half-split packed nibbles;
    d[, m]: (in//group, out) f32. y = x @ ((codes - bias) * d (+ m))."""
    compute = I4_COMPUTE if compute is None else compute
    t, inn2 = x.shape[0], q.shape[0]
    inn, out = 2 * inn2, q.shape[1]
    assert x.shape[1] == inn
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i4_tiles(t, inn, out, group, tiles)
    NH = inn2 // ITp      # contraction steps; hi-half block offset

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        dg = ITp // group
        d_lo = pl.BlockSpec((dg, OT, 2), lambda r, o, i: (i, o, 0), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((dg, OT, 2), lambda r, o, i, NH=NH: (NH + i, o, 0), memory_space=pltpu.VMEM)
    else:
        dm = d
        dg = ITp // group
        d_lo = pl.BlockSpec((dg, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((dg, OT), lambda r, o, i, NH=NH: (NH + i, o), memory_space=pltpu.VMEM)

    grid = (t // TT, out // OT, NH)
    return pl.pallas_call(
        functools.partial(_qmm_i4_kernel, with_min=with_min, group=group,
                          bias=bias, out_dtype=out_dtype, compute=compute),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TT, ITp), lambda r, o, i: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, ITp), lambda r, o, i, NH=NH: (r, NH + i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ITp, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM),
            d_lo,
            d_hi,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i: (r, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )(x, x, q, dm, dm)


def _qmm_i4_stacked_kernel(l_ref, x_lo_ref, x_hi_ref, q_ref, dlo_ref, dhi_ref,
                           o_ref, acc_ref, *, with_min, group, bias, out_dtype,
                           compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if with_min:
        args = (dlo_ref[0, :, :, 0], dhi_ref[0, :, :, 0],
                dlo_ref[0, :, :, 1], dhi_ref[0, :, :, 1])
    else:
        args = (dlo_ref[0], dhi_ref[0], None, None)
    w_lo, w_hi = _i4_weights(q_ref[0], *args, with_min=with_min, group=group,
                             bias=bias, compute=compute)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[...].astype(compute), w_lo, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[...].astype(compute), w_hi, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bias", "group", "out_dtype",
                                             "tiles", "compute"))
def qmm_i4_stacked(x, q, d, m, layer, bias: int = 8, group: int = QK,
                   out_dtype=jnp.float32, tiles=None, compute=None):
    """Layer-stacked packed-int4 fused dequant-matmul: q (L, in/2, out)
    uint8, d/m (L, in//group, out) f32, layer a traced scalar. The decode
    hot path for 4-bit serving (same scalar-prefetch trick as qmm_stacked)."""
    compute = I4_COMPUTE if compute is None else compute
    t = x.shape[0]
    inn2, out = q.shape[1], q.shape[2]
    inn = 2 * inn2
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i4_tiles(t, inn, out, group, tiles)
    NH = inn2 // ITp
    dg = ITp // group

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_lo = pl.BlockSpec((1, dg, OT, 2), lambda r, o, i, l: (l[0], i, o, 0), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((1, dg, OT, 2), lambda r, o, i, l, NH=NH: (l[0], NH + i, o, 0), memory_space=pltpu.VMEM)
    else:
        dm = d
        d_lo = pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((1, dg, OT), lambda r, o, i, l, NH=NH: (l[0], NH + i, o), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, NH),
        in_specs=[
            pl.BlockSpec((TT, ITp), lambda r, o, i, l: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, ITp), lambda r, o, i, l, NH=NH: (r, NH + i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM),
            d_lo,
            d_hi,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_i4_stacked_kernel, with_min=with_min, group=group,
                          bias=bias, out_dtype=out_dtype, compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, x, q, dm, dm)


def _qmm_i4_stacked_multi_kernel(l_ref, x_lo_ref, x_hi_ref, q_ref, dlo_ref,
                                 dhi_ref, o_ref, acc_ref, *, group, bias,
                                 out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_lo, w_hi = _i4_weights(q_ref[0], dlo_ref[0], dhi_ref[0], None, None,
                             with_min=False, group=group, bias=bias,
                             compute=compute)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[0].astype(compute), w_lo, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[0].astype(compute), w_hi, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "bias", "group",
                                             "out_dtype", "tiles", "compute"))
def qmm_i4_stacked_multi(xs, q, d, layer, n_parts: int, bias: int = 8,
                         group: int = QK, out_dtype=jnp.float32, tiles=None,
                         compute=None):
    """N projections through one packed-int4 kernel pipeline: xs (N, T, in),
    q (L, in/2, N*Eo) uint8 half-split packed, d (L, in//group, N*Eo) f32.
    The output tile's index map picks the matching input (same fusion trick
    as qmm_stacked_multi). Returns (T, N*Eo)."""
    compute = I4_COMPUTE if compute is None else compute
    n, t, inn = xs.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i4_tiles(t, inn, eo, group, tiles)   # tiles never span parts
    NH = (inn // 2) // ITp
    dg = ITp // group
    per = eo // OT

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, NH),
        in_specs=[
            pl.BlockSpec((1, TT, ITp), lambda r, o, i, l, per=per: (o // per, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, ITp), lambda r, o, i, l, per=per, NH=NH: (o // per, r, NH + i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l, NH=NH: (l[0], NH + i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_i4_stacked_multi_kernel, group=group, bias=bias,
                          out_dtype=out_dtype, compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, xs, q, d, d)


# ---------------------------------------------------------------------------
# Native-s4 variants: q stored as a jnp.int4 array (XLA packs 2 codes/byte in
# HBM — same bytes-on-the-bus as the half-split layout) and the *hardware*
# unpack happens inside Mosaic's s4->f32 convert, replacing the half-split
# kernels' explicit widen/mask/shift/convert chain (~6 VPU ops/element, which
# co-limits those kernels with DMA). Codes are signed (-8..7): Q4_0-class
# values are code * d with no bias term.
# ---------------------------------------------------------------------------


def _qmm_s4_stacked_kernel(l_ref, x_ref, q_ref, d_ref, o_ref, acc_ref, *,
                           group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (IT, OT) int4
    it, ot = q.shape
    nb = it // group

    def expand(s):
        return jnp.broadcast_to(s[:, None, :], (nb, group, ot)).reshape(it, ot)

    w = q.astype(jnp.float32) * expand(d_ref[0])
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "tiles"))
def qmm_s4_stacked(x, q, d, layer, group: int = QK, out_dtype=jnp.float32,
                   tiles=None):
    """Layer-stacked fused dequant-matmul on native s4 codes: q (L, in, out)
    jnp.int4, d (L, in//group, out) f32, layer a traced scalar."""
    t, inn = x.shape
    out = q.shape[2]
    _check_aligned(inn, out, group)
    if tiles is None and t <= 256:
        tiles = DECODE_TILES_I4
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(out, tiles[0] if tiles else 512)
    IT = _pick_tile(inn, (tiles[1] if tiles else (2048 if t <= 256 else 512)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn // IT),
        in_specs=[
            pl.BlockSpec((TT, IT), lambda r, o, i, l: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT // group, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_s4_stacked_kernel, group=group, out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, q, d)


def _qmm_s4_stacked_multi_kernel(l_ref, x_ref, q_ref, d_ref, o_ref, acc_ref, *,
                                 group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    it, ot = q.shape
    nb = it // group

    def expand(s):
        return jnp.broadcast_to(s[:, None, :], (nb, group, ot)).reshape(it, ot)

    w = q.astype(jnp.float32) * expand(d_ref[0])
    acc_ref[...] += jax.lax.dot_general(
        x_ref[0], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "group", "out_dtype", "tiles"))
def qmm_s4_stacked_multi(xs, q, d, layer, n_parts: int, group: int = QK,
                         out_dtype=jnp.float32, tiles=None):
    """N projections through one native-s4 kernel pipeline: xs (N, T, in),
    q (L, in, N*Eo) jnp.int4 signed codes, d (L, in//group, N*Eo) f32.
    Same fusion trick as qmm_stacked_multi. Returns (T, N*Eo)."""
    n, t, inn = xs.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    _check_aligned(inn, out, group)
    if tiles is None and t <= 256:
        tiles = DECODE_TILES_I4
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(eo, tiles[0] if tiles else 512)   # tiles never span parts
    IT = _pick_tile(inn, (tiles[1] if tiles else (2048 if t <= 256 else 512)))
    per = eo // OT

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn // IT),
        in_specs=[
            pl.BlockSpec((1, TT, IT), lambda r, o, i, l, per=per: (o // per, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, IT // group, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_s4_stacked_multi_kernel, group=group,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, q, d)


# ---------------------------------------------------------------------------
# w4a8 grouped integer-dot: the low-dequant-cost 4-bit path. Activations are
# pre-quantized to per-row int8 (same recipe as w8a8, ops/linear.py); codes
# travel HBM->VMEM as half-split packed nibbles (0.5 B/elem, the exact q4fast
# layout) and are widened to s8 in VMEM; the kernel contracts s8 x s8 on the
# MXU in per-scale-group batched dots and applies the EXACT per-32-block
# scales to the (T, OT) partial sums — so the f32 per-element dequant
# multiply chain of the f32-interior kernels (the VPU work that co-limits
# them with DMA) shrinks to an integer unpack: f32 multiply-adds per weight
# element drop to ~T/group (0.25 at decode T=8).
#
# Storage is uint8 half-split packed, NOT jnp.int4: Mosaic rejects
# mixed-width int matmuls ("Mix int/int - NYI", BENCH_r03), and the axon
# relay cannot pass S4 arrays across a jit boundary at all (RecursionError,
# probe 2026-08-18) — packed bytes hit neither wall and keep identical
# bytes-on-the-bus. Accuracy = q4fast codes (identical values) + a8
# activation rounding (the w8a8-class recipe, corr > 0.999).
# ---------------------------------------------------------------------------


def quantize_acts_s8(x):
    """x (T, in) f32 -> (xqT (in, T) int8, da (T, 1) f32). Transposed so the
    kernel's per-group reshape splits the SUBLANE dim (free) rather than
    lanes. Callers multiply the kernel output by da."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    da = jnp.maximum(amax, 1e-8) / jnp.float32(127.0)
    xq = jnp.round(x / da).astype(jnp.int8)
    return xq.T, da


def _w4a8_planes(q, bias):
    """Packed (ITp, OT) uint8 tile -> (lo, hi) s8 code planes. i32 ALU
    domain (the only one Mosaic lowers, see I4_UNPACK) then a pack to s8
    for the MXU int path."""
    qi = q.astype(jnp.int32)
    lo = ((qi & 15) - bias).astype(jnp.int8)
    hi = ((qi >> 4) - bias).astype(jnp.int8)
    return lo, hi


def _w4a8_partial(xp, wp, dp, group):
    """One plane's grouped integer dot: xp (ITp, TT) s8, wp (ITp, OT) s8,
    dp (ITp//group, OT) scales -> (TT, OT) f32 partial."""
    itp, tt = xp.shape
    ot = wp.shape[1]
    nb = itp // group
    z = jax.lax.dot_general(
        xp.reshape(nb, group, tt), wp.reshape(nb, group, ot),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                     # (nb, TT, OT) int32
    return jnp.sum(z.astype(jnp.float32) * dp.astype(jnp.float32)[:, None, :],
                   axis=0)


def _qmm_w4a8_stacked_kernel(l_ref, xlo_ref, xhi_ref, q_ref, dlo_ref, dhi_ref,
                             o_ref, acc_ref, *, group, bias, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo, hi = _w4a8_planes(q_ref[0], bias)
    acc_ref[...] += (
        _w4a8_partial(xlo_ref[...], lo, dlo_ref[0], group)
        + _w4a8_partial(xhi_ref[...], hi, dhi_ref[0], group)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


def _grouped_itp(half, step, lo, want):
    """Packed-row tile for the grouped-scale kernels. Must (a) DIVIDE `half`
    — the kernel grids floor-divide, so a non-divisor would silently drop
    trailing packed rows (never contract them); (b) be a multiple of `step`
    so each tile unpacks to whole scale groups; (c) be >= `lo` so the scale
    tile has >= 8 sublane rows (Pallas f32 block rule). Returns the largest
    feasible value <= `want`, else the smallest feasible one, else None."""
    best = best_small = None
    m = step
    while m <= half:
        if m >= lo and half % m == 0:
            if m <= want:
                best = m
            elif best_small is None:
                best_small = m
        m += step
    return best if best is not None else best_small


def bc4a8_aligned(inn: int, out: int, group: int = 128) -> bool:
    """Tiling feasibility for the bc4a8 (row-pair bitcast + grouped-int-dot)
    kernels: out fills 128-lane tiles, in splits into whole scale groups,
    and a packed-row tile exists that DIVIDES in/2 while unpacking to whole
    groups with a >= 8-row scale block. Non-conforming widths (e.g.
    in=2560 at group=256) must route to qmm_bc4a8_reference."""
    inn2 = inn // 2
    return (inn % (2 * group) == 0 and out % 128 == 0
            and _grouped_itp(inn2, max(group // 2, 8), 4 * group, inn2)
            is not None)


def aligned_w4a8(inn: int, out: int, group: int = QK) -> bool:
    """Tiling feasibility for the packed grouped-int kernels: out fills
    128-lane tiles, each packed half splits into whole scale groups, AND a
    packed-row tile exists whose scale block has >= 8 sublane rows (groups
    may be coarse — 64/128/256 — for the serving-only INT4G* formats; at
    small widths a coarse group can make that tile infeasible, in which
    case callers must route to qmm_w4a8_reference)."""
    half = inn // 2
    return (inn % 2 == 0 and out % 128 == 0 and half % group == 0
            and half % 8 == 0
            and _grouped_itp(half, group, 8 * group, half) is not None)


def _w4a8_tiles(t, inn, out, group, tiles):
    """Tile sizes for the packed grouped-int kernels; ITp indexes PACKED
    rows (half the unpacked contraction span). The scale BlockSpec is
    (1, ITp // group, OT), so ITp must be a multiple of `group` AND give
    >= 8 scale rows — enforced divisibility-safely via _grouped_itp."""
    half = inn // 2
    TT = _pick_tile(t, 256) if t > 256 else t
    if tiles is None and t <= 256:
        tiles = DECODE_TILES_I4
    OT = _pick_tile(out, tiles[0] if tiles else 512)
    want = _pick_tile(half, (tiles[1] if tiles else (1024 if t <= 256 else 256)))
    ITp = _grouped_itp(half, group, 8 * group, want)
    if ITp is None:
        raise ValueError(
            f"w4a8 kernel: no packed-row tile divides in/2={half} with a "
            f">=8-row scale block at group={group}; use qmm_w4a8_reference")
    return TT, OT, ITp


@functools.partial(jax.jit, static_argnames=("bias", "group", "out_dtype",
                                             "tiles"))
def qmm_w4a8_stacked(xt, q, d, layer, bias: int = 8, group: int = QK,
                     out_dtype=jnp.float32, tiles=None):
    """Layer-stacked grouped-integer-dot matmul on PACKED nibbles: xt (in, T)
    int8 activations (quantize_acts_s8, contraction-major), q (L, in/2, out)
    uint8 half-split packed codes (pack_i4 layout: byte row r = unpacked row
    r lo-nibble, row r+in/2 hi-nibble), d (L, in//group, out) f32/bf16
    per-group scales. Returns UNSCALED (T, out) f32 — multiply by the
    caller's per-row activation scale da."""
    inn, t = xt.shape
    out = q.shape[2]
    half = inn // 2
    if not aligned_w4a8(inn, out, group):
        raise ValueError(f"w4a8 kernel needs out % 128 == 0 and (in/2) % "
                         f"{group} == 0, got (in={inn}, out={out})")
    TT, OT, ITp = _w4a8_tiles(t, inn, out, group, tiles)
    hb = half // ITp                      # hi-plane block offset

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, half // ITp),
        in_specs=[
            pl.BlockSpec((ITp, TT), lambda r, o, i, l: (i, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ITp, TT), lambda r, o, i, l, hb=hb: (i + hb, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp // group, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp // group, OT),
                         lambda r, o, i, l, hb=hb: (l[0], i + hb, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_w4a8_stacked_kernel, group=group, bias=bias,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xt, xt, q, d, d)


def _qmm_w4a8_stacked_multi_kernel(l_ref, xlo_ref, xhi_ref, q_ref, dlo_ref,
                                   dhi_ref, o_ref, acc_ref, *, group, bias,
                                   out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo, hi = _w4a8_planes(q_ref[0], bias)
    acc_ref[...] += (
        _w4a8_partial(xlo_ref[0], lo, dlo_ref[0], group)
        + _w4a8_partial(xhi_ref[0], hi, dhi_ref[0], group)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "bias", "group",
                                             "out_dtype", "tiles"))
def qmm_w4a8_stacked_multi(xts, q, d, layer, n_parts: int, bias: int = 8,
                           group: int = QK, out_dtype=jnp.float32, tiles=None):
    """N projections through one packed grouped-integer-dot pipeline: xts
    (N, in, T) int8 pre-quantized transposed activations (quantize_acts_s8
    per part), q (L, in/2, N*Eo) uint8 half-split packed codes, d
    (L, in//group, N*Eo) f32/bf16. The output tile's index map picks the
    matching activation block (same fusion trick as qmm_stacked_multi).
    Returns UNSCALED (T, N*Eo) f32 — callers split along the last axis and
    multiply each part by its own per-row activation scale da."""
    n, inn, t = xts.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    half = inn // 2
    if not aligned_w4a8(inn, eo, group):
        raise ValueError(f"w4a8 multi kernel needs eo % 128 == 0 and (in/2) "
                         f"% {group} == 0, got (in={inn}, eo={eo})")
    TT, OT, ITp = _w4a8_tiles(t, inn, eo, group, tiles)
    per = eo // OT
    hb = half // ITp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, half // ITp),
        in_specs=[
            pl.BlockSpec((1, ITp, TT),
                         lambda r, o, i, l, per=per: (o // per, i, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, TT),
                         lambda r, o, i, l, per=per, hb=hb: (o // per, i + hb, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp // group, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp // group, OT),
                         lambda r, o, i, l, hb=hb: (l[0], i + hb, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_w4a8_stacked_multi_kernel, group=group,
                          bias=bias, out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xts, xts, q, d, d)


# ---------------------------------------------------------------------------
# Bitcast-unpack packed-int4 kernels ("bc4"): the hardware-unpack 4-bit path.
#
# Layout ("row-pair packing"): a (in, out) matrix of SIGNED s4 codes (two's
# complement, value = s*d (+ m')) is stored as (in/2, out) uint8 where byte
# row r holds unpacked row 2r in its LOW nibble and row 2r+1 in its HIGH
# nibble. In-kernel, `pltpu.bitcast(tile, int4)` reinterprets the (ITp, OT)
# byte tile as (2*ITp, OT) s4 along the SUBLANE dim — verified on-chip
# (probe 2026-08-19): lo-first order, so the unpack is a FREE register
# reinterpret and the natural row order needs no permutation anywhere.
# Dequant then costs ONE hardware convert + one multiply per element,
# replacing the half-split kernels' widen/mask/shift/sub chain (~4.5 VPU
# ops/elem — the measured co-limiter of int4 decode).
#
# Min-bias formats (Q4_1/Q4_K/Q2_K/Q3_K: value = (code - bias)*d + m) fold
# into this layout exactly: s = code - 8 (mod 16), m' = (8 - bias)*d + m,
# computed once at pack time.
# ---------------------------------------------------------------------------


def pack_bc4(codes, bias: int = 8):
    """Codes (..., in, out) unsigned-domain ints: values+... i.e. the same
    [0, 15] code domain pack_i4 takes (value = (code - bias) * d + m).
    Returns (..., in/2, out) uint8 row-pair packed SIGNED nibbles
    s = code - 8; callers with bias != 8 must fold the residual offset into
    m' = (8 - bias) * d + m. numpy in, numpy out."""
    import numpy as np

    q = np.asarray(codes).astype(np.int32)
    if q.min() < 0 or q.max() > 15:
        raise ValueError(f"codes outside [0,15]: [{q.min()}, {q.max()}]")
    s = (q - 8) & 15
    lo = s[..., 0::2, :].astype(np.uint8)
    hi = s[..., 1::2, :].astype(np.uint8)
    return lo | (hi << 4)


def pack_bc4_signed(codes):
    """Signed codes (..., in, out) in [-8, 7] -> (..., in/2, out) uint8
    row-pair packed two's-complement nibbles. numpy in, numpy out."""
    import numpy as np

    s = np.asarray(codes).astype(np.int32)
    if s.min() < -8 or s.max() > 7:
        raise ValueError(f"codes outside [-8,7]: [{s.min()}, {s.max()}]")
    s = s & 15
    lo = s[..., 0::2, :].astype(np.uint8)
    hi = s[..., 1::2, :].astype(np.uint8)
    return lo | (hi << 4)


def unpack_bc4(qp):
    """(..., in/2, out) uint8 row-pair packed -> (..., in, out) int32 signed
    codes [-8, 7] (jnp; CPU-safe reference unpack)."""
    qi = qp.astype(jnp.int32)
    lo = ((qi & 15) ^ 8) - 8
    hi = ((qi >> 4) ^ 8) - 8
    *lead, inn2, out = qi.shape
    # interleave: row 2r = lo[r], row 2r+1 = hi[r]
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, 2 * inn2, out)


def _bc4_weights(q, d, m, *, group, compute):
    """Bitcast-unpack one packed tile to its dequantized (2*ITp, OT) plane."""
    w4 = pltpu.bitcast(q, jnp.int4)                  # (2*ITp, OT) s4, free
    w = w4.astype(compute) * _expand_scales(d.astype(compute), group)
    if m is not None:
        w = w + _expand_scales(m.astype(compute), group)
    return w


def _qmm_bc4_stacked_kernel(l_ref, x_ref, q_ref, dm_ref, o_ref, acc_ref, *,
                            with_min, group, out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if with_min:
        d, m = dm_ref[0, :, :, 0], dm_ref[0, :, :, 1]
    else:
        d, m = dm_ref[0], None
    w = _bc4_weights(q_ref[0], d, m, group=group, compute=compute)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...].astype(compute), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "tiles",
                                             "compute"))
def qmm_bc4_stacked(x, q, d, m, layer, group: int = QK, out_dtype=jnp.float32,
                    tiles=None, compute=None):
    """Layer-stacked bitcast-unpack int4 matmul: x (T, in) f32, q
    (L, in/2, out) uint8 row-pair packed signed nibbles, d[, m']
    (L, in//group, out) f32 (m' = folded min offset, see pack_bc4), layer a
    traced scalar."""
    compute = I4_COMPUTE if compute is None else compute
    t = x.shape[0]
    inn2, out = q.shape[1], q.shape[2]
    inn = 2 * inn2
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i4_tiles(t, inn, out, group, tiles)
    dg = 2 * ITp // group

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_spec = pl.BlockSpec((1, dg, OT, 2), lambda r, o, i, l: (l[0], i, o, 0),
                              memory_space=pltpu.VMEM)
    else:
        dm = d
        d_spec = pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn2 // ITp),
        in_specs=[
            pl.BlockSpec((TT, 2 * ITp), lambda r, o, i, l: (r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            d_spec,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_bc4_stacked_kernel, with_min=with_min,
                          group=group, out_dtype=out_dtype, compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, q, dm)


def _qmm_bc4_stacked_multi_kernel(l_ref, x_ref, q_ref, dm_ref, o_ref, acc_ref,
                                  *, with_min, group, out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if with_min:
        d, m = dm_ref[0, :, :, 0], dm_ref[0, :, :, 1]
    else:
        d, m = dm_ref[0], None
    w = _bc4_weights(q_ref[0], d, m, group=group, compute=compute)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[0].astype(compute), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "group", "out_dtype",
                                             "tiles", "compute"))
def qmm_bc4_stacked_multi(xs, q, d, m, layer, n_parts: int, group: int = QK,
                          out_dtype=jnp.float32, tiles=None, compute=None):
    """N projections through one bitcast-unpack int4 pipeline: xs (N, T, in),
    q (L, in/2, N*Eo) row-pair packed, d[, m'] (L, in//group, N*Eo). Same
    output-tile activation-block fusion as qmm_i4_stacked_multi."""
    compute = I4_COMPUTE if compute is None else compute
    n, t, inn = xs.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    inn2 = inn // 2
    _check_aligned_i4(inn, eo, group)
    TT, OT, ITp = _i4_tiles(t, inn, eo, group, tiles)
    per = eo // OT
    dg = 2 * ITp // group

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_spec = pl.BlockSpec((1, dg, OT, 2), lambda r, o, i, l: (l[0], i, o, 0),
                              memory_space=pltpu.VMEM)
    else:
        dm = d
        d_spec = pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn2 // ITp),
        in_specs=[
            pl.BlockSpec((1, TT, 2 * ITp),
                         lambda r, o, i, l, per=per: (o // per, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            d_spec,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_bc4_stacked_multi_kernel, with_min=with_min,
                          group=group, out_dtype=out_dtype, compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, q, dm)


# ---------------------------------------------------------------------------
# bc4a8: bitcast-unpack + grouped s8 integer dots — the DMA-bound 4-bit
# decode path. Combines the two measured wins:
#   - row-pair bitcast layout: weight unpack = free pltpu.bitcast + ONE
#     astype(int8) (~1 VPU op/elem, vs ~4.5 for the f32-interior chain that
#     VPU-binds qmm_i4/* at ~3.5 Tops on v5e regardless of model size);
#   - coarse scale groups (128/256): each per-group s8 x s8 integer dot
#     contracts K=group, filling the MXU's 128-deep pipeline that K=32
#     group dots leave 4x idle; exact scales applied to int32 partial sums
#     (f32 work = T*out*nb, ~0.06 ops per weight element at decode).
# Activations are per-row s8 (quantize_acts_s8) — the w8a8-class rounding.
# Semantics identical to the INT4G<group> w4a8 serving formats.
# ---------------------------------------------------------------------------


# Kernel-interior schedule for the bc4a8 dots. The "full" form does ONE
# tile-wide astype(i8) then one batched grouped dot — simple, but it hands
# Mosaic a strict VPU(unpack-all) -> MXU(dot-all) dependency chain, so the
# VPU, MXU and the next tile's weight DMA serialize (measured 57% of the
# DMA floor at 7B). "groups" unrolls per-scale-group astype+dot pairs:
# group g+1's nibble widen has no dependency on group g's dot, so Mosaic
# can run the VPU unpack UNDER the MXU pass and both under the DMA.
# "groupdots" isolates the dot-shape half of that change (full-tile astype,
# per-group dots). Module knob so ops/autotune.py / scratch A/Bs can flip;
# model-level measurement decides the default.
BC4A8_INTERIOR = "full"


def _bc4a8_accum(qb, xt, d, acc_ref, *, group):
    """Accumulate xtᵀ·dequant(qb) into acc_ref (f32 (TT, OT) scratch).
    qb (ITp, OT) u8 row-pair packed nibbles, xt (2*ITp, TT) s8
    contraction-major activations, d (nb, OT) f32 per-group scales."""
    it, tt = xt.shape
    ot = qb.shape[-1]
    nb = it // group
    gp = group // 2                           # packed rows per scale group
    if BC4A8_INTERIOR == "groups":
        for g in range(nb):
            wg = pltpu.bitcast(qb[g * gp:(g + 1) * gp], jnp.int4)
            z = jax.lax.dot_general(
                xt[g * group:(g + 1) * group], wg.astype(jnp.int8),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                 # (TT, OT) i32
            acc_ref[...] += z.astype(jnp.float32) * d[g][None, :]
        return
    if BC4A8_INTERIOR == "halves" and nb % 2 == 0:
        # two sub-chunks: chunk 1's astype can run under chunk 0's dots,
        # at O(1) compile cost (the fully-unrolled "groups" form measured
        # >600 s Mosaic compiles at nb=8 7B shapes). lax.slice_in_dim +
        # expand_dims, NOT `d[a:b, None, :]` — the latter lowers through
        # Mosaic's gather rule and fails shape validation.
        hb = nb // 2
        for c in range(2):
            wc = pltpu.bitcast(
                jax.lax.slice_in_dim(qb, c * hb * gp, (c + 1) * hb * gp,
                                     axis=0),
                jnp.int4).astype(jnp.int8)
            z = jax.lax.dot_general(
                jax.lax.slice_in_dim(xt, c * hb * group,
                                     (c + 1) * hb * group,
                                     axis=0).reshape(hb, group, tt),
                wc.reshape(hb, group, ot),
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32,
            )                                 # (hb, TT, OT) i32
            dc = jax.lax.slice_in_dim(d, c * hb, (c + 1) * hb, axis=0)
            acc_ref[...] += jnp.sum(
                z.astype(jnp.float32) * jnp.expand_dims(dc, 1), axis=0)
        return
    w = pltpu.bitcast(qb, jnp.int4).astype(jnp.int8)        # (2*ITp, OT)
    if BC4A8_INTERIOR == "groupdots":
        for g in range(nb):
            z = jax.lax.dot_general(
                xt[g * group:(g + 1) * group], w[g * group:(g + 1) * group],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc_ref[...] += z.astype(jnp.float32) * d[g][None, :]
        return
    z = jax.lax.dot_general(
        xt.reshape(nb, group, tt), w.reshape(nb, group, ot),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )                                                       # (nb, TT, OT) i32
    acc_ref[...] += jnp.sum(z.astype(jnp.float32) * d[:, None, :], axis=0)


def _qmm_bc4a8_stacked_kernel(l_ref, xt_ref, q_ref, d_ref, o_ref, acc_ref, *,
                              group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _bc4a8_accum(q_ref[0], xt_ref[...], d_ref[0].astype(jnp.float32),
                 acc_ref, group=group)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "tiles"))
def qmm_bc4a8_stacked(xt, q, d, layer, group: int = 128,
                      out_dtype=jnp.float32, tiles=None):
    """Layer-stacked bitcast + grouped-integer-dot matmul: xt (in, T) int8
    activations (quantize_acts_s8, contraction-major), q (L, in/2, out)
    uint8 ROW-PAIR packed signed nibbles (pack_bc4), d (L, in//group, out)
    f32/bf16 per-group scales. Returns UNSCALED (T, out) f32 — multiply by
    the caller's per-row activation scale da."""
    inn, t = xt.shape
    out = q.shape[2]
    inn2 = inn // 2
    if not bc4a8_aligned(inn, out, group):
        raise ValueError(f"bc4a8 kernel needs out % 128 == 0 and a feasible "
                         f"packed-row tile (in % {2 * group} == 0, scale "
                         f"block >= 8 rows, tile divides in/2), got "
                         f"(in={inn}, out={out}); use qmm_bc4a8_reference")
    TT, OT, ITp = _i4_tiles(t, inn, out, 1, tiles)
    # scale tile (1, 2*ITp//group, OT) needs >= 8 sublane rows AND ITp must
    # divide inn2 (the grid floor-divides — a non-divisor would silently
    # drop trailing packed rows); _i4_tiles' ITp is only the size target
    ITp = _grouped_itp(inn2, max(group // 2, 8), 4 * group, ITp)
    dg = 2 * ITp // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn2 // ITp),
        in_specs=[
            pl.BlockSpec((2 * ITp, TT), lambda r, o, i, l: (i, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_bc4a8_stacked_kernel, group=group,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xt, q, d)


def _qmm_bc4a8_stacked_multi_kernel(l_ref, xt_ref, q_ref, d_ref, o_ref,
                                    acc_ref, *, group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _bc4a8_accum(q_ref[0], xt_ref[0], d_ref[0].astype(jnp.float32),
                 acc_ref, group=group)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "group", "out_dtype",
                                             "tiles"))
def qmm_bc4a8_stacked_multi(xts, q, d, layer, n_parts: int, group: int = 128,
                            out_dtype=jnp.float32, tiles=None):
    """N projections through one bc4a8 pipeline: xts (N, in, T) int8
    pre-quantized transposed activations, q (L, in/2, N*Eo) row-pair packed,
    d (L, in//group, N*Eo). Returns UNSCALED (T, N*Eo) f32; callers split
    and rescale per part."""
    n, inn, t = xts.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    inn2 = inn // 2
    if not bc4a8_aligned(inn, eo, group):
        raise ValueError(f"bc4a8 multi kernel needs eo % 128 == 0 and a "
                         f"feasible packed-row tile, got (in={inn}, "
                         f"eo={eo}); use qmm_bc4a8_reference")
    TT, OT, ITp = _i4_tiles(t, inn, eo, 1, tiles)
    ITp = _grouped_itp(inn2, max(group // 2, 8), 4 * group, ITp)
    per = eo // OT
    dg = 2 * ITp // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn2 // ITp),
        in_specs=[
            pl.BlockSpec((1, 2 * ITp, TT),
                         lambda r, o, i, l, per=per: (o // per, i, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_bc4a8_stacked_multi_kernel, group=group,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xts, q, d)


def qmm_bc4a8_reference(x, q, d, group: int = 128):
    """jnp reference for the bc4a8 path (CPU-safe): unpack row-pair signed
    codes, quantize activations per-row to s8, grouped int dots, per-group
    rescale of partial sums."""
    xt, da = quantize_acts_s8(x)
    codes = unpack_bc4(q)                 # (in, out) int32 signed
    inn, out = codes.shape[-2], codes.shape[-1]
    nb = inn // group
    z = jax.lax.dot_general(
        xt.astype(jnp.int32).reshape(nb, group, -1),
        codes.reshape(nb, group, out),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    y = jnp.sum(z.astype(jnp.float32) * d.astype(jnp.float32)[:, None, :], axis=0)
    return y * da


# ---------------------------------------------------------------------------
# bc5a8: the 5-bit extension of the bc4a8 path (INT5G<group> serving class).
# A signed 5-bit code s in [-16, 15] splits EXACTLY into
#     s = n + 8*sigma,   n = ((s + 16) & 15) - 8 in [-8, 7],  sigma in {-1,+1}
# (sigma = +1 iff s >= 0 ... precisely: s >= 0 <=> high bit of s+16 set).
# Both planes unpack for FREE with pltpu.bitcast:
#   - n: the same row-pair packed s4 layout as bc4a8 (0.5 B/elem);
#   - sigma: ROW-QUAD packed two's-complement 2-bit codes (-1 = 0b11,
#     +1 = 0b01), bitcast(u8, int2) -> 4 sublane rows per byte (0.25 B/elem).
# Total 0.75 B/elem on the bus (vs 0.625 for the ggml Q5 block formats and
# 1.0 for int8) with a ~2-convert/elem VPU interior instead of the
# bit-plane shift/mask chain that VPU-binds the q5fast kernels
# (docs/KERNELS.md "The VPU-dequant wall").
# Interiors (module knob, model-level measured):
#   "twodot": z = dot(x, n) + (dot(x, sigma) << 3) — two s8 MXU dots per
#     group, zero extra VPU work beyond the two astypes;
#   "onedot": w = n + sigma*8 reassembled in s8 registers — one dot, +2 VPU
#     ops/elem (requires i8 mul to legalize in Mosaic).
# ---------------------------------------------------------------------------

BC5A8_INTERIOR = "twodot"


def pack_i2_rowquad(codes):
    """Signed codes (..., in, out) in [-2, 1] -> (..., in/4, out) uint8
    row-quad packed two's-complement 2-bit fields: byte row r holds rows
    4r..4r+3 in bit pairs (0:1), (2:3), (4:5), (6:7) (lo-first, matching
    pltpu.bitcast(u8, int2) sublane order). numpy in, numpy out."""
    import numpy as np

    s = np.asarray(codes).astype(np.int32)
    if s.min() < -2 or s.max() > 1:
        raise ValueError(f"codes outside [-2,1]: [{s.min()}, {s.max()}]")
    s = s & 3
    *lead, inn, out = s.shape
    if inn % 4:
        raise ValueError(f"contraction dim {inn} must be a multiple of 4")
    r = s.reshape(*lead, inn // 4, 4, out)
    shifts = (2 * np.arange(4, dtype=np.int64)).reshape(4, 1)
    return (r << shifts).sum(axis=-2).astype(np.uint8)


def unpack_i2_rowquad(qp):
    """(..., in/4, out) uint8 -> (..., in, out) int32 signed 2-bit codes
    (jnp; CPU-safe reference unpack, row 4r+j = bits 2j:2j+1)."""
    qi = qp.astype(jnp.int32)
    *lead, inn4, out = qi.shape
    fields = jnp.stack([((qi >> (2 * j)) & 3) for j in range(4)], axis=-2)
    return (((fields ^ 2) - 2)).reshape(*lead, 4 * inn4, out)


def pack_bc5_signed(codes):
    """Signed 5-bit codes (..., in, out) in [-16, 15] -> (nib, sig):
    nib (..., in/2, out) uint8 row-pair packed s4 nibble plane n,
    sig (..., in/4, out) uint8 row-quad packed i2 sign plane sigma,
    with value = n + 8*sigma. numpy in, numpy out."""
    import numpy as np

    s = np.asarray(codes).astype(np.int32)
    if s.min() < -16 or s.max() > 15:
        raise ValueError(f"codes outside [-16,15]: [{s.min()}, {s.max()}]")
    u = s + 16                      # [0, 31]
    n = (u & 15) - 8                # [-8, 7]
    sigma = (u >> 4) * 2 - 1        # {-1, +1}
    return pack_bc4_signed(n), pack_i2_rowquad(sigma)


def unpack_bc5(nib, sig):
    """(nib, sig) planes -> (..., in, out) int32 signed codes [-16, 15]."""
    return unpack_bc4(nib) + 8 * unpack_i2_rowquad(sig)


def bc5a8_aligned(inn: int, out: int, group: int = 128) -> bool:
    """Same feasibility rule as bc4a8 plus whole sign-plane tiles
    (ITp % 2 == 0 — free, since ITp is a multiple of group/2 >= 16)."""
    return bc4a8_aligned(inn, out, group)


def _bc5a8_accum(nb_ref_tile, sig_tile, xt, d, acc_ref, *, group):
    """Accumulate xt^T . dequant(nib, sig) into acc_ref. nb_ref_tile
    (ITp, OT) u8 row-pair nibbles, sig_tile (ITp/2, OT) u8 row-quad signs,
    xt (2*ITp, TT) s8, d (nb, OT) f32."""
    it, tt = xt.shape
    ot = nb_ref_tile.shape[-1]
    nb = it // group
    n = pltpu.bitcast(nb_ref_tile, jnp.int4).astype(jnp.int8)   # (2*ITp, OT)
    sg = pltpu.bitcast(sig_tile, jnp.int2).astype(jnp.int8)     # (2*ITp, OT)
    dn = (((1,), (1,)), ((0,), (0,)))
    if BC5A8_INTERIOR == "onedot":
        w = n + sg * jnp.int8(8)
        z = jax.lax.dot_general(
            xt.reshape(nb, group, tt), w.reshape(nb, group, ot),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
    else:
        z1 = jax.lax.dot_general(
            xt.reshape(nb, group, tt), n.reshape(nb, group, ot),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        z2 = jax.lax.dot_general(
            xt.reshape(nb, group, tt), sg.reshape(nb, group, ot),
            dimension_numbers=dn, preferred_element_type=jnp.int32)
        z = z1 + (z2 << 3)
    acc_ref[...] += jnp.sum(z.astype(jnp.float32) * d[:, None, :], axis=0)


def _qmm_bc5a8_stacked_kernel(l_ref, xt_ref, q_ref, s_ref, d_ref, o_ref,
                              acc_ref, *, group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _bc5a8_accum(q_ref[0], s_ref[0], xt_ref[...],
                 d_ref[0].astype(jnp.float32), acc_ref, group=group)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group", "out_dtype", "tiles"))
def qmm_bc5a8_stacked(xt, q, s, d, layer, group: int = 128,
                      out_dtype=jnp.float32, tiles=None):
    """Layer-stacked 5-bit bitcast + grouped-integer-dot matmul: xt (in, T)
    int8 activations (quantize_acts_s8, contraction-major), q (L, in/2, out)
    uint8 row-pair nibble plane, s (L, in/4, out) uint8 row-quad sign plane
    (pack_bc5_signed), d (L, in//group, out) per-group scales. Returns
    UNSCALED (T, out) f32 — multiply by the caller's activation scale da."""
    inn, t = xt.shape
    out = q.shape[2]
    inn2 = inn // 2
    if not bc5a8_aligned(inn, out, group):
        raise ValueError(f"bc5a8 kernel needs out % 128 == 0 and a feasible "
                         f"packed-row tile, got (in={inn}, out={out}); use "
                         f"qmm_bc5a8_reference")
    TT, OT, ITp = _i4_tiles(t, inn, out, 1, tiles)
    ITp = _grouped_itp(inn2, max(group // 2, 8), 4 * group, ITp)
    dg = 2 * ITp // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn2 // ITp),
        in_specs=[
            pl.BlockSpec((2 * ITp, TT), lambda r, o, i, l: (i, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp // 2, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_bc5a8_stacked_kernel, group=group,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xt, q, s, d)


def _qmm_bc5a8_stacked_multi_kernel(l_ref, xt_ref, q_ref, s_ref, d_ref,
                                    o_ref, acc_ref, *, group, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    _bc5a8_accum(q_ref[0], s_ref[0], xt_ref[0],
                 d_ref[0].astype(jnp.float32), acc_ref, group=group)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "group", "out_dtype",
                                             "tiles"))
def qmm_bc5a8_stacked_multi(xts, q, s, d, layer, n_parts: int,
                            group: int = 128, out_dtype=jnp.float32,
                            tiles=None):
    """N projections through one bc5a8 pipeline (see qmm_bc4a8_stacked_multi
    for the layout contract; adds the (L, in/4, N*Eo) sign plane)."""
    n, inn, t = xts.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    inn2 = inn // 2
    if not bc5a8_aligned(inn, eo, group):
        raise ValueError(f"bc5a8 multi kernel needs eo % 128 == 0 and a "
                         f"feasible packed-row tile, got (in={inn}, "
                         f"eo={eo}); use qmm_bc5a8_reference")
    TT, OT, ITp = _i4_tiles(t, inn, eo, 1, tiles)
    ITp = _grouped_itp(inn2, max(group // 2, 8), 4 * group, ITp)
    per = eo // OT
    dg = 2 * ITp // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, inn2 // ITp),
        in_specs=[
            pl.BlockSpec((1, 2 * ITp, TT),
                         lambda r, o, i, l, per=per: (o // per, i, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp // 2, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_bc5a8_stacked_multi_kernel, group=group,
                          out_dtype=out_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xts, q, s, d)


def qmm_bc5a8_reference(x, q, s, d, group: int = 128):
    """jnp reference for the bc5a8 path (CPU-safe): unpack both planes,
    quantize activations per-row to s8, grouped int dots, per-group rescale
    of the int32 partial sums."""
    xt, da = quantize_acts_s8(x)
    codes = unpack_bc5(q, s)              # (in, out) int32 signed [-16, 15]
    inn, out = codes.shape[-2], codes.shape[-1]
    nb = inn // group
    z = jax.lax.dot_general(
        xt.astype(jnp.int32).reshape(nb, group, -1),
        codes.reshape(nb, group, out),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    y = jnp.sum(z.astype(jnp.float32) * d.astype(jnp.float32)[:, None, :],
                axis=0)
    return y * da


def qmm_bc4_reference(x, q, d, m=None, group: int = QK):
    """jnp reference for the row-pair bitcast layout (CPU-safe): unpack to
    signed codes, dequant, dense dot. Same math as the kernel."""
    codes = unpack_bc4(q).astype(jnp.float32)
    inn, out = codes.shape[-2], codes.shape[-1]
    nb = inn // group
    w = codes.reshape(nb, group, out) * d.astype(jnp.float32)[:, None, :]
    if m is not None:
        w = w + m.astype(jnp.float32)[:, None, :]
    return jnp.dot(x, w.reshape(inn, out), preferred_element_type=jnp.float32)


def qmm_w4a8_reference(x, q, d, bias: int = 8, group: int = QK):
    """jnp reference for the packed w4a8 grouped path: q (in/2, out) uint8
    half-split packed; same activation quantization and block-partial-sum
    rescale, XLA ops only (CPU-safe)."""
    xt, da = quantize_acts_s8(x)
    codes = unpack_i4(q) - bias           # (in, out) int32
    inn, out = codes.shape[-2], codes.shape[-1]
    nb = inn // group
    z = jax.lax.dot_general(
        xt.astype(jnp.int32).reshape(nb, group, -1),
        codes.reshape(nb, group, out),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )
    y = jnp.sum(z.astype(jnp.float32) * d.astype(jnp.float32)[:, None, :], axis=0)
    return y * da


def qmm_i4_reference(x, q, d, m=None, bias: int = 8, group: int = QK):
    """jnp fallback for packed-int4 weights (CPU / unaligned shapes):
    identical math to the kernels, XLA-fused."""
    codes = unpack_i4(q) - bias                       # (in, out) int32
    inn, out = codes.shape
    w = codes.astype(jnp.float32).reshape(inn // group, group, out) * d[:, None, :]
    if m is not None:
        w = w + m[:, None, :]
    return jnp.dot(x, w.reshape(inn, out), preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

# ---------------------------------------------------------------------------
# Packed 5/6-bit kernels — sub-byte serving for the Q5/Q6 families, so their
# bytes-on-the-bus match the format's bit-width the way ggml's packed vec_dot
# does (Q5_0 = nibbles + a 32-bit high-bit word per block, Q6_K = nibbles + 2
# high bits; type table /root/reference/rwkv_file_format.inc:5-24).
#
# TPU-native layout: the low nibble plane reuses the int4 half-split packing
# (pack_i4) and its two-dot contraction split; the high bits live in a
# separate DENSE bit plane in natural (unpacked) row order —
#   hi_bits=1 (Q5-class): (in/8, out) uint8, byte row r bit k = row 8r+k
#   hi_bits=2 (Q6-class): (in/4, out) uint8, byte row r bits 2k:2k+2 = row 4r+k
# In-kernel expansion is the same broadcast+reshape trick the scale expansion
# uses (each byte replicated across its rows' sublanes) followed by a
# variable shift with a broadcasted_iota shift vector — all uniform i32 VPU
# ops. code = lo_nibble + (hi << 4); value = (code - bias) * d (+ m).
# Bytes/element: 0.625 (Q5) / 0.75 (Q6) vs 1.0 for the int8 'qfast' path.
# ---------------------------------------------------------------------------


def pack_hi_bits(hi, bits: int = 1):
    """High-bit plane (..., in, out) ints in [0, 2**bits) -> packed
    (..., in*bits/8, out) uint8, byte row r field k = row r*(8//bits)+k.
    numpy in, numpy out."""
    import numpy as np

    h = np.asarray(hi).astype(np.int64)
    if h.min() < 0 or h.max() >= (1 << bits):
        raise ValueError(f"hi bits outside [0,{(1 << bits) - 1}]: [{h.min()}, {h.max()}]")
    per = 8 // bits
    *lead, inn, out = h.shape
    if inn % per:
        raise ValueError(f"contraction dim {inn} must be a multiple of {per}")
    r = h.reshape(*lead, inn // per, per, out)
    shifts = (bits * np.arange(per, dtype=np.int64)).reshape(per, 1)
    return (r << shifts).sum(axis=-2).astype(np.uint8)


def unpack_hi_bits(hp, bits: int = 1):
    """(..., in*bits/8, out) uint8 -> (..., in, out) int32 fields (jnp)."""
    per = 8 // bits
    qi = hp.astype(jnp.int32)
    *lead, rb, out = qi.shape
    sh = (bits * jnp.arange(per, dtype=jnp.int32)).reshape(per, 1)
    fields = (qi[..., :, None, :] >> sh) & ((1 << bits) - 1)
    return fields.reshape(*lead, rb * per, out)


def pack_i5(q, bias: int = 0, hi_bits: int = 1):
    """Codes (..., in, out) ints: values+bias must fit [0, 2**(4+hi_bits)).
    Returns (nib, hib): the half-split nibble plane (pack_i4 layout) and the
    packed high-bit plane (pack_hi_bits layout). numpy in, numpy out."""
    import numpy as np

    v = np.asarray(q).astype(np.int32) + bias
    if v.min() < 0 or v.max() >= (1 << (4 + hi_bits)):
        raise ValueError(f"codes+bias outside [0,{(1 << (4 + hi_bits)) - 1}]: "
                         f"[{v.min()}, {v.max()}]")
    return pack_i4(v & 15), pack_hi_bits(v >> 4, bits=hi_bits)


def _hi_expand(h, per: int, bits: int, compute):
    """One packed high-bit tile (rb, OT) uint8 -> (rb*per, OT) fields in the
    compute dtype. Broadcast each byte across its `per` rows' sublanes, then
    shift by (row % per) * bits — a uniform elementwise vector shift."""
    rb, ot = h.shape
    bb = jnp.broadcast_to(h.astype(jnp.int32)[:, None, :], (rb, per, ot))
    bb = bb.reshape(rb * per, ot)
    sh = (jax.lax.broadcasted_iota(jnp.int32, (rb * per, ot), 0) % per) * bits
    return ((bb >> sh) & ((1 << bits) - 1)).astype(compute)


def _i5_weights(q, h_lo, h_hi, dlo, dhi, mlo, mhi, *, with_min, group, bias,
                hi_bits, compute):
    """Unpack one packed-nibble tile + its two high-bit tiles into the
    (w_lo, w_hi) dequantized weight planes."""
    lo, hi = _i4_planes(q, 0, compute)      # nibbles [0,15], bias applied below
    per = 8 // hi_bits
    lo = lo + _hi_expand(h_lo, per, hi_bits, compute) * compute(16) - compute(bias)
    hi = hi + _hi_expand(h_hi, per, hi_bits, compute) * compute(16) - compute(bias)
    if with_min:
        w_lo = lo * _expand_scales(dlo.astype(compute), group) + _expand_scales(mlo.astype(compute), group)
        w_hi = hi * _expand_scales(dhi.astype(compute), group) + _expand_scales(mhi.astype(compute), group)
    else:
        w_lo = lo * _expand_scales(dlo.astype(compute), group)
        w_hi = hi * _expand_scales(dhi.astype(compute), group)
    return w_lo, w_hi


def _i5_tiles(t, inn, out, group, hi_bits, tiles):
    """Like _i4_tiles but the packed-row tile must also split the high-bit
    plane into whole byte rows: ITp % (8//hi_bits * group) == 0 (group is
    already a multiple of 8//hi_bits for every real format)."""
    if tiles is None and t <= 256:
        tiles = DECODE_TILES_I4
    half = inn // 2
    TT = _pick_tile(t, 256) if t > 256 else t
    OT = _pick_tile(out, tiles[0] if tiles else 512)
    want = tiles[1] if tiles else (1024 if t <= 256 else 256)
    # packed-row tile must be a multiple of `group` (scale tiles) — which,
    # group being 16/32, also makes the high-bit plane tile whole byte rows
    # (8//hi_bits = 8 or 4 rows/byte). Largest group-multiple divisor of the
    # half <= want; exists because _check_aligned_i4 pins half % group == 0.
    k = half // group
    ITp = group * max(mdiv for mdiv in range(1, k + 1)
                      if k % mdiv == 0 and (group * mdiv <= want or mdiv == 1))
    return TT, OT, ITp


def _qmm_i5_kernel(x_lo_ref, x_hi_ref, q_ref, hlo_ref, hhi_ref, dlo_ref,
                   dhi_ref, o_ref, acc_ref, *, with_min, group, bias, hi_bits,
                   out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if with_min:
        args = (dlo_ref[:, :, 0], dhi_ref[:, :, 0], dlo_ref[:, :, 1], dhi_ref[:, :, 1])
    else:
        args = (dlo_ref[...], dhi_ref[...], None, None)
    w_lo, w_hi = _i5_weights(q_ref[...], hlo_ref[...], hhi_ref[...], *args,
                             with_min=with_min, group=group, bias=bias,
                             hi_bits=hi_bits, compute=compute)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[...].astype(compute), w_lo, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[...].astype(compute), w_hi, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bias", "group", "hi_bits",
                                             "out_dtype", "tiles", "compute"))
def qmm_i5(x, q, qh, d, m=None, bias: int = 16, group: int = QK,
           hi_bits: int = 1, out_dtype=jnp.float32, tiles=None, compute=None):
    """x: (T, in) f32; q: (in/2, out) uint8 half-split nibbles; qh:
    (in*hi_bits/8, out) uint8 packed high bits; d[, m]: (in//group, out).
    y = x @ ((nib + (hi<<4) - bias) * d (+ m))."""
    compute = I4_COMPUTE if compute is None else compute
    t, inn2 = x.shape[0], q.shape[0]
    inn, out = 2 * inn2, q.shape[1]
    assert x.shape[1] == inn
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i5_tiles(t, inn, out, group, hi_bits, tiles)
    NH = inn2 // ITp
    per = 8 // hi_bits
    ITb = ITp // per          # high-bit plane rows per contraction step
    dg = ITp // group

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_lo = pl.BlockSpec((dg, OT, 2), lambda r, o, i: (i, o, 0), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((dg, OT, 2), lambda r, o, i, NH=NH: (NH + i, o, 0), memory_space=pltpu.VMEM)
    else:
        dm = d
        d_lo = pl.BlockSpec((dg, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((dg, OT), lambda r, o, i, NH=NH: (NH + i, o), memory_space=pltpu.VMEM)

    grid = (t // TT, out // OT, NH)
    return pl.pallas_call(
        functools.partial(_qmm_i5_kernel, with_min=with_min, group=group,
                          bias=bias, hi_bits=hi_bits, out_dtype=out_dtype,
                          compute=compute),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TT, ITp), lambda r, o, i: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, ITp), lambda r, o, i, NH=NH: (r, NH + i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ITp, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((ITb, OT), lambda r, o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((ITb, OT), lambda r, o, i, NH=NH: (NH + i, o), memory_space=pltpu.VMEM),
            d_lo,
            d_hi,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i: (r, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )(x, x, q, qh, qh, dm, dm)


def _qmm_i5_stacked_kernel(l_ref, x_lo_ref, x_hi_ref, q_ref, hlo_ref, hhi_ref,
                           dlo_ref, dhi_ref, o_ref, acc_ref, *, with_min,
                           group, bias, hi_bits, out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if with_min:
        args = (dlo_ref[0, :, :, 0], dhi_ref[0, :, :, 0],
                dlo_ref[0, :, :, 1], dhi_ref[0, :, :, 1])
    else:
        args = (dlo_ref[0], dhi_ref[0], None, None)
    w_lo, w_hi = _i5_weights(q_ref[0], hlo_ref[0], hhi_ref[0], *args,
                             with_min=with_min, group=group, bias=bias,
                             hi_bits=hi_bits, compute=compute)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[...].astype(compute), w_lo, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[...].astype(compute), w_hi, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("bias", "group", "hi_bits",
                                             "out_dtype", "tiles", "compute"))
def qmm_i5_stacked(x, q, qh, d, m, layer, bias: int = 16, group: int = QK,
                   hi_bits: int = 1, out_dtype=jnp.float32, tiles=None,
                   compute=None):
    """Layer-stacked packed 5/6-bit fused dequant-matmul: q (L, in/2, out)
    uint8 nibbles, qh (L, in*hi_bits/8, out) uint8 high bits, d/m
    (L, in//group, out), layer a traced scalar — the decode hot path for
    Q5/Q6-class serving."""
    compute = I4_COMPUTE if compute is None else compute
    t = x.shape[0]
    inn2, out = q.shape[1], q.shape[2]
    inn = 2 * inn2
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i5_tiles(t, inn, out, group, hi_bits, tiles)
    NH = inn2 // ITp
    per = 8 // hi_bits
    ITb = ITp // per
    dg = ITp // group

    with_min = m is not None
    if with_min:
        dm = jnp.stack([d, m], axis=-1)
        d_lo = pl.BlockSpec((1, dg, OT, 2), lambda r, o, i, l: (l[0], i, o, 0), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((1, dg, OT, 2), lambda r, o, i, l, NH=NH: (l[0], NH + i, o, 0), memory_space=pltpu.VMEM)
    else:
        dm = d
        d_lo = pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM)
        d_hi = pl.BlockSpec((1, dg, OT), lambda r, o, i, l, NH=NH: (l[0], NH + i, o), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, NH),
        in_specs=[
            pl.BlockSpec((TT, ITp), lambda r, o, i, l: (r, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TT, ITp), lambda r, o, i, l, NH=NH: (r, NH + i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITb, OT), lambda r, o, i, l: (l[0], i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITb, OT), lambda r, o, i, l, NH=NH: (l[0], NH + i, o), memory_space=pltpu.VMEM),
            d_lo,
            d_hi,
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_i5_stacked_kernel, with_min=with_min, group=group,
                          bias=bias, hi_bits=hi_bits, out_dtype=out_dtype,
                          compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, x, q, qh, qh, dm, dm)


def qmm_i5_reference(x, q, qh, d, m=None, bias: int = 16, group: int = QK,
                     hi_bits: int = 1):
    """jnp fallback for packed 5/6-bit weights (CPU / unaligned shapes)."""
    codes = unpack_i4(q) + (unpack_hi_bits(qh, bits=hi_bits) << 4) - bias
    inn, out = codes.shape[-2:]
    w = codes.astype(jnp.float32).reshape(inn // group, group, out) * d[:, None, :]
    if m is not None:
        w = w + m[:, None, :]
    return jnp.dot(x, w.reshape(inn, out), preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _qmm_i5_stacked_multi_kernel(l_ref, x_lo_ref, x_hi_ref, q_ref, hlo_ref,
                                 hhi_ref, dlo_ref, dhi_ref, o_ref, acc_ref, *,
                                 group, bias, hi_bits, out_dtype, compute):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w_lo, w_hi = _i5_weights(q_ref[0], hlo_ref[0], hhi_ref[0], dlo_ref[0],
                             dhi_ref[0], None, None, with_min=False,
                             group=group, bias=bias, hi_bits=hi_bits,
                             compute=compute)
    dn = (((1,), (0,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[0].astype(compute), w_lo, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[0].astype(compute), w_hi, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    )

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("n_parts", "bias", "group",
                                             "hi_bits", "out_dtype", "tiles",
                                             "compute"))
def qmm_i5_stacked_multi(xs, q, qh, d, layer, n_parts: int, bias: int = 16,
                         group: int = QK, hi_bits: int = 1,
                         out_dtype=jnp.float32, tiles=None, compute=None):
    """N projections through one packed 5/6-bit kernel pipeline: xs
    (N, T, in), q (L, in/2, N*Eo) uint8 nibbles, qh (L, in*hi_bits/8, N*Eo)
    uint8 high bits, d (L, in//group, N*Eo). The output tile's index map
    picks the matching input (same fusion trick as qmm_stacked_multi).
    Returns (T, N*Eo)."""
    compute = I4_COMPUTE if compute is None else compute
    n, t, inn = xs.shape
    out = q.shape[2]
    assert n == n_parts and out % n_parts == 0
    eo = out // n_parts
    _check_aligned_i4(inn, out, group)
    TT, OT, ITp = _i5_tiles(t, inn, eo, group, hi_bits, tiles)  # tiles never span parts
    NH = (inn // 2) // ITp
    per_b = 8 // hi_bits
    ITb = ITp // per_b
    dg = ITp // group
    per = eo // OT

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TT, out // OT, NH),
        in_specs=[
            pl.BlockSpec((1, TT, ITp), lambda r, o, i, l, per=per: (o // per, r, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, ITp), lambda r, o, i, l, per=per, NH=NH: (o // per, r, NH + i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITp, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITb, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ITb, OT), lambda r, o, i, l, NH=NH: (l[0], NH + i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l: (l[0], i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, OT), lambda r, o, i, l, NH=NH: (l[0], NH + i, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TT, OT), lambda r, o, i, l: (r, o),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((TT, OT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_qmm_i5_stacked_multi_kernel, group=group, bias=bias,
                          hi_bits=hi_bits, out_dtype=out_dtype, compute=compute),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, out), out_dtype),
    )(jnp.asarray(layer, jnp.int32).reshape(1), xs, xs, q, qh, qh, d, d)
