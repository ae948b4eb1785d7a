"""K-quant ("super-block") codecs: Q2_K, Q3_K, Q4_K, Q5_K, Q6_K, Q8_K.

The reference's type table accepts all K-quant formats at load time
(rwkv_file_format.inc:5-24 maps them to ggml types; the Python binding's
QUANTIZED_FORMAT_NAMES additionally offers Q4_K/Q5_K as quantization targets,
rwkv_cpp_shared_library.py:8-16). The actual codecs live in the ggml
submodule, which is not vendored in the reference snapshot; these
implementations follow ggml's public k-quant format spec (256-element
super-blocks, fp16 super-scales, 4/6/8-bit sub-block scales) and replicate
the reference quantizer algorithms (`make_qkx2_quants` / `make_qx_quants` /
`make_q3_quants` grid searches) so the on-disk bytes are interchangeable
with ggml-produced files.

Decoded values are exact per the format definition (integer codes x fp16
scales). Encoder decisions follow ggml's float32 arithmetic IN C ELEMENT
ORDER: all error-metric sums run sequentially (_seq_sum; numpy's pairwise
.sum() flipped grid-search decisions on ~35% of random qkx2 sub-blocks —
measured round 3 against the sequential-C encoder in native/rwkv_native.cpp
before alignment), the candidate-scale grid is evaluated with two f32
roundings like C, and make_qkx2_quants re-quantizes each candidate against
the RUNNING best min exactly as ggml does (an earlier version used the
initial min throughout — a real divergence, not a tie). With those three
aligned, the Python and native C++ encoders produce BYTE-IDENTICAL blocks
for every format on random and adversarial tie-heavy inputs
(tests/test_kquant.py::test_python_native_encoders_byte_identical) — the
measured flip rate between them is zero.

Everything is vectorized numpy over sub-blocks; the nstep grid searches
(15-21 candidate scales) loop in Python but evaluate all blocks at once.

Fixture caveat (round-1 advisor): there are no ggml-produced golden K-quant
fixtures committed — this build environment has no network access and the
reference snapshot does not vendor the ggml submodule, so a byte-level
golden against real ggml output cannot be generated here. Validation is
therefore (a) the Python and native C++ decoders agreeing bit-exactly,
(b) layout self-consistency/round-trip bounds per format, and (c) the spec
transcription above. If you have a llama.cpp/ggml `quantize` binary, run
tests/test_kquant.py::test_against_external_fixture with
RWKV_KQUANT_FIXTURE_DIR pointing at ggml-encoded blocks to close the loop.
"""

from __future__ import annotations

import numpy as np

QK_K = 256  # super-block size, all K-quants
K_SCALE_SIZE = 12

BLOCK_NBYTES = {
    "Q2_K": 16 + 64 + 2 + 2,          # scales[16], qs[QK_K/4], d, dmin = 84
    "Q3_K": 32 + 64 + 12 + 2,         # hmask[QK_K/8], qs[QK_K/4], scales[12], d = 110
    "Q4_K": 2 + 2 + 12 + 128,         # d, dmin, scales[12], qs[QK_K/2] = 144
    "Q5_K": 2 + 2 + 12 + 32 + 128,    # d, dmin, scales[12], qh[QK_K/8], qs[QK_K/2] = 176
    "Q6_K": 128 + 64 + 16 + 2,        # ql[QK_K/2], qh[QK_K/4], scales[16], d = 210
    "Q8_K": 4 + 256 + 32,             # f32 d, qs[QK_K], i16 bsums[QK_K/16] = 292
}

KQUANT_FORMATS = tuple(BLOCK_NBYTES.keys())
# formats valid as FILE quantization targets (Q8_K is an activation-only
# ggml type; ggml_quantize_chunk rejects it as a target, so files never
# contain it — but the codec below encodes AND decodes it for completeness)
ENCODABLE = ("Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K")

GROUP_MAX_EPS = 1e-15


def _nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml nearest_int: round half to even (the 12582912.0f magic trick)."""
    return np.rint(x).astype(np.int32)


def _seq_sum(a: np.ndarray) -> np.ndarray:
    """Sequential (C element-order) f32 summation over the LAST axis.

    ggml's quantizers accumulate error metrics in C loop order; numpy's
    .sum() uses pairwise summation, which differs in final ulps — enough to
    flip grid-search decisions (measured on N(0,0.4) random rows before this
    helper existed: Q4_K 54/64 super-blocks had at least one +-1 code flip
    vs the sequential-order C encoder; Q3_K/Q8_K had zero). All decision
    sums below use this helper so the Python and native C++ encoders are
    byte-identical, and both follow ggml's arithmetic order."""
    a = a.astype(np.float32, copy=False)
    s = a[..., 0].copy()
    for i in range(1, a.shape[-1]):
        s += a[..., i]
    return s


def _f16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float32).astype(np.float16)


def _superblocks(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.size % QK_K != 0:
        raise ValueError(f"element count {x.size} not divisible by {QK_K}")
    return x.reshape(-1, QK_K)


def _blockify(raw, fmt: str) -> np.ndarray:
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray)) else raw.reshape(-1)
    bs = BLOCK_NBYTES[fmt]
    if buf.size % bs != 0:
        raise ValueError(f"{fmt}: byte count {buf.size} not divisible by block size {bs}")
    return buf.reshape(-1, bs)


# ---------------------------------------------------------------------------
# reference quantizer primitives (vectorized over sub-blocks)
# ---------------------------------------------------------------------------

def _make_qkx2_quants(X, W, nmax, rmin, rdelta, nstep, use_mad):
    """ggml make_qkx2_quants, vectorized: X (N, n) values, W (N, n) weights.
    Returns (scale (N,), the_min (N,), L (N, n) uint8)."""
    X = X.astype(np.float32)
    W = W.astype(np.float32)
    mn = np.minimum(X.min(axis=1), np.float32(0.0))
    mx = X.max(axis=1)
    sum_w = _seq_sum(W)
    sum_x = _seq_sum(W * X)

    degenerate = mx == mn
    rng = np.where(degenerate, np.float32(1.0), mx - mn)  # avoid /0; masked later

    iscale = np.float32(nmax) / rng
    scale = np.float32(1.0) / iscale
    L = np.clip(_nearest_int(iscale[:, None] * (X - mn[:, None])), 0, nmax).astype(np.uint8)
    diff = scale[:, None] * L + mn[:, None] - X
    err = np.abs(diff) if use_mad else diff * diff
    best_mad = _seq_sum(W * err)

    cur_min = mn
    for is_ in range(nstep + 1):
        # f32 ARITHMETIC order matters: C computes rmin + rdelta*is in
        # float (two f32 roundings); a single f64->f32 rounding differs in
        # ulps and shifts the candidate grid
        base = np.float32(rmin) + np.float32(rdelta) * np.float32(is_)
        # ggml updates `min` on every improvement and quantizes subsequent
        # candidates AGAINST THE UPDATED MIN (both in the iscale denominator
        # and in x - min) — an earlier version of this function kept the
        # initial min for all steps, diverging from the C encoder on ~1/3 of
        # random sub-blocks
        rng_c = np.where(degenerate, np.float32(1.0), mx - cur_min)
        isc = (base + np.float32(nmax)) / rng_c
        Laux = np.clip(_nearest_int(isc[:, None] * (X - cur_min[:, None])), 0, nmax)
        lf = Laux.astype(np.float32)
        sum_l = _seq_sum(W * lf)
        sum_l2 = _seq_sum(W * lf * lf)
        sum_xl = _seq_sum(W * lf * X)
        D = sum_w * sum_l2 - sum_l * sum_l
        with np.errstate(divide="ignore", invalid="ignore"):
            this_scale = (sum_w * sum_xl - sum_x * sum_l) / D
            this_min = (sum_l2 * sum_x - sum_l * sum_xl) / D
            pos = this_min > 0
            this_min = np.where(pos, np.float32(0.0), this_min)
            alt = np.where(sum_l2 != 0, sum_xl / sum_l2, np.float32(0.0))
            this_scale = np.where(pos, alt, this_scale)
        diff = this_scale[:, None] * lf + this_min[:, None] - X
        err = np.abs(diff) if use_mad else diff * diff
        mad = _seq_sum(W * err)
        improved = (D > 0) & (mad < best_mad)
        L = np.where(improved[:, None], Laux.astype(np.uint8), L)
        best_mad = np.where(improved, mad, best_mad)
        scale = np.where(improved, this_scale.astype(np.float32), scale)
        cur_min = np.where(improved, this_min.astype(np.float32), cur_min)

    scale = np.where(degenerate, np.float32(0.0), scale)
    L = np.where(degenerate[:, None], np.uint8(0), L)
    the_min = np.where(degenerate, -mn, -cur_min).astype(np.float32)
    return scale.astype(np.float32), the_min, L


def _make_qx_quants(X, nmax, rmse_type=1):
    """ggml make_qx_quants (weights=None), vectorized: X (N, n).
    Returns (scale (N,), L (N, n) uint8 biased by +nmax)."""
    X = X.astype(np.float32)
    amax_idx = np.argmax(np.abs(X), axis=1)
    mx = X[np.arange(X.shape[0]), amax_idx]
    amax = np.abs(mx)
    degenerate = amax < GROUP_MAX_EPS
    mx_safe = np.where(degenerate, np.float32(1.0), mx)

    assert rmse_type == 1
    W = X * X  # rmse_type 1 weights

    def eval_iscale(isc):
        Lc = np.clip(_nearest_int(isc[:, None] * X), -nmax, nmax - 1)
        lf = Lc.astype(np.float32)
        sumlx = _seq_sum(W * X * lf)
        suml2 = _seq_sum(W * lf * lf)
        return Lc, sumlx, suml2

    iscale = np.float32(-nmax) / mx_safe
    L, sumlx, suml2 = eval_iscale(iscale)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(suml2 != 0, sumlx / suml2, np.float32(0.0))
    best = scale * sumlx
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        isc = -(np.float32(nmax) + np.float32(0.1) * np.float32(is_)) / mx_safe
        Lc, slx, sl2 = eval_iscale(isc)
        improved = (sl2 > 0) & (slx * slx > best * sl2)
        L = np.where(improved[:, None], Lc, L)
        with np.errstate(divide="ignore", invalid="ignore"):
            ns = np.where(sl2 != 0, slx / sl2, np.float32(0.0))
        scale = np.where(improved, ns, scale)
        best = np.where(improved, ns * slx, best)

    L = (L + nmax).astype(np.uint8)
    scale = np.where(degenerate, np.float32(0.0), scale)
    L = np.where(degenerate[:, None], np.uint8(0), L)  # ggml memsets L on amax~0
    return scale.astype(np.float32), L


def _make_q3_quants(X, nmax, do_rmse=True):
    """ggml make_q3_quants, vectorized: X (N, n). Returns (scale, L uint8 biased +nmax).

    The iterative per-element refinement loop is inherently sequential within a
    block; ggml runs <=5 sweeps of single-element improvements. We replicate the
    sweeps with the same accept test, updating elements one lane at a time
    (vectorized across blocks)."""
    X = X.astype(np.float32)
    n = X.shape[1]
    amax_idx = np.argmax(np.abs(X), axis=1)
    mx = X[np.arange(X.shape[0]), amax_idx]
    amax = np.abs(mx)
    degenerate = amax < GROUP_MAX_EPS
    mx_safe = np.where(degenerate, np.float32(1.0), mx)
    iscale = np.float32(-nmax) / mx_safe

    assert do_rmse
    W = X * X
    L = np.clip(_nearest_int(iscale[:, None] * X), -nmax, nmax - 1).astype(np.float32)
    sumlx = _seq_sum(W * X * L)
    suml2 = _seq_sum(W * L * L)
    for _ in range(5):
        n_changed = np.zeros(X.shape[0], dtype=bool)
        for i in range(n):
            w = W[:, i]
            x = X[:, i]
            slx = sumlx - w * x * L[:, i]
            can = slx > 0
            sl2 = suml2 - w * L[:, i] * L[:, i]
            with np.errstate(divide="ignore", invalid="ignore"):
                new_l = np.clip(_nearest_int(np.where(slx != 0, x * sl2 / slx, 0.0)),
                                -nmax, nmax - 1).astype(np.float32)
            slx2 = slx + w * x * new_l
            sl22 = sl2 + w * new_l * new_l
            accept = (
                can & (new_l != L[:, i]) & (sl22 > 0)
                & (slx2 * slx2 * suml2 > sumlx * sumlx * sl22)
            )
            L[:, i] = np.where(accept, new_l, L[:, i])
            sumlx = np.where(accept, slx2, sumlx)
            suml2 = np.where(accept, sl22, suml2)
            n_changed |= accept
        if not n_changed.any():
            break
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(suml2 != 0, sumlx / suml2, np.float32(0.0))
    Lb = (L.astype(np.int32) + nmax).astype(np.uint8)
    scale = np.where(degenerate, np.float32(0.0), scale).astype(np.float32)
    Lb = np.where(degenerate[:, None], np.uint8(0), Lb)
    return scale, Lb


# ---------------------------------------------------------------------------
# 6-bit scale/min packing for Q4_K / Q5_K (ggml get_scale_min_k4)
# ---------------------------------------------------------------------------

def _pack_scales_k4(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """(nb, 8) 6-bit scales + (nb, 8) 6-bit mins -> (nb, 12) bytes."""
    nb = ls.shape[0]
    out = np.zeros((nb, K_SCALE_SIZE), dtype=np.uint8)
    ls = ls.astype(np.uint8)
    lm = lm.astype(np.uint8)
    for j in range(4):
        out[:, j] = ls[:, j]
        out[:, j + 4] = lm[:, j]
    for j in range(4, 8):
        out[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
        out[:, j - 4] |= (ls[:, j] >> 4) << 6
        out[:, j] |= (lm[:, j] >> 4) << 6
    return out


def _unpack_scales_k4(scales: np.ndarray):
    """(nb, 12) bytes -> ((nb, 8) scales, (nb, 8) mins), 6-bit values."""
    nb = scales.shape[0]
    sc = np.zeros((nb, 8), dtype=np.uint8)
    mn = np.zeros((nb, 8), dtype=np.uint8)
    for j in range(4):
        sc[:, j] = scales[:, j] & 63
        mn[:, j] = scales[:, j + 4] & 63
    for j in range(4, 8):
        sc[:, j] = (scales[:, j + 4] & 0xF) | ((scales[:, j - 4] >> 6) << 4)
        mn[:, j] = (scales[:, j + 4] >> 4) | ((scales[:, j] >> 6) << 4)
    return sc, mn


# ---------------------------------------------------------------------------
# Q4_K
# ---------------------------------------------------------------------------

def _subblock_weights(b8: np.ndarray) -> np.ndarray:
    """ggml Q4_K/Q5_K sub-block weights: av_x + |x| with av_x = sqrt(mean(x^2))."""
    av_x = np.sqrt(_seq_sum(b8 * b8) / np.float32(32.0))
    return av_x[:, :, None] + np.abs(b8)


def quantize_q4_k(x: np.ndarray) -> bytes:
    sb = _superblocks(x)
    nsb = sb.shape[0]
    b8 = sb.reshape(nsb, 8, 32)
    W = _subblock_weights(b8)
    scale, the_min, L = _make_qkx2_quants(
        b8.reshape(-1, 32), W.reshape(-1, 32), 15, -1.0, 0.1, 20, False
    )
    scales = scale.reshape(nsb, 8)
    mins = the_min.reshape(nsb, 8)

    # C accumulates max_scale/max_min via `>` from 0: never negative, and
    # +0.0 (not -0.0) when all candidates are zero — the fp16 sign bit of
    # d/dmin must match byte-for-byte
    max_scale = np.where(scales.max(axis=1) > 0, scales.max(axis=1), np.float32(0.0))
    max_min = np.where(mins.max(axis=1) > 0, mins.max(axis=1), np.float32(0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_scale = np.where(max_scale > 0, np.float32(63.0) / max_scale, np.float32(0.0))
        inv_min = np.where(max_min > 0, np.float32(63.0) / max_min, np.float32(0.0))
    ls = np.minimum(_nearest_int(inv_scale[:, None] * scales), 63).astype(np.uint8)
    lm = np.minimum(_nearest_int(inv_min[:, None] * mins), 63).astype(np.uint8)
    packed_scales = _pack_scales_k4(ls, lm)
    d = _f16(max_scale / np.float32(63.0))
    dmin = _f16(max_min / np.float32(63.0))

    # re-quantize codes against the fp16-rounded super scales
    sc_eff, mn_eff = _unpack_scales_k4(packed_scales)
    d_eff = d.astype(np.float32)[:, None] * sc_eff.astype(np.float32)   # (nsb, 8)
    m_eff = dmin.astype(np.float32)[:, None] * mn_eff.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int((b8 + m_eff[:, :, None]) / d_eff[:, :, None])
    Lq = np.clip(Lq, 0, 15).astype(np.uint8)
    Lq = np.where((d_eff == 0)[:, :, None], L.reshape(nsb, 8, 32), Lq)  # d==0: keep grid L
    Lq = Lq.reshape(nsb, QK_K)

    # pack nibbles: per 64-element chunk, byte l = L[l] | (L[l+32] << 4)
    L64 = Lq.reshape(nsb, 4, 2, 32)
    qs = (L64[:, :, 0, :] | (L64[:, :, 1, :] << 4)).reshape(nsb, 128).astype(np.uint8)

    out = np.zeros((nsb, BLOCK_NBYTES["Q4_K"]), dtype=np.uint8)
    out[:, 0:2] = d[:, None].view(np.uint8).reshape(nsb, 2)
    out[:, 2:4] = dmin[:, None].view(np.uint8).reshape(nsb, 2)
    out[:, 4:16] = packed_scales
    out[:, 16:144] = qs
    return out.tobytes()



def _dequant_via_codes(fmt: str, raw) -> np.ndarray:
    """All dequantizers derive from the structured decode (decode_blocks is
    the single copy of each format's bit-unpacking): y = q*d (+ m) per group."""
    q, d, m, g = decode_blocks(fmt, raw)
    y = q.astype(np.float32) * d[:, None]
    if m is not None:
        y = y + m[:, None]
    return y.reshape(-1, QK_K)


def dequantize_q4_k(raw) -> np.ndarray:
    return _dequant_via_codes("Q4_K", raw)


# ---------------------------------------------------------------------------
# Q5_K
# ---------------------------------------------------------------------------

def quantize_q5_k(x: np.ndarray) -> bytes:
    sb = _superblocks(x)
    nsb = sb.shape[0]
    b8 = sb.reshape(nsb, 8, 32)
    W = _subblock_weights(b8)
    scale, the_min, L = _make_qkx2_quants(
        b8.reshape(-1, 32), W.reshape(-1, 32), 31, -0.5, 0.1, 15, False
    )
    scales = scale.reshape(nsb, 8)
    mins = the_min.reshape(nsb, 8)

    # C accumulates max_scale/max_min via `>` from 0: never negative, and
    # +0.0 (not -0.0) when all candidates are zero — the fp16 sign bit of
    # d/dmin must match byte-for-byte
    max_scale = np.where(scales.max(axis=1) > 0, scales.max(axis=1), np.float32(0.0))
    max_min = np.where(mins.max(axis=1) > 0, mins.max(axis=1), np.float32(0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_scale = np.where(max_scale > 0, np.float32(63.0) / max_scale, np.float32(0.0))
        inv_min = np.where(max_min > 0, np.float32(63.0) / max_min, np.float32(0.0))
    ls = np.minimum(_nearest_int(inv_scale[:, None] * scales), 63).astype(np.uint8)
    lm = np.minimum(_nearest_int(inv_min[:, None] * mins), 63).astype(np.uint8)
    packed_scales = _pack_scales_k4(ls, lm)
    d = _f16(max_scale / np.float32(63.0))
    dmin = _f16(max_min / np.float32(63.0))

    sc_eff, mn_eff = _unpack_scales_k4(packed_scales)
    d_eff = d.astype(np.float32)[:, None] * sc_eff.astype(np.float32)
    m_eff = dmin.astype(np.float32)[:, None] * mn_eff.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int((b8 + m_eff[:, :, None]) / d_eff[:, :, None])
    Lq = np.clip(Lq, 0, 31).astype(np.uint8)
    Lq = np.where((d_eff == 0)[:, :, None], L.reshape(nsb, 8, 32), Lq)
    Lq = Lq.reshape(nsb, QK_K)

    # qh bit j of byte l: per 64-chunk c, elems c*64+l (bit 2c) and c*64+32+l (bit 2c+1)
    L64 = Lq.reshape(nsb, 4, 2, 32)
    hi_bit = (L64 >> 4) & 1                               # (nsb, 4, 2, 32)
    shifts = (2 * np.arange(4)[:, None] + np.arange(2)[None, :]).astype(np.uint8)
    qh = (hi_bit.astype(np.uint8) << shifts[None, :, :, None]).sum(axis=(1, 2)).astype(np.uint8)
    qs = ((L64[:, :, 0, :] & 0xF) | ((L64[:, :, 1, :] & 0xF) << 4)).reshape(nsb, 128)

    out = np.zeros((nsb, BLOCK_NBYTES["Q5_K"]), dtype=np.uint8)
    out[:, 0:2] = d[:, None].view(np.uint8).reshape(nsb, 2)
    out[:, 2:4] = dmin[:, None].view(np.uint8).reshape(nsb, 2)
    out[:, 4:16] = packed_scales
    out[:, 16:48] = qh
    out[:, 48:176] = qs.astype(np.uint8)
    return out.tobytes()


def dequantize_q5_k(raw) -> np.ndarray:
    return _dequant_via_codes("Q5_K", raw)


# ---------------------------------------------------------------------------
# Q6_K
# ---------------------------------------------------------------------------

def quantize_q6_k(x: np.ndarray) -> bytes:
    sb = _superblocks(x)
    nsb = sb.shape[0]
    b16 = sb.reshape(nsb, 16, 16)
    scale, L = _make_qx_quants(b16.reshape(-1, 16), 32, rmse_type=1)
    scales = scale.reshape(nsb, 16)
    L = L.reshape(nsb, 16, 16)

    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nsb), amax_idx]
    max_abs = np.abs(max_scale)
    zero_blk = max_abs < GROUP_MAX_EPS
    max_safe = np.where(zero_blk, np.float32(1.0), max_scale)
    iscale = np.float32(-128.0) / max_safe
    d = _f16(np.float32(1.0) / iscale)
    q_scales = np.minimum(_nearest_int(iscale[:, None] * scales), 127).astype(np.int8)

    d_eff = d.astype(np.float32)[:, None] * q_scales.astype(np.float32)  # (nsb, 16)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int(b16 / d_eff[:, :, None])
    Lq = (np.clip(Lq, -32, 31) + 32).astype(np.uint8)
    Lq = np.where((d_eff == 0)[:, :, None], L, Lq)
    Lq = np.where(zero_blk[:, None, None], np.uint8(0), Lq).reshape(nsb, QK_K)
    d = np.where(zero_blk, np.float16(0), d)
    q_scales = np.where(zero_blk[:, None], np.int8(0), q_scales)

    # pack: per 128-chunk c with quarters a=L[c,0:32],b=[32:64],cq=[64:96],dq=[96:128]
    L128 = Lq.reshape(nsb, 2, 4, 32)
    ql = np.concatenate(
        [
            (L128[:, :, 0, :] & 0xF) | ((L128[:, :, 2, :] & 0xF) << 4),
            (L128[:, :, 1, :] & 0xF) | ((L128[:, :, 3, :] & 0xF) << 4),
        ],
        axis=2,
    ).reshape(nsb, 128).astype(np.uint8)
    qh = (
        (L128[:, :, 0, :] >> 4)
        | ((L128[:, :, 1, :] >> 4) << 2)
        | ((L128[:, :, 2, :] >> 4) << 4)
        | ((L128[:, :, 3, :] >> 4) << 6)
    ).reshape(nsb, 64).astype(np.uint8)

    out = np.zeros((nsb, BLOCK_NBYTES["Q6_K"]), dtype=np.uint8)
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = q_scales.view(np.uint8)
    out[:, 208:210] = d[:, None].view(np.uint8).reshape(nsb, 2)
    return out.tobytes()


def dequantize_q6_k(raw) -> np.ndarray:
    return _dequant_via_codes("Q6_K", raw)


# ---------------------------------------------------------------------------
# Q2_K
# ---------------------------------------------------------------------------

def quantize_q2_k(x: np.ndarray) -> bytes:
    sb = _superblocks(x)
    nsb = sb.shape[0]
    b16 = sb.reshape(nsb, 16, 16)
    W = np.abs(b16)
    scale, the_min, L = _make_qkx2_quants(
        b16.reshape(-1, 16), W.reshape(-1, 16), 3, -0.5, 0.1, 15, True
    )
    scales = scale.reshape(nsb, 16)
    mins = the_min.reshape(nsb, 16)
    L = L.reshape(nsb, 16, 16)

    q4scale = np.float32(15.0)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    sc_q = np.zeros((nsb, 16), dtype=np.uint8)
    d = np.zeros(nsb, dtype=np.float16)
    dmin = np.zeros(nsb, dtype=np.float16)
    pos_s = max_scale > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        isc = np.where(pos_s, q4scale / max_scale, np.float32(0.0))
    sc_q |= np.where(pos_s[:, None], _nearest_int(isc[:, None] * scales), 0).astype(np.uint8)
    d = np.where(pos_s, _f16(max_scale / q4scale), d)
    pos_m = max_min > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        imn = np.where(pos_m, q4scale / max_min, np.float32(0.0))
    sc_q |= (np.where(pos_m[:, None], _nearest_int(imn[:, None] * mins), 0).astype(np.uint8) << 4)
    dmin = np.where(pos_m, _f16(max_min / q4scale), dmin)

    d_eff = d.astype(np.float32)[:, None] * (sc_q & 0xF).astype(np.float32)
    m_eff = dmin.astype(np.float32)[:, None] * (sc_q >> 4).astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int((b16 + m_eff[:, :, None]) / d_eff[:, :, None])
    Lq = np.clip(Lq, 0, 3).astype(np.uint8)
    Lq = np.where((d_eff == 0)[:, :, None], L, Lq).reshape(nsb, QK_K)

    # pack 2-bit: per 128-chunk, byte l = L[l] | L[l+32]<<2 | L[l+64]<<4 | L[l+96]<<6
    L128 = Lq.reshape(nsb, 2, 4, 32)
    qs = (
        L128[:, :, 0, :]
        | (L128[:, :, 1, :] << 2)
        | (L128[:, :, 2, :] << 4)
        | (L128[:, :, 3, :] << 6)
    ).reshape(nsb, 64).astype(np.uint8)

    out = np.zeros((nsb, BLOCK_NBYTES["Q2_K"]), dtype=np.uint8)
    out[:, 0:16] = sc_q
    out[:, 16:80] = qs
    out[:, 80:82] = d[:, None].view(np.uint8).reshape(nsb, 2)
    out[:, 82:84] = dmin[:, None].view(np.uint8).reshape(nsb, 2)
    return out.tobytes()


def dequantize_q2_k(raw) -> np.ndarray:
    return _dequant_via_codes("Q2_K", raw)


# ---------------------------------------------------------------------------
# Q3_K
# ---------------------------------------------------------------------------

def _pack_scales_q3(ls: np.ndarray) -> np.ndarray:
    """(nb, 16) 6-bit scale codes (biased +32) -> (nb, 12) bytes (ggml layout)."""
    nb = ls.shape[0]
    out = np.zeros((nb, 12), dtype=np.uint8)
    lo = (ls & 0xF).astype(np.uint8)
    hi = (ls >> 4).astype(np.uint8)
    for j in range(8):
        out[:, j] = lo[:, j]
    for j in range(8, 16):
        out[:, j - 8] |= lo[:, j] << 4
    for j in range(16):
        out[:, 8 + j % 4] |= hi[:, j] << (2 * (j // 4))
    return out


def _unpack_scales_q3(scales: np.ndarray) -> np.ndarray:
    """(nb, 12) bytes -> (nb, 16) int8 scale values (bias removed)."""
    nb = scales.shape[0]
    sc = np.zeros((nb, 16), dtype=np.uint8)
    for j in range(8):
        sc[:, j] = scales[:, j] & 0xF
    for j in range(8, 16):
        sc[:, j] = scales[:, j - 8] >> 4
    for j in range(16):
        sc[:, j] |= ((scales[:, 8 + j % 4] >> (2 * (j // 4))) & 3) << 4
    return sc.astype(np.int8) - 32


def quantize_q3_k(x: np.ndarray) -> bytes:
    sb = _superblocks(x)
    nsb = sb.shape[0]
    b16 = sb.reshape(nsb, 16, 16)
    scale, L0 = _make_q3_quants(b16.reshape(-1, 16), 4, do_rmse=True)
    scales = scale.reshape(nsb, 16)
    L0 = L0.reshape(nsb, 16, 16)

    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nsb), amax_idx]
    nonzero = max_scale != 0
    max_safe = np.where(nonzero, max_scale, np.float32(1.0))
    iscale = np.float32(-32.0) / max_safe
    ls = (np.clip(_nearest_int(iscale[:, None] * scales), -32, 31) + 32).astype(np.uint8)
    ls = np.where(nonzero[:, None], ls, np.uint8(0))
    packed = _pack_scales_q3(np.where(nonzero[:, None], ls, np.uint8(0)))
    with np.errstate(divide="ignore"):
        d = _f16(np.where(nonzero, np.float32(1.0) / iscale, np.float32(0.0)))

    sc_eff = _unpack_scales_q3(packed).astype(np.float32)
    d_eff = d.astype(np.float32)[:, None] * sc_eff                  # (nsb, 16)
    with np.errstate(divide="ignore", invalid="ignore"):
        Lq = _nearest_int(b16 / d_eff[:, :, None])
    Lq = (np.clip(Lq, -4, 3) + 4).astype(np.uint8)
    Lq = np.where((d_eff == 0)[:, :, None], L0, Lq).reshape(nsb, QK_K)  # keep grid codes

    # hmask: element j sets bit (j // 32) of byte (j % 32) when code > 3
    high = (Lq > 3).astype(np.uint8).reshape(nsb, 8, 32)
    bitpos = np.arange(8, dtype=np.uint8)
    hmask = (high << bitpos[None, :, None]).sum(axis=1).astype(np.uint8)  # (nsb, 32)
    Lq = np.where(Lq > 3, Lq - 4, Lq)

    L128 = Lq.reshape(nsb, 2, 4, 32)
    qs = (
        L128[:, :, 0, :]
        | (L128[:, :, 1, :] << 2)
        | (L128[:, :, 2, :] << 4)
        | (L128[:, :, 3, :] << 6)
    ).reshape(nsb, 64).astype(np.uint8)

    out = np.zeros((nsb, BLOCK_NBYTES["Q3_K"]), dtype=np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = packed
    out[:, 108:110] = d[:, None].view(np.uint8).reshape(nsb, 2)
    return out.tobytes()


def dequantize_q3_k(raw) -> np.ndarray:
    return _dequant_via_codes("Q3_K", raw)


# ---------------------------------------------------------------------------
# Q8_K (activation/intermediate format in ggml — never written to model
# files by ggml_quantize_chunk, but the rwkv_type table accepts it, so both
# directions are implemented here for completeness)
# ---------------------------------------------------------------------------

def dequantize_q8_k(raw) -> np.ndarray:
    return _dequant_via_codes("Q8_K", raw)


def quantize_q8_k(x: np.ndarray) -> bytes:
    """ggml quantize_row_q8_K_ref: per 256-super-block, iscale = -128/signed
    absmax value, q = min(nearest_int(iscale*x), 127), d = 1/iscale, plus
    per-16 block sums of the codes."""
    X = _superblocks(x)                                   # (nsb, 256) f32
    nsb = X.shape[0]
    amax_idx = np.argmax(np.abs(X), axis=1)
    maxv = X[np.arange(nsb), amax_idx]                    # signed value at absmax
    nonzero = np.abs(maxv) > 0
    iscale = np.where(nonzero, -128.0 / np.where(nonzero, maxv, 1.0), 0.0)
    q = np.minimum(_nearest_int(iscale[:, None] * X), 127).astype(np.int8)
    q = np.where(nonzero[:, None], q, 0).astype(np.int8)
    d = np.where(nonzero, 1.0 / np.where(iscale != 0, iscale, 1.0), 0.0).astype(np.float32)
    bsums = q.reshape(nsb, 16, 16).astype(np.int32).sum(axis=2).astype(np.int16)

    out = np.zeros((nsb, BLOCK_NBYTES["Q8_K"]), np.uint8)
    out[:, 0:4] = d[:, None].view(np.uint8).reshape(nsb, 4)
    out[:, 4:260] = q.view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(nsb, 32)
    return out.tobytes()


# ---------------------------------------------------------------------------
# dispatch + structured decode for the fused-matmul path
# ---------------------------------------------------------------------------

_DEQUANT = {
    "Q2_K": dequantize_q2_k,
    "Q3_K": dequantize_q3_k,
    "Q4_K": dequantize_q4_k,
    "Q5_K": dequantize_q5_k,
    "Q6_K": dequantize_q6_k,
    "Q8_K": dequantize_q8_k,
}

_QUANT = {
    "Q2_K": quantize_q2_k,
    "Q3_K": quantize_q3_k,
    "Q4_K": quantize_q4_k,
    "Q5_K": quantize_q5_k,
    "Q6_K": quantize_q6_k,
    "Q8_K": quantize_q8_k,
}


def dequantize(fmt: str, raw, shape) -> np.ndarray:
    return _DEQUANT[fmt](raw).reshape(shape)


def quantize(fmt: str, x: np.ndarray) -> bytes:
    if fmt not in _QUANT:
        raise ValueError(f"{fmt} cannot be used as a quantization target")
    return _QUANT[fmt](x)


def tensor_nbytes(fmt: str, n_elements: int) -> int:
    if n_elements % QK_K != 0:
        raise ValueError(f"{n_elements} elements not divisible by {QK_K}")
    return (n_elements // QK_K) * BLOCK_NBYTES[fmt]


def decode_blocks(fmt: str, raw):
    """Decode to (q int8 (n//g, g), d f32 (n//g,), m f32 (n//g,)|None, g):
    integer codes with per-group scale/min at the format's native sub-block
    granularity g (32 for Q4_K/Q5_K, 16 for Q2_K/Q3_K/Q6_K). Dequantized
    value: q * d + (m or 0) — the layout the fused dequant-matmul consumes."""
    blk = _blockify(raw, fmt)
    nsb = blk.shape[0]
    if fmt == "Q4_K":
        d = blk[:, 0:2].copy().view(np.float16).reshape(nsb).astype(np.float32)
        dmin = blk[:, 2:4].copy().view(np.float16).reshape(nsb).astype(np.float32)
        sc, mn = _unpack_scales_k4(blk[:, 4:16])
        qs = blk[:, 16:144].reshape(nsb, 4, 32)
        q = np.stack([qs & 0xF, qs >> 4], axis=2).reshape(nsb, 8, 32)
        return (
            q.reshape(-1, 32).astype(np.int8),
            (d[:, None] * sc.astype(np.float32)).reshape(-1),
            (-dmin[:, None] * mn.astype(np.float32)).reshape(-1),
            32,
        )
    if fmt == "Q5_K":
        d = blk[:, 0:2].copy().view(np.float16).reshape(nsb).astype(np.float32)
        dmin = blk[:, 2:4].copy().view(np.float16).reshape(nsb).astype(np.float32)
        sc, mn = _unpack_scales_k4(blk[:, 4:16])
        qh = blk[:, 16:48]
        qs = blk[:, 48:176].reshape(nsb, 4, 32)
        shifts = (2 * np.arange(4)[:, None] + np.arange(2)[None, :]).astype(np.uint8)
        hbits = (qh[:, None, None, :] >> shifts[None, :, :, None]) & 1
        q = (np.stack([qs & 0xF, qs >> 4], axis=2) | (hbits << 4)).reshape(nsb, 8, 32)
        return (
            q.reshape(-1, 32).astype(np.int8),
            (d[:, None] * sc.astype(np.float32)).reshape(-1),
            (-dmin[:, None] * mn.astype(np.float32)).reshape(-1),
            32,
        )
    if fmt == "Q6_K":
        ql = blk[:, 0:128].reshape(nsb, 2, 2, 32)
        qh = blk[:, 128:192].reshape(nsb, 2, 32)
        sc = blk[:, 192:208].copy().view(np.int8).astype(np.float32)
        d = blk[:, 208:210].copy().view(np.float16).reshape(nsb).astype(np.float32)
        q1 = (ql[:, :, 0, :] & 0xF) | (((qh >> 0) & 3) << 4)
        q2 = (ql[:, :, 1, :] & 0xF) | (((qh >> 2) & 3) << 4)
        q3 = (ql[:, :, 0, :] >> 4) | (((qh >> 4) & 3) << 4)
        q4 = (ql[:, :, 1, :] >> 4) | (((qh >> 6) & 3) << 4)
        q = (np.stack([q1, q2, q3, q4], axis=2).astype(np.int32) - 32).reshape(nsb, 16, 16)
        return (
            q.reshape(-1, 16).astype(np.int8),
            (d[:, None] * sc).reshape(-1),
            None,
            16,
        )
    if fmt == "Q2_K":
        sc_q = blk[:, 0:16]
        qs = blk[:, 16:80].reshape(nsb, 2, 32)
        d = blk[:, 80:82].copy().view(np.float16).reshape(nsb).astype(np.float32)
        dmin = blk[:, 82:84].copy().view(np.float16).reshape(nsb).astype(np.float32)
        shifts = np.arange(4, dtype=np.uint8) * 2
        q = ((qs[:, :, None, :] >> shifts[None, None, :, None]) & 3).reshape(nsb, 16, 16)
        return (
            q.reshape(-1, 16).astype(np.int8),
            (d[:, None] * (sc_q & 0xF).astype(np.float32)).reshape(-1),
            (-dmin[:, None] * (sc_q >> 4).astype(np.float32)).reshape(-1),
            16,
        )
    if fmt == "Q3_K":
        hmask = blk[:, 0:32]
        qs = blk[:, 32:96].reshape(nsb, 2, 32)
        sc = _unpack_scales_q3(blk[:, 96:108]).astype(np.float32)
        d = blk[:, 108:110].copy().view(np.float16).reshape(nsb).astype(np.float32)
        shifts = np.arange(4, dtype=np.uint8) * 2
        q = ((qs[:, :, None, :] >> shifts[None, None, :, None]) & 3).astype(np.int32)
        bitpos = np.arange(8, dtype=np.uint8)
        hi = ((hmask[:, None, :] >> bitpos[None, :, None]) & 1).astype(np.int32)
        q = (q.reshape(nsb, 8, 32) - np.where(hi != 0, 0, 4)).reshape(nsb, 16, 16)
        return (
            q.reshape(-1, 16).astype(np.int8),
            (d[:, None] * sc).reshape(-1),
            None,
            16,
        )
    if fmt == "Q8_K":
        d = blk[:, 0:4].copy().view(np.float32).reshape(nsb)
        q = blk[:, 4:260].copy().view(np.int8)
        return (
            q.reshape(-1, 32),
            np.repeat(d, 8),
            None,
            32,
        )
    raise ValueError(f"unknown K-quant format {fmt}")
