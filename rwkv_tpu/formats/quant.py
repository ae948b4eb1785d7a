"""Bit-exact block-quantization codecs for the ggml quant formats used by rwkv.cpp.

Formats: Q4_0, Q4_1, Q5_0, Q5_1, Q8_0 — 32-element blocks, fp16 scale (and fp16
min for the *_1 variants), 5th-bit packing in a little-endian uint32 for Q5.

The encoders replicate ggml's reference row quantizers exactly (same rounding:
truncate-toward-zero after +0.5/+8.5/+16.5 bias for Q4/Q5, round-half-away-from-
zero for Q8_0; scale computed in fp32 and *stored* as fp16, while the inverse
scale used for quantizing keeps fp32 precision). Verified bit-for-bit against
the committed tiny-rwkv Q5_0/Q5_1 fixtures of the reference repo
(reference: rwkv_quantize.inc:149 `ggml_quantize_chunk` use site; block layout
per ggml's block_q4_0/q4_1/q5_0/q5_1/q8_0 structs).

Everything here is pure numpy and operates on the *byte* representation used on
disk, so the file format layer can stream tensors through unchanged.
"""

from __future__ import annotations

import numpy as np

QK = 32  # block size, all formats

# bytes per 32-element block
BLOCK_NBYTES = {
    "Q4_0": 2 + 16,           # fp16 d, 16B nibbles
    "Q4_1": 2 + 2 + 16,       # fp16 d, fp16 m, 16B nibbles
    "Q5_0": 2 + 4 + 16,       # fp16 d, u32 qh, 16B nibbles
    "Q5_1": 2 + 2 + 4 + 16,   # fp16 d, fp16 m, u32 qh, 16B nibbles
    "Q8_0": 2 + 32,           # fp16 d, 32 int8
}

QUANT_FORMATS = tuple(BLOCK_NBYTES.keys())


def _blocks(x: np.ndarray) -> np.ndarray:
    """Reshape a row-major float32 array into (n_blocks, 32)."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    if x.size % QK != 0:
        raise ValueError(f"element count {x.size} not divisible by block size {QK}")
    return x.reshape(-1, QK)


def _signed_absmax(b: np.ndarray) -> np.ndarray:
    """Per block: the value with the largest magnitude, sign preserved.

    ggml scans with `if (amax < fabsf(v))` — strictly greater, first occurrence
    wins; np.argmax on |v| matches that tie-breaking.
    """
    idx = np.argmax(np.abs(b), axis=1)
    return b[np.arange(b.shape[0]), idx]


def _safe_inv(d: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0))
    return inv.astype(np.float32)


def _trunc_bias(v: np.ndarray, bias: float, qmax: int) -> np.ndarray:
    """min(qmax, (int8_t)(v + bias)) — C cast truncates toward zero.

    All callers guarantee v + bias >= 0 up to fp rounding slop, where
    truncation == floor; clip at 0 for safety on the -0.x edge.
    """
    q = np.trunc(v.astype(np.float32) + np.float32(bias))
    return np.clip(q, 0, qmax).astype(np.uint8)


def _round_away(v: np.ndarray) -> np.ndarray:
    """C roundf: round half away from zero (numpy rounds half to even)."""
    return np.trunc(v + np.copysign(np.float32(0.5), v))


def _pack_nibbles(q: np.ndarray) -> np.ndarray:
    """(nb, 32) uint8 values [0,15] -> (nb, 16) bytes; elem j in low nibble,
    elem j+16 in the high nibble of byte j (ggml layout)."""
    lo = q[:, :16]
    hi = q[:, 16:]
    return (lo | (hi << 4)).astype(np.uint8)


def _unpack_nibbles(qs: np.ndarray) -> np.ndarray:
    """(nb, 16) bytes -> (nb, 32) uint8 nibble values in element order."""
    lo = qs & 0x0F
    hi = qs >> 4
    return np.concatenate([lo, hi], axis=1)


def _pack_qh(q: np.ndarray) -> np.ndarray:
    """5th bits of (nb, 32) values [0,31] -> (nb,) uint32: bit j = elem j's bit4
    for j<16, bit j+16 = elem (16+j)'s bit4 (ggml q5 layout: contiguous)."""
    bits = ((q >> 4) & 1).astype(np.uint32)
    shifts = np.arange(QK, dtype=np.uint32)
    return (bits << shifts).sum(axis=1, dtype=np.uint32)


def _unpack_qh(qh: np.ndarray) -> np.ndarray:
    """(nb,) uint32 -> (nb, 32) uint8 of 5th bits in element order."""
    shifts = np.arange(QK, dtype=np.uint32)
    return ((qh[:, None] >> shifts) & 1).astype(np.uint8)


def _f16(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float16)


# ---------------------------------------------------------------------------
# Encoders: float32 array -> raw block bytes (as stored on disk)
# ---------------------------------------------------------------------------

def quantize_q4_0(x: np.ndarray) -> bytes:
    b = _blocks(x)
    smax = _signed_absmax(b)
    d = (smax / np.float32(-8.0)).astype(np.float32)
    q = _trunc_bias(b * _safe_inv(d)[:, None], 8.5, 15)
    nb = b.shape[0]
    out = np.zeros((nb, BLOCK_NBYTES["Q4_0"]), dtype=np.uint8)
    out[:, 0:2] = _f16(d)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 2:18] = _pack_nibbles(q)
    return out.tobytes()


def quantize_q4_1(x: np.ndarray) -> bytes:
    b = _blocks(x)
    mn = b.min(axis=1).astype(np.float32)
    mx = b.max(axis=1).astype(np.float32)
    d = ((mx - mn) / np.float32(15.0)).astype(np.float32)
    q = _trunc_bias((b - mn[:, None]) * _safe_inv(d)[:, None], 0.5, 15)
    nb = b.shape[0]
    out = np.zeros((nb, BLOCK_NBYTES["Q4_1"]), dtype=np.uint8)
    out[:, 0:2] = _f16(d)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(mn)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 4:20] = _pack_nibbles(q)
    return out.tobytes()


def quantize_q5_0(x: np.ndarray) -> bytes:
    b = _blocks(x)
    smax = _signed_absmax(b)
    d = (smax / np.float32(-16.0)).astype(np.float32)
    q = _trunc_bias(b * _safe_inv(d)[:, None], 16.5, 31)
    nb = b.shape[0]
    out = np.zeros((nb, BLOCK_NBYTES["Q5_0"]), dtype=np.uint8)
    out[:, 0:2] = _f16(d)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 2:6] = _pack_qh(q)[:, None].view(np.uint8).reshape(nb, 4)
    out[:, 6:22] = _pack_nibbles(q & 0x0F)
    return out.tobytes()


def quantize_q5_1(x: np.ndarray) -> bytes:
    b = _blocks(x)
    mn = b.min(axis=1).astype(np.float32)
    mx = b.max(axis=1).astype(np.float32)
    d = ((mx - mn) / np.float32(31.0)).astype(np.float32)
    q = _trunc_bias((b - mn[:, None]) * _safe_inv(d)[:, None], 0.5, 31)
    nb = b.shape[0]
    out = np.zeros((nb, BLOCK_NBYTES["Q5_1"]), dtype=np.uint8)
    out[:, 0:2] = _f16(d)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = _f16(mn)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 4:8] = _pack_qh(q)[:, None].view(np.uint8).reshape(nb, 4)
    out[:, 8:24] = _pack_nibbles(q & 0x0F)
    return out.tobytes()


def quantize_q8_0(x: np.ndarray) -> bytes:
    b = _blocks(x)
    amax = np.abs(b).max(axis=1).astype(np.float32)
    d = (amax / np.float32(127.0)).astype(np.float32)
    q = _round_away(b * _safe_inv(d)[:, None]).astype(np.int8)
    nb = b.shape[0]
    out = np.zeros((nb, BLOCK_NBYTES["Q8_0"]), dtype=np.uint8)
    out[:, 0:2] = _f16(d)[:, None].view(np.uint8).reshape(nb, 2)
    out[:, 2:34] = q.view(np.uint8)
    return out.tobytes()


# ---------------------------------------------------------------------------
# Structured decode: raw bytes -> (q_int8, d_f32, m_f32|None)
# (the representation kept in HBM for the fused dequant-matmul kernels)
# ---------------------------------------------------------------------------

def decode_blocks(fmt: str, raw: bytes | np.ndarray):
    """Decode raw block bytes to (q, d, m): integer codes (nb, 32) int8,
    per-block fp32 scale d (nb,), and per-block fp32 min m (nb,) or None.

    Dequantized value:  q * d + (m if m is not None else 0).
    Q4_0/Q5_0 codes already have the -8/-16 bias folded into q.
    """
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray)) else raw.reshape(-1)
    bs = BLOCK_NBYTES[fmt]
    if buf.size % bs != 0:
        raise ValueError(f"{fmt}: byte count {buf.size} not divisible by block size {bs}")
    blk = buf.reshape(-1, bs)
    nb = blk.shape[0]
    d = blk[:, 0:2].copy().view(np.float16).reshape(nb).astype(np.float32)
    if fmt == "Q4_0":
        q = _unpack_nibbles(blk[:, 2:18]).astype(np.int8) - 8
        m = None
    elif fmt == "Q4_1":
        m = blk[:, 2:4].copy().view(np.float16).reshape(nb).astype(np.float32)
        q = _unpack_nibbles(blk[:, 4:20]).astype(np.int8)
    elif fmt == "Q5_0":
        qh = _unpack_qh(blk[:, 2:6].copy().view(np.uint32).reshape(nb))
        q = (_unpack_nibbles(blk[:, 6:22]) | (qh << 4)).astype(np.int8) - 16
        m = None
    elif fmt == "Q5_1":
        m = blk[:, 2:4].copy().view(np.float16).reshape(nb).astype(np.float32)
        qh = _unpack_qh(blk[:, 4:8].copy().view(np.uint32).reshape(nb))
        q = (_unpack_nibbles(blk[:, 8:24]) | (qh << 4)).astype(np.int8)
    elif fmt == "Q8_0":
        q = blk[:, 2:34].copy().view(np.int8)
        m = None
    else:
        raise ValueError(f"unknown quant format {fmt}")
    return q, d, m


def dequantize(fmt: str, raw: bytes | np.ndarray, shape) -> np.ndarray:
    """Raw block bytes -> float32 array of `shape` (row-major), bit-exact vs
    ggml's dequantize_row_* (reference format table rwkv_file_format.inc:28-67).
    K-quant super-block formats dispatch to formats/kquant.py."""
    if fmt.endswith("_K"):
        from rwkv_tpu.formats import kquant

        return kquant.dequantize(fmt, raw, shape)
    q, d, m = decode_blocks(fmt, raw)
    x = q.astype(np.float32) * d[:, None]
    if m is not None:
        x += m[:, None]
    return x.reshape(shape)


def quantize(fmt: str, x: np.ndarray) -> bytes:
    if fmt.endswith("_K"):
        from rwkv_tpu.formats import kquant

        return kquant.quantize(fmt, x)
    return {
        "Q4_0": quantize_q4_0,
        "Q4_1": quantize_q4_1,
        "Q5_0": quantize_q5_0,
        "Q5_1": quantize_q5_1,
        "Q8_0": quantize_q8_0,
    }[fmt](x)


def decode_blocks_grouped(fmt: str, raw):
    """Uniform structured decode across all quant families:
    (q int8 (n//g, g), d f32 (n//g,), m f32 (n//g,)|None, group_size g)."""
    if fmt.endswith("_K"):
        from rwkv_tpu.formats import kquant

        return kquant.decode_blocks(fmt, raw)
    q, d, m = decode_blocks(fmt, raw)
    return q, d, m, QK


def tensor_nbytes(fmt_or_dtype: str, n_elements: int) -> int:
    """Size on disk of a tensor (mirrors rwkv_tensor_nbytes, rwkv_utilities.inc:1-9)."""
    if fmt_or_dtype == "FP32":
        return 4 * n_elements
    if fmt_or_dtype == "FP16":
        return 2 * n_elements
    if fmt_or_dtype.endswith("_K"):
        from rwkv_tpu.formats import kquant

        return kquant.tensor_nbytes(fmt_or_dtype, n_elements)
    if fmt_or_dtype in BLOCK_NBYTES:
        if n_elements % QK != 0:
            raise ValueError(f"{n_elements} elements not divisible by {QK}")
        return (n_elements // QK) * BLOCK_NBYTES[fmt_or_dtype]
    raise ValueError(f"unknown format {fmt_or_dtype}")


# ---------------------------------------------------------------------------
# ggml-parity quantized matmul emulation (CPU oracle path).
#
# ggml does not dequantize weights for mul_mat: it quantizes the fp32
# activations to Q8_0 (for Q4_0/Q5_0/Q8_0 weights) or Q8_1 (for Q4_1/Q5_1)
# and evaluates integer block dot products scaled by fp16 block scales.
# The golden logit-difference oracles in the reference test suite were
# produced by that path, so we reproduce it (vectorized) for parity tests.
# ---------------------------------------------------------------------------

def quantize_activations_q8_0(x: np.ndarray):
    """Rows of x (T, K) -> (q (T, nb, 32) int8, d (T, nb) f32=fp16-rounded)."""
    t, k = x.shape
    b = x.reshape(t, k // QK, QK).astype(np.float32)
    amax = np.abs(b).max(axis=2)
    d = (amax / np.float32(127.0)).astype(np.float32)
    q = _round_away(b * _safe_inv(d)[..., None]).astype(np.int8)
    d16 = d.astype(np.float16).astype(np.float32)  # ggml stores/uses fp16 d
    return q, d16


def quantize_activations_q8_1(x: np.ndarray):
    """Like q8_0 but also returns s = fp16(sum(q) * d) per block (ggml block_q8_1)."""
    t, k = x.shape
    b = x.reshape(t, k // QK, QK).astype(np.float32)
    amax = np.abs(b).max(axis=2)
    d = (amax / np.float32(127.0)).astype(np.float32)
    q = _round_away(b * _safe_inv(d)[..., None]).astype(np.int8)
    s = (q.astype(np.int32).sum(axis=2).astype(np.float32) * d)
    d16 = d.astype(np.float16).astype(np.float32)
    s16 = s.astype(np.float16).astype(np.float32)
    return q, d16, s16
