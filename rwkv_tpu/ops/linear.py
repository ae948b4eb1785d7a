"""Linear (projection) weights and the matmul dispatcher.

A `Linear` is a pytree-registered dataclass holding one of three representations:

  kind='dense'  — w: (in, out) f32/bf16; y = x @ w                (fast path)
  kind='f16'    — w: (in, out) f16; y = f16(x) @ w, f32 accum     (ggml FP16 parity:
                  ggml converts f32 activations to f16 rows before its F16 vec_dot)
  kind='quant'  — q: (out, nb, 32) int8 codes, d/m: (out, nb) f32 block scales/mins.
                  Two evaluation strategies:
                    parity: emulate ggml's integer block-dot with Q8_0/Q8_1
                            activation quantization (the path that produced the
                            reference golden logits; see rwkv_quantize.inc,
                            SURVEY.md §2.2)
                    fast:   fused dequant-matmul (Pallas on TPU; jnp dequant
                            fallback elsewhere)
  kind='qfast'  — q: (in, out) int8 contraction-major codes (1 byte/element),
                  d/m: (in/g, out) f32. Serving representation for 8-bit-class
                  formats; feeds ops/qmm.py's fused kernels.
  kind='q4fast' — q: (in/2, out) uint8 half-split packed nibbles (0.5
                  bytes/element on the HBM bus — the reference's sub-byte
                  story, rwkv_file_format.inc:5-24), d/m: (in/g, out) f32.
                  Serving representation for every format whose codes fit a
                  nibble after bias: Q4_0/Q4_1/Q4_K, Q2_K/Q3_K (group-16
                  scales), on-device 'int4' quantization; feeds ops/qmm.py's
                  qmm_i4* kernels. value = (code - bias)*d (+ m) with bias
                  derived from fmt (i4_bias).
  kind='q5fast'/'q6fast' — q: (in/2, out) uint8 nibble plane as q4fast, plus
                  qh: (in*b/8, out) uint8 packed high bits (b=1 for Q5-class,
                  b=2 for Q6_K) — 0.625 / 0.75 bytes/element. Serving
                  representation for Q5_0/Q5_1/Q5_K/Q6_K; feeds qmm_i5*.
                  value = (nib + (hi<<4) - bias) * d (+ m), spec via i5_spec.

Weights with a leading layer dimension (stacked for lax.scan over layers) work
transparently: scan slices each leaf per layer.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from rwkv_tpu.formats import quant as qcodec

QK = qcodec.QK


@dataclass
class Linear:
    w: Any = None
    q: Any = None
    d: Any = None
    m: Any = None
    # packed high-bit plane for 'q5fast'/'q6fast' (see qmm.py pack_hi_bits);
    # None for every other kind (no pytree leaf when unset)
    qh: Any = None
    kind: str = "dense"   # 'dense' | 'f16' | 'quant'
    fmt: str = ""         # quant format name when kind == 'quant'
    # traced layer index into leading-L stacked arrays (set via at_layer);
    # lets matmul index weights lazily so Pallas kernels can DMA the layer's
    # tiles straight from the stacked HBM array instead of a sliced copy
    layer: Any = None

    @property
    def shape(self):
        """(in, out) logical shape."""
        if self.kind == "quant":
            *_, o, nb, _ = self.q.shape
            return (nb * QK, o)
        if self.kind in ("qfast", "w8a8", "s4fast"):  # q is contraction-major (in, out)
            *_, inn, o = self.q.shape
            return (inn, o)
        if self.kind in ("q4fast", "q5fast", "q6fast", "w4a8g", "q4bc",
                         "bc4a8", "bc5a8"):  # q is (in/2, out) packed nibbles
            *_, inn2, o = self.q.shape
            return (2 * inn2, o)
        return self.w.shape[-2:]


jax.tree_util.register_dataclass(
    Linear,
    data_fields=["w", "q", "d", "m", "qh", "layer"],
    meta_fields=["kind", "fmt"],
)


def at_layer(lin: Linear, idx) -> Linear:
    """View of one layer of a leading-L stacked Linear, indexed lazily at
    matmul time (idx may be a traced scalar, e.g. a lax.scan counter)."""
    return dataclasses.replace(lin, layer=idx)


def _take_layer(a, idx):
    return jax.lax.dynamic_index_in_dim(a, idx, axis=0, keepdims=False)


def group_of(fmt: str) -> int:
    """Sub-block granularity of a quant format's scales (elements per scale)."""
    if fmt.startswith("INT4G") or fmt.startswith("INT5G"):
        # serving-only coarse-group grouped-int-dot variants
        return int(fmt[5:])
    return 16 if fmt in ("Q2_K", "Q3_K", "Q6_K") else 32


# code bias of 4-bit-class formats once packed unsigned: value = (code-bias)*d
# Q2_K ([0,3], per-16 min) and Q3_K ([-4,3], per-16 scale) fit the nibble
# layout too — they serve at 0.5 B/elem through the same q4fast kernels
# instead of qfast's 1.0 (their bit-exact codec codes, just packed tighter)
_I4_BIAS = {"Q4_0": 8, "INT4": 8, "Q4_1": 0, "Q4_K": 0, "Q2_K": 0, "Q3_K": 4}

# 5/6-bit-class formats: (bias, hi_bits, kind). Packed as a half-split nibble
# plane + a dense high-bit plane (qmm.py pack_i5) — 0.625 (Q5) / 0.75 (Q6)
# bytes/element on the HBM bus instead of qfast's 1.0.
_I5_SPEC = {
    "Q5_0": (16, 1, "q5fast"),
    "Q5_1": (0, 1, "q5fast"),
    "Q5_K": (0, 1, "q5fast"),
    "INT5": (16, 1, "q5fast"),
    "Q6_K": (32, 2, "q6fast"),
}


def i4_bias(fmt: str) -> int:
    if fmt.startswith("INT4G"):  # coarse-group w4a8: signed symmetric, bias 8
        return 8
    return _I4_BIAS[fmt]


def i4_packable(fmt: str) -> bool:
    """Formats whose normalized codes fit an unsigned nibble (after bias)."""
    return fmt in _I4_BIAS


# 4-bit-class file formats whose VALUE-codes (value = q*d + m) sit in
# [0, 15] and need the -8 shift into two's-complement s4 (the shift folds
# into the min plane: m' = m + 8d). Every other _I4_BIAS format's codes
# already fit [-8, 7] and pack directly.
_BC4_SHIFT = {"Q4_1": 8, "Q4_K": 8}


def bc4_from_value_codes(q, d, m, fmt: str) -> Linear:
    """Build a bitcast-layout (kind='q4bc') Linear from decoded value-codes:
    q (in, out) ints with value = q*d (+ m), d/m (in/group, out). The
    serving layout for every 4-bit-class FILE format — same bus bytes as
    the half-split q4fast layout, unpacked in-kernel by a free
    pltpu.bitcast instead of the widen/mask/shift/sub VPU chain
    (docs/KERNELS.md, round-4 campaign)."""
    from rwkv_tpu.ops import qmm

    sh = _BC4_SHIFT.get(fmt, 0)
    s = np.asarray(q).astype(np.int32) - sh
    qp = qmm.pack_bc4_signed(s)
    if sh:
        base = np.zeros_like(d) if m is None else np.asarray(m, d.dtype)
        m = np.ascontiguousarray(base + sh * np.asarray(d))
    return Linear(
        q=qp,
        d=np.ascontiguousarray(d),
        m=None if m is None else np.ascontiguousarray(m),
        kind="q4bc",
        fmt=fmt,
    )


def i5_spec(fmt: str):
    """(bias, hi_bits) of a 5/6-bit packable format."""
    bias, hi, _ = _I5_SPEC[fmt]
    return bias, hi


def i5_packable(fmt: str) -> bool:
    """Formats whose normalized codes fit 5/6 unsigned bits (after bias)."""
    return fmt in _I5_SPEC


def fast_dense_dtype(parity: bool):
    """Storage dtype for dense (unquantized) weights. Parity keeps true f32
    (the reference's numerics — and matmul runs those at HIGHEST precision
    for oracle fidelity). Fast mode on TPU stores bf16: half the HBM
    traffic and the one-pass MXU dot; keeping f32 would silently run the
    multi-pass HIGHEST algorithm on the serving path."""
    if not parity and jax.default_backend() == "tpu":
        return jnp.bfloat16
    return np.float32


def from_record(rec, parity: bool, dense_dtype=None) -> Linear:
    """Build a Linear from a file tensor record (2D, numpy shape (out, in))."""
    if dense_dtype is None:
        dense_dtype = fast_dense_dtype(parity)
    if rec.type_name == "FP32":
        w = rec.to_float32().T
        if not parity:
            w = w.astype(np.dtype(dense_dtype))
        return Linear(w=np.ascontiguousarray(w), kind="dense")
    if rec.type_name == "FP16":
        # ggml's effective F16 mul_mat here upconverts to f32 (llamafile sgemm /
        # F16C FMA): the reference FP16 oracles match f32-upcast weights with
        # f32 activations to ~1e-4, while f16-rounded activations drift outside
        # the 5% tolerance on 5v1. So parity == plain f32 matmul on upcast weights.
        w = rec.to_float32().T
        if not parity:
            w = w.astype(np.dtype(dense_dtype))
        return Linear(w=np.ascontiguousarray(w), kind="dense")
    # quantized
    q, d, m, g = qcodec.decode_blocks_grouped(rec.type_name, rec.data)
    out, inn = rec.numpy_shape
    nb = inn // g
    if parity and rec.type_name.endswith("_K"):
        # K-quants have no ggml-int-dot golden oracles in the reference test
        # suite (fixtures are Q5_0/Q5_1 only), and the legacy 'quant' int-dot
        # emulation doesn't model their min terms; parity mode uses exact
        # dequantized weights with a plain f32 matmul
        w = qcodec.dequantize(rec.type_name, rec.data, (out, inn)).T
        return Linear(w=np.ascontiguousarray(w), kind="dense")
    if not parity:
        # fast path: codes stay quantized in HBM, contraction-major (in, out)
        # so ops/qmm.py needs no transposes; matmul runs through the fused
        # dequant-matmul kernels on TPU. 4-bit-class formats pack two codes
        # per byte (half-split nibbles) so the bus traffic matches the
        # format's bit-width — the reference's whole value proposition
        # (Q4_0 smaller AND faster than Q8_0, README.md:25-31).
        fmt = rec.type_name
        if i4_packable(fmt):
            # bitcast layout (q4bc): same 0.5 B/elem, in-kernel unpack is a
            # free reinterpret instead of the half-split VPU chain
            return bc4_from_value_codes(
                q.reshape(out, inn).T,
                d.reshape(out, nb).T,
                None if m is None else m.reshape(out, nb).T,
                fmt,
            )
        if i5_packable(fmt):
            from rwkv_tpu.ops import qmm

            bias, hi = i5_spec(fmt)
            nib, hib = qmm.pack_i5(q.reshape(out, inn).T, bias=bias, hi_bits=hi)
            return Linear(
                q=nib,
                qh=hib,
                d=np.ascontiguousarray(d.reshape(out, nb).T),
                m=None if m is None else np.ascontiguousarray(m.reshape(out, nb).T),
                kind=_I5_SPEC[fmt][2],
                fmt=fmt,
            )
        return Linear(
            q=np.ascontiguousarray(q.reshape(out, inn).T),
            d=np.ascontiguousarray(d.reshape(out, nb).T),
            m=None if m is None else np.ascontiguousarray(m.reshape(out, nb).T),
            kind="qfast",
            fmt=rec.type_name,
        )
    return Linear(
        q=q.reshape(out, nb, QK),
        d=d.reshape(out, nb),
        m=None if m is None else m.reshape(out, nb),
        kind="quant",
        fmt=rec.type_name,
    )


# ---------------------------------------------------------------------------
# ggml-parity activation quantization (jnp, jit-friendly)
# ---------------------------------------------------------------------------

def _round_away(v):
    return jnp.trunc(v + jnp.copysign(jnp.float32(0.5), v))


def _q8_activations(x, want_sum: bool):
    """x (T, K) f32 -> q (T, nb, 32) int32, d (T, nb) f32 [fp16-rounded],
    and s (T, nb) f32 [fp16-rounded d*sum(q)] if want_sum (Q8_1)."""
    t, k = x.shape
    b = x.reshape(t, k // QK, QK)
    amax = jnp.max(jnp.abs(b), axis=2)
    d = amax / jnp.float32(127.0)
    inv = jnp.where(d != 0.0, 1.0 / d, 0.0)
    q = _round_away(b * inv[..., None]).astype(jnp.int32)
    d16 = d.astype(jnp.float16).astype(jnp.float32)
    if not want_sum:
        return q, d16, None
    s = q.sum(axis=2).astype(jnp.float32) * d
    s16 = s.astype(jnp.float16).astype(jnp.float32)
    return q, d16, s16


def _matmul_quant_parity(x, lin: Linear):
    want_sum = lin.fmt in ("Q4_1", "Q5_1")
    qa, da, sa = _q8_activations(x, want_sum)
    qw = lin.q.astype(jnp.int32)
    # precision=HIGHEST: on TPU a DEFAULT einsum would push the (converted)
    # integer code products through one-pass bf16 — an 8-bit mantissa on
    # 16k-magnitude products, corrupting the ggml-parity sums the golden
    # quantized oracles pin. All values here are < 2^24, exactly
    # representable in true f32.
    HI = jax.lax.Precision.HIGHEST
    sumi = jnp.einsum("tnj,onj->ton", qa, qw, precision=HI).astype(jnp.float32)
    y = jnp.einsum("ton,on,tn->to", sumi, lin.d, da, precision=HI)
    if want_sum:
        y = y + jnp.einsum("on,tn->to", lin.m, sa, precision=HI)
    return y


_KERNEL_KINDS = ("qfast", "q4fast", "q5fast", "q6fast", "s4fast", "w4a8g",
                 "q4bc", "bc4a8", "bc5a8")


def _pad_rows_to(t):
    """Sublane row padding for the fused kernels: token-row counts below 8
    are sub-sublane activation tiles the Mosaic lowerings were never
    validated at (B<8 decode, B=1 speculative drafting). The kernels are
    weight-streaming-bound, so padding to one full sublane is free; callers
    slice the rows back off. Returns the padded row count or None."""
    if t < 8 and jax.default_backend() == "tpu":
        return 8
    return None


def matmul(x, lin: Linear):
    """y = x @ W with W logically (in, out); x is (..., in) f32 or bf16
    (bf16 activations, models/forward.py::_act_dtype — the quantized kernels
    and parity int-dot take f32, so those branches upcast)."""
    if lin.kind in ("quant", "qfast", "q4fast", "q5fast", "q6fast", "s4fast",
                    "w4a8g", "w8a8", "q4bc", "bc4a8", "bc5a8"):
        x = x.astype(jnp.float32)
    if x.ndim > 2 and lin.kind in ("quant", "qfast", "q4fast", "q5fast",
                                   "q6fast", "s4fast", "w4a8g", "q4bc",
                                   "bc4a8", "bc5a8"):
        # kernels and the parity int-dot take 2D x; fold leading dims
        lead = x.shape[:-1]
        y = matmul(x.reshape(-1, x.shape[-1]), lin)
        return y.reshape(*lead, y.shape[-1])
    if x.ndim == 2 and lin.kind in _KERNEL_KINDS:
        tp = _pad_rows_to(x.shape[0])
        if tp is not None:
            y = matmul(jnp.pad(x, ((0, tp - x.shape[0]), (0, 0))), lin)
            return y[: x.shape[0]]
    if lin.kind == "dense":
        w = lin.w if lin.layer is None else _take_layer(lin.w, lin.layer)
        if w.dtype == jnp.bfloat16:
            return jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
        # f32 weights mean the caller wants f32 numerics (the reference is
        # strictly-f32 activations); on TPU the DEFAULT matmul precision is
        # one bf16 pass, which breaks the FP32 golden-logit oracles
        # (diff-sum tolerance 0.001) — force the true-f32 algorithm. Speed
        # paths use bf16/quantized weights and are unaffected.
        return jnp.dot(x, w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if lin.kind == "f16":
        w = lin.w if lin.layer is None else _take_layer(lin.w, lin.layer)
        return jnp.dot(x.astype(jnp.float16), w, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if lin.kind == "quant":
        if lin.layer is not None:
            lin = dataclasses.replace(
                lin,
                q=_take_layer(lin.q, lin.layer),
                d=_take_layer(lin.d, lin.layer),
                m=None if lin.m is None else _take_layer(lin.m, lin.layer),
                layer=None,
            )
        return _matmul_quant_parity(x, lin)
    if lin.kind == "w8a8":
        # per-channel int8 weights x dynamically per-token-quantized int8
        # activations, int8 x int8 -> int32 on the MXU, one f32 rescale.
        # Plain XLA ops — the dot fuses with the layer slice. NOTE the
        # measured truth (docs/KERNELS.md): the s8 dot lowers natively but
        # runs at ~1.06x the bf16 FLOP rate on v5e via XLA, not 2x — the
        # value of this mode is halved weight HBM (capacity) with zero
        # dequant pass, not compute throughput.
        w = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        dw = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        da = jnp.maximum(amax, 1e-8) / jnp.float32(127.0)
        qa = jnp.round(x / da).astype(jnp.int8)
        y = jnp.dot(qa, w, preferred_element_type=jnp.int32)
        return y.astype(jnp.float32) * da * dw
    if lin.kind == "qfast":
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        inn, out = lin.shape
        use_kernel = (
            jax.default_backend() == "tpu" and qmm.aligned_for_kernel(inn, out, g)
        )
        if lin.layer is not None:
            if use_kernel:
                return qmm.qmm_stacked(x, lin.q, lin.d, lin.m, lin.layer, group=g)
            return qmm.qmm_reference(
                x, _take_layer(lin.q, lin.layer), _take_layer(lin.d, lin.layer),
                None if lin.m is None else _take_layer(lin.m, lin.layer), group=g,
            )
        if use_kernel:
            return qmm.qmm(x, lin.q, lin.d, lin.m, group=g)
        return qmm.qmm_reference(x, lin.q, lin.d, lin.m, group=g)
    if lin.kind == "s4fast":
        # experimental native-s4 serving layout: q (L, in, out) jnp.int4,
        # signed codes, value = code * d (see qmm.py s4 section)
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        inn, out = lin.q.shape[-2], lin.q.shape[-1]
        if (lin.layer is not None and jax.default_backend() == "tpu"
                and qmm.aligned_for_kernel(inn, out, g)):
            return qmm.qmm_s4_stacked(x, lin.q, lin.d, lin.layer, group=g)
        q = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        d = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        return qmm.qmm_reference(x, q.astype(jnp.int8), d, None, group=g)
    if lin.kind == "w4a8g":
        # grouped integer-dot 4-bit path: s8 activations x packed-nibble
        # codes (widened to s8 in VMEM) on the MXU, exact per-32 scales
        # applied to block partial sums — the f32 per-element dequant pass
        # shrinks to an integer unpack (qmm.py w4a8 section)
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        b = i4_bias(lin.fmt)
        inn, out = lin.shape
        if jax.default_backend() == "tpu" and qmm.aligned_w4a8(inn, out, g):
            xt, da = qmm.quantize_acts_s8(x)
            if lin.layer is not None:
                return qmm.qmm_w4a8_stacked(xt, lin.q, lin.d, lin.layer,
                                            bias=b, group=g) * da
            if lin.q.ndim == 2:
                # unstacked (e.g. the head): a length-1 layer axis is a free
                # reshape, reusing the stacked kernel
                return qmm.qmm_w4a8_stacked(xt, lin.q[None], lin.d[None], 0,
                                            bias=b, group=g) * da
        q = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        d = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        return qmm.qmm_w4a8_reference(x, q, d, bias=b, group=g)
    if lin.kind == "q4fast":
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        b = i4_bias(lin.fmt)
        inn, out = lin.shape
        use_kernel = (
            jax.default_backend() == "tpu" and qmm.aligned_i4(inn, out, g)
        )
        if lin.layer is not None:
            if use_kernel:
                return qmm.qmm_i4_stacked(x, lin.q, lin.d, lin.m, lin.layer,
                                          bias=b, group=g)
            return qmm.qmm_i4_reference(
                x, _take_layer(lin.q, lin.layer), _take_layer(lin.d, lin.layer),
                None if lin.m is None else _take_layer(lin.m, lin.layer),
                bias=b, group=g,
            )
        if use_kernel:
            return qmm.qmm_i4(x, lin.q, lin.d, lin.m, bias=b, group=g)
        return qmm.qmm_i4_reference(x, lin.q, lin.d, lin.m, bias=b, group=g)
    if lin.kind == "bc4a8":
        # bitcast + grouped s8 integer dots: the DMA-bound 4-bit decode path
        # (qmm.py bc4a8 section) — INT4G<group> semantics
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        inn, out = lin.shape
        if jax.default_backend() == "tpu" and qmm.bc4a8_aligned(inn, out, g):
            xt, da = qmm.quantize_acts_s8(x)
            if lin.layer is not None:
                return qmm.qmm_bc4a8_stacked(xt, lin.q, lin.d, lin.layer,
                                             group=g) * da
            if lin.q.ndim == 2:
                return qmm.qmm_bc4a8_stacked(xt, lin.q[None], lin.d[None], 0,
                                             group=g) * da
        q = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        d = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        return qmm.qmm_bc4a8_reference(x, q, d, group=g)
    if lin.kind == "bc5a8":
        # 5-bit bitcast + grouped s8 integer dots: row-pair nibble plane +
        # row-quad i2 sign plane, value = n + 8*sigma (qmm.py bc5a8
        # section) — INT5G<group> semantics, 0.75 B/elem on the bus
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        inn, out = lin.shape
        if jax.default_backend() == "tpu" and qmm.bc5a8_aligned(inn, out, g):
            xt, da = qmm.quantize_acts_s8(x)
            if lin.layer is not None:
                return qmm.qmm_bc5a8_stacked(xt, lin.q, lin.qh, lin.d,
                                             lin.layer, group=g) * da
            if lin.q.ndim == 2:
                return qmm.qmm_bc5a8_stacked(xt, lin.q[None], lin.qh[None],
                                             lin.d[None], 0, group=g) * da
        q = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        qh = lin.qh if lin.layer is None else _take_layer(lin.qh, lin.layer)
        d = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        return qmm.qmm_bc5a8_reference(x, q, qh, d, group=g)
    if lin.kind == "q4bc":
        # bitcast-unpack 4-bit path: row-pair packed signed nibbles, in-VMEM
        # pltpu.bitcast reinterpret + one hardware convert per element
        # (qmm.py bc4 section)
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        inn, out = lin.shape
        if jax.default_backend() == "tpu" and qmm.aligned_i4(inn, out, g):
            if lin.layer is not None:
                return qmm.qmm_bc4_stacked(x, lin.q, lin.d, lin.m, lin.layer,
                                           group=g)
            if lin.q.ndim == 2:
                return qmm.qmm_bc4_stacked(
                    x, lin.q[None], lin.d[None],
                    None if lin.m is None else lin.m[None], 0, group=g)
        q = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        d = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        m = (None if lin.m is None
             else (lin.m if lin.layer is None else _take_layer(lin.m, lin.layer)))
        return qmm.qmm_bc4_reference(x, q, d, m, group=g)
    if lin.kind in ("q5fast", "q6fast"):
        from rwkv_tpu.ops import qmm

        g = group_of(lin.fmt)
        b, hi = i5_spec(lin.fmt)
        inn, out = lin.shape
        use_kernel = (
            jax.default_backend() == "tpu" and qmm.aligned_i4(inn, out, g)
        )
        if lin.layer is not None:
            if use_kernel:
                return qmm.qmm_i5_stacked(x, lin.q, lin.qh, lin.d, lin.m,
                                          lin.layer, bias=b, group=g, hi_bits=hi)
            return qmm.qmm_i5_reference(
                x, _take_layer(lin.q, lin.layer), _take_layer(lin.qh, lin.layer),
                _take_layer(lin.d, lin.layer),
                None if lin.m is None else _take_layer(lin.m, lin.layer),
                bias=b, group=g, hi_bits=hi,
            )
        if use_kernel:
            return qmm.qmm_i5(x, lin.q, lin.qh, lin.d, lin.m, bias=b, group=g,
                              hi_bits=hi)
        return qmm.qmm_i5_reference(x, lin.q, lin.qh, lin.d, lin.m, bias=b,
                                    group=g, hi_bits=hi)
    raise ValueError(f"unknown Linear kind {lin.kind}")


def multi_aligned_for_kernel(lin: Linear, n_parts: int) -> bool:
    """True when a merged Linear tiles cleanly for qmm_stacked_multi /
    qmm_i4_stacked_multi: the overall dims must satisfy the kernel's
    alignment AND each sub-matrix's out-dim must fill whole 128-lane tiles
    (output tiles never span parts)."""
    from rwkv_tpu.ops import qmm

    inn, out = lin.shape
    g = group_of(lin.fmt)
    if out % n_parts or (out // n_parts) % 128:
        return False
    if lin.kind == "w4a8g":
        return qmm.aligned_w4a8(inn, out // n_parts, g)
    if lin.kind == "bc4a8":
        return qmm.bc4a8_aligned(inn, out // n_parts, g)
    if lin.kind == "bc5a8":
        return qmm.bc5a8_aligned(inn, out // n_parts, g)
    if lin.kind in ("q4fast", "q5fast", "q6fast", "q4bc"):
        return qmm.aligned_i4(inn, out, g)
    return qmm.aligned_for_kernel(inn, out, g)


def merge_qfast(lins: list) -> Linear:
    """Concatenate N same-shaped qfast/q4fast Linears (each (L, in, Eo)
    contraction-major; q4fast packs the in axis) along the output axis into
    one (L, in, N*Eo) Linear for qmm_stacked_multi / qmm_i4_stacked_multi —
    one kernel pipeline per layer instead of N. The codes/scales are
    byte-identical to the unmerged ones, so numerics match the
    per-projection kernels exactly."""
    kind = lins[0].kind
    assert all(l.kind == kind and l.m is None for l in lins)
    return Linear(
        q=jnp.concatenate([l.q for l in lins], axis=-1),
        d=jnp.concatenate([l.d for l in lins], axis=-1),
        qh=None if lins[0].qh is None
        else jnp.concatenate([l.qh for l in lins], axis=-1),
        m=None, kind=kind, fmt=lins[0].fmt,
    )


def matmul_multi(xs: list, lin: Linear):
    """N projections with distinct inputs against merged weights: xs a list
    of N arrays (..., in); lin a merged qfast Linear (L-stacked, indexed via
    at_layer). Returns the list of N outputs (..., Eo)."""
    n = len(xs)
    lead = xs[0].shape[:-1]
    x2 = [x.reshape(-1, x.shape[-1]).astype(jnp.float32) for x in xs]
    tp = _pad_rows_to(x2[0].shape[0])
    if tp is not None:
        t = x2[0].shape[0]
        ys = matmul_multi([jnp.pad(x, ((0, tp - t), (0, 0))) for x in x2], lin)
        return [y[:t].reshape(*lead, y.shape[-1]) for y in ys]
    from rwkv_tpu.ops import qmm

    inn, out = lin.shape
    use_kernel = (
        lin.layer is not None
        and jax.default_backend() == "tpu"
        and multi_aligned_for_kernel(lin, n)
    )
    if lin.kind == "q4fast" and use_kernel:
        y = qmm.qmm_i4_stacked_multi(
            jnp.stack(x2), lin.q, lin.d, lin.layer, n,
            bias=i4_bias(lin.fmt), group=group_of(lin.fmt))
    elif lin.kind == "q4bc" and use_kernel:
        y = qmm.qmm_bc4_stacked_multi(
            jnp.stack(x2), lin.q, lin.d, lin.m, lin.layer, n,
            group=group_of(lin.fmt))
    elif lin.kind == "bc4a8" and use_kernel:
        qa = [qmm.quantize_acts_s8(x) for x in x2]
        y = qmm.qmm_bc4a8_stacked_multi(
            jnp.stack([xt for xt, _ in qa]), lin.q, lin.d, lin.layer, n,
            group=group_of(lin.fmt))
        eo = y.shape[-1] // n
        return [(y[..., i * eo:(i + 1) * eo] * qa[i][1]).reshape(*lead, eo)
                for i in range(n)]
    elif lin.kind == "bc5a8" and use_kernel:
        qa = [qmm.quantize_acts_s8(x) for x in x2]
        y = qmm.qmm_bc5a8_stacked_multi(
            jnp.stack([xt for xt, _ in qa]), lin.q, lin.qh, lin.d,
            lin.layer, n, group=group_of(lin.fmt))
        eo = y.shape[-1] // n
        return [(y[..., i * eo:(i + 1) * eo] * qa[i][1]).reshape(*lead, eo)
                for i in range(n)]
    elif lin.kind in ("q5fast", "q6fast") and use_kernel:
        b5, hi5 = i5_spec(lin.fmt)
        y = qmm.qmm_i5_stacked_multi(
            jnp.stack(x2), lin.q, lin.qh, lin.d, lin.layer, n,
            bias=b5, group=group_of(lin.fmt), hi_bits=hi5)
    elif lin.kind == "s4fast" and use_kernel:
        y = qmm.qmm_s4_stacked_multi(
            jnp.stack(x2), lin.q, lin.d, lin.layer, n, group=group_of(lin.fmt))
    elif lin.kind == "qfast" and use_kernel:
        y = qmm.qmm_stacked_multi(
            jnp.stack(x2), lin.q, lin.d, lin.layer, n, group=group_of(lin.fmt))
    elif lin.kind == "w4a8g" and use_kernel:
        # grouped-integer-dot merge: quantize each part's activations once,
        # one kernel pipeline for all N projections, per-part activation
        # scales applied after the split
        qa = [qmm.quantize_acts_s8(x) for x in x2]
        y = qmm.qmm_w4a8_stacked_multi(
            jnp.stack([xt for xt, _ in qa]), lin.q, lin.d, lin.layer, n,
            bias=i4_bias(lin.fmt), group=group_of(lin.fmt))
        eo = y.shape[-1] // n
        return [(y[..., i * eo:(i + 1) * eo] * qa[i][1]).reshape(*lead, eo)
                for i in range(n)]
    else:
        # reference path: per-part slices (identical math)
        q = lin.q if lin.layer is None else _take_layer(lin.q, lin.layer)
        d = lin.d if lin.layer is None else _take_layer(lin.d, lin.layer)
        eo = q.shape[-1] // n
        g = group_of(lin.fmt)
        if lin.kind == "q4fast":
            b = i4_bias(lin.fmt)
            y = jnp.concatenate(
                [qmm.qmm_i4_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                      d[:, i * eo:(i + 1) * eo], bias=b, group=g)
                 for i in range(n)], axis=-1)
        elif lin.kind == "bc4a8":
            y = jnp.concatenate(
                [qmm.qmm_bc4a8_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                         d[:, i * eo:(i + 1) * eo], group=g)
                 for i in range(n)], axis=-1)
        elif lin.kind == "bc5a8":
            qh = lin.qh if lin.layer is None else _take_layer(lin.qh, lin.layer)
            y = jnp.concatenate(
                [qmm.qmm_bc5a8_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                         qh[:, i * eo:(i + 1) * eo],
                                         d[:, i * eo:(i + 1) * eo], group=g)
                 for i in range(n)], axis=-1)
        elif lin.kind == "q4bc":
            m = lin.m if lin.layer is None or lin.m is None else _take_layer(lin.m, lin.layer)
            y = jnp.concatenate(
                [qmm.qmm_bc4_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                       d[:, i * eo:(i + 1) * eo],
                                       None if m is None else m[:, i * eo:(i + 1) * eo],
                                       group=g)
                 for i in range(n)], axis=-1)
        elif lin.kind == "w4a8g":
            y = jnp.concatenate(
                [qmm.qmm_w4a8_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                        d[:, i * eo:(i + 1) * eo],
                                        bias=i4_bias(lin.fmt), group=g)
                 for i in range(n)], axis=-1)
        elif lin.kind in ("q5fast", "q6fast"):
            b, hi = i5_spec(lin.fmt)
            qh = lin.qh if lin.layer is None else _take_layer(lin.qh, lin.layer)
            y = jnp.concatenate(
                [qmm.qmm_i5_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                      qh[:, i * eo:(i + 1) * eo],
                                      d[:, i * eo:(i + 1) * eo], bias=b,
                                      group=g, hi_bits=hi)
                 for i in range(n)], axis=-1)
        else:
            y = jnp.concatenate(
                [qmm.qmm_reference(x2[i], q[:, i * eo:(i + 1) * eo],
                                   d[:, i * eo:(i + 1) * eo], group=g)
                 for i in range(n)], axis=-1)
    eo = y.shape[-1] // n
    return [y[..., i * eo:(i + 1) * eo].reshape(*lead, eo) for i in range(n)]


def stack(lins: list) -> Linear:
    """Stack per-layer Linears into one with a leading layer axis.

    Mixed dtypes across layers (e.g. after a LoRA merge wrote FP32 tensors into
    an FP16 model) are unified by upcasting to dense f32.
    """
    kinds = {l.kind for l in lins}
    fmts = {l.fmt for l in lins}
    packed = {"quant", "qfast", "q4fast", "q5fast", "q6fast", "s4fast",
              "w4a8g", "q4bc", "bc4a8", "bc5a8"}
    if len(kinds) > 1 or (kinds <= packed and len(fmts) > 1):
        dense = [to_dense_f32(l) for l in lins]
        return Linear(w=np.stack([l.w for l in dense]), kind="dense")
    k = lins[0].kind
    if k in packed:
        return Linear(
            q=np.stack([l.q for l in lins]),
            d=np.stack([l.d for l in lins]),
            m=None if lins[0].m is None else np.stack([l.m for l in lins]),
            qh=None if lins[0].qh is None else np.stack([l.qh for l in lins]),
            kind=k,
            fmt=lins[0].fmt,
        )
    return Linear(w=np.stack([l.w for l in lins]), kind=k)


def quantize_dense_device(lin: Linear, group: int = 32) -> Linear:
    """Dense Linear -> int8 qfast Linear, computed on device under jit.

    Symmetric per-`group` absmax scaling (Q8_0-style: q = round(w/d),
    d = absmax/127). This is the on-the-fly serving quantization path: load
    an FP16/FP32 model, quantize weights in HBM once, then every decode step
    moves 1 byte/element + scales instead of 2-4 — decode is HBM-bound, so
    this is a near-proportional speedup (the reference's analogue is offline
    file quantization; on TPU the codes feed ops/qmm.py's fused kernel).
    """
    if lin.kind == "qfast":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) — already contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        # bf16 scales: -6% decode weight traffic vs f32 (codes 1 B/elem +
        # scales 1/16 vs 1/8 B/elem); the kernels cast scales to the compute
        # dtype anyway. Codes are quantized against the bf16-ROUNDED scale so
        # the err <= d/2 round-to-nearest invariant holds for the stored d.
        # Serving-time only — file-loaded Linears keep the codec's exact
        # f32-decoded f16 scales.
        d = (amax / jnp.float32(127.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        q = jnp.clip(jnp.round(b * inv[..., None, :]), -127, 127).astype(jnp.int8)
        return q.reshape(*lead, inn, o), d

    q, d = _q(lin.w)
    return Linear(q=q, d=d, m=None, kind="qfast", fmt="Q8_0")


def quantize_dense_i4_device(lin: Linear, group: int = 32) -> Linear:
    """Dense Linear -> packed 4-bit Linear (kind='q4fast', fmt='INT4'),
    computed on device under jit.

    Symmetric per-`group` absmax scaling: d = absmax/7, code =
    clip(round(w/d), -8, 7) + 8, two codes packed per byte (half-split).
    This is the sub-byte serving mode the reference's Q4 formats embody:
    weights stream at 0.5 bytes/element — ~1.8x less decode HBM traffic
    than int8 (codes+scales 0.625 vs 1.125 B/elem), and decode is
    weight-streaming-bound. Quality sits in the Q4_0/Q4_1 band (round-to-
    nearest, vs ggml Q4_0's truncation — slightly tighter)."""
    if lin.kind == "q4fast":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        # bf16 scales (-10% traffic vs f32); codes quantized against the
        # bf16-rounded scale — see quantize_dense_device
        d = (amax / jnp.float32(7.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        q = jnp.clip(jnp.round(b * inv[..., None, :]), -8, 7) + 8
        q = q.astype(jnp.uint8).reshape(*lead, inn, o)
        lo = q[..., : inn // 2, :]
        hi = q[..., inn // 2 :, :]
        return lo | (hi << 4), d

    q, d = _q(lin.w)
    return Linear(q=q, d=d, m=None, kind="q4fast", fmt="INT4")


def quantize_dense_bc4_device(lin: Linear, group: int = 32) -> Linear:
    """Dense Linear -> bitcast-layout packed 4-bit Linear (kind='q4bc',
    fmt='INT4'). Same codes/scales as quantize_dense_i4_device (identical
    values, identical bus bytes), but row-PAIR packed signed nibbles so the
    kernel unpacks with a free in-VMEM `pltpu.bitcast` + one hardware
    convert instead of the half-split widen/mask/shift/sub VPU chain (the
    measured co-limiter of int4 decode — qmm.py bc4 section)."""
    if lin.kind == "q4bc":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        d = (amax / jnp.float32(7.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        s = jnp.clip(jnp.round(b * inv[..., None, :]), -8, 7)
        s = (s.astype(jnp.int32) & 15).astype(jnp.uint8).reshape(*lead, inn, o)
        lo = s[..., 0::2, :]
        hi = s[..., 1::2, :]
        return lo | (hi << 4), d

    q, d = _q(lin.w)
    return Linear(q=q, d=d, m=None, kind="q4bc", fmt="INT4")


def quantize_dense_bc4a8_device(lin: Linear, group: int = 128) -> Linear:
    """Dense Linear -> bitcast + grouped-integer-dot 4-bit Linear
    (kind='bc4a8', fmt='INT4G<group>'). Row-pair packed signed nibbles (the
    q4bc layout: free in-VMEM bitcast unpack) with per-`group` scales
    applied exactly to s8xs8 int32 partial sums — the DMA-bound 4-bit
    decode path (qmm.py bc4a8 section). Coarse groups (128/256) fill the
    MXU contraction depth; quality = INT4G<group> (a8 activation rounding
    + per-group 4-bit codes, measurable via ppl_sweep)."""
    if lin.kind == "bc4a8":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)
    while group > 32 and lin.w.shape[-2] % group:
        group //= 2
    fmt = "INT4" if group == 32 else f"INT4G{group}"

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        d = (amax / jnp.float32(7.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        s = jnp.clip(jnp.round(b * inv[..., None, :]), -8, 7)
        s = (s.astype(jnp.int32) & 15).astype(jnp.uint8).reshape(*lead, inn, o)
        lo = s[..., 0::2, :]
        hi = s[..., 1::2, :]
        return lo | (hi << 4), d

    q, d = _q(lin.w)
    return Linear(q=q, d=d, m=None, kind="bc4a8", fmt=fmt)


def quantize_dense_bc5a8_device(lin: Linear, group: int = 128) -> Linear:
    """Dense Linear -> 5-bit bitcast + grouped-integer-dot Linear
    (kind='bc5a8', fmt='INT5G<group>'). Signed 5-bit codes
    s = clip(round(w/d), -16, 15), d = absmax/15 per group, split exactly
    as s = n + 8*sigma: n row-pair packed s4 (q, free bitcast unpack),
    sigma in {-1,+1} row-quad packed i2 (qh, free bitcast unpack) — 0.75
    B/elem on the bus with a two-convert VPU interior feeding K=<group>
    s8xs8 MXU dots (qmm.py bc5a8 section). The Q5-class quality point at
    integer-dot speed; the reference's Q5_1 analogue is its quality sweet
    spot (/root/reference/README.md:28)."""
    if lin.kind == "bc5a8":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)
    while group > 32 and lin.w.shape[-2] % group:
        group //= 2
    fmt = f"INT5G{group}"

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        d = (amax / jnp.float32(15.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        s = jnp.clip(jnp.round(b * inv[..., None, :]), -16, 15)
        u = (s + 16).astype(jnp.int32).reshape(*lead, inn, o)  # [0, 31]
        nb_bits = (u & 15) ^ 8            # s4 two's-complement bits of n
        nib = (nb_bits[..., 0::2, :] | (nb_bits[..., 1::2, :] << 4)) \
            .astype(jnp.uint8)
        sg_bits = ((u >> 4) * 2 - 1) & 3  # i2 bits of sigma in {-1,+1}
        r4 = sg_bits.reshape(*lead, inn // 4, 4, o)
        shifts = (2 * jnp.arange(4, dtype=jnp.int32)).reshape(4, 1)
        sig = jnp.sum(r4 << shifts, axis=-2).astype(jnp.uint8)
        return nib, sig, d

    nib, sig, d = _q(lin.w)
    return Linear(q=nib, qh=sig, d=d, m=None, kind="bc5a8", fmt=fmt)


def quantize_dense_i5_device(lin: Linear, group: int = 32) -> Linear:
    """Dense Linear -> packed 5-bit Linear (kind='q5fast', fmt='INT5'),
    computed on device under jit: d = absmax/15, code =
    clip(round(w/d), -16, 15) + 16, nibbles half-split packed + the 5th bits
    in a dense bit plane (qmm.py pack layout). 0.625 bytes/element on the
    bus — the quality/traffic point between int4 (0.5) and int8 (1.0),
    matching the reference's Q5 formats."""
    if lin.kind == "q5fast":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        # bf16 scales; codes quantized against the bf16-rounded scale — see
        # quantize_dense_device
        d = (amax / jnp.float32(15.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        q = jnp.clip(jnp.round(b * inv[..., None, :]), -16, 15) + 16
        q = q.astype(jnp.uint8).reshape(*lead, inn, o)
        lo4 = q & 15
        nib = lo4[..., : inn // 2, :] | (lo4[..., inn // 2 :, :] << 4)
        hi1 = (q >> 4).reshape(*lead, inn // 8, 8, o)
        shifts = jnp.arange(8, dtype=jnp.uint8).reshape(8, 1)
        hib = jnp.sum(hi1 << shifts, axis=-2).astype(jnp.uint8)
        return nib, hib, d

    nib, hib, d = _q(lin.w)
    return Linear(q=nib, qh=hib, d=d, m=None, kind="q5fast", fmt="INT5")


def quantize_dense_w4a8_device(lin: Linear, group: int = 32) -> Linear:
    """Dense Linear -> grouped-integer-dot 4-bit Linear (kind='w4a8g'):
    q (..., in/2, out) uint8 half-split packed nibbles (the q4fast layout,
    bias 8 — 0.5 B/elem on the bus), d (..., in/group, out) bf16 per-group
    scales. d = absmax/7, code = clip(round(w/d), -8, 7). Same weight
    values as the 'int4' mode; the matmul contracts s8-quantized
    activations against the codes (widened to s8 in VMEM) on the MXU with
    exact per-group scales applied to block partial sums (qmm.py w4a8
    section) — activation rounding is the w8a8-class recipe (corr > 0.999
    on trained tiny models)."""
    if lin.kind == "w4a8g":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)
    # coarse groups fall back per-matrix when the contraction dim doesn't
    # hold a whole group (tiny models, odd shapes)
    while group > 32 and lin.w.shape[-2] % group:
        group //= 2
    fmt = "INT4" if group == 32 else f"INT4G{group}"

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out) contraction-major
        *lead, inn, o = w.shape
        b = w.reshape(*lead, inn // group, group, o)
        amax = jnp.max(jnp.abs(b), axis=-2)
        # bf16 scales; codes quantized against the bf16-rounded scale — see
        # quantize_dense_device
        d = (amax / jnp.float32(7.0)).astype(jnp.bfloat16)
        df = d.astype(jnp.float32)
        inv = jnp.where(df > 0, 1.0 / df, 0.0)
        q = jnp.clip(jnp.round(b * inv[..., None, :]), -8, 7)
        qu = (q.reshape(*lead, inn, o) + 8).astype(jnp.uint8)  # [0, 15]
        qp = qu[..., : inn // 2, :] | (qu[..., inn // 2 :, :] << 4)
        return qp, d

    q, d = _q(lin.w)
    return Linear(q=q, d=d, m=None, kind="w4a8g", fmt=fmt)


def quantize_dense_w8a8_device(lin: Linear) -> Linear:
    """Dense Linear -> per-output-channel int8 Linear (kind='w8a8').

    Coarser than the per-32-block 'qfast' codes (one scale per column); the
    matmul runs int8 x int8 -> int32 natively on the MXU with dynamically
    quantized activations. Measured on v5e (docs/KERNELS.md): ~1.06x the
    bf16 FLOP rate — NOT the 2x the int8 pipe nominally offers — so treat
    this as a memory-capacity mode (half the weight bytes, no dequant pass),
    not a compute turbo. Use 'qfast' when weight fidelity matters most (it
    matches the file formats bit-for-bit).
    """
    if lin.kind == "w8a8":
        return lin
    if lin.kind != "dense":
        lin = to_dense_f32(lin)

    @jax.jit
    def _q(w):
        w = w.astype(jnp.float32)  # (..., in, out)
        amax = jnp.max(jnp.abs(w), axis=-2)
        d = amax / jnp.float32(127.0)
        inv = jnp.where(d > 0, 1.0 / d, 0.0)
        q = jnp.round(w * inv[..., None, :]).astype(jnp.int8)
        return q, d

    q, d = _q(lin.w)
    return Linear(q=q, d=d, m=None, kind="w8a8", fmt="W8A8")


def quantize_params_device(params, keys=None, mode: str = "block",
                           consume: bool = False, head=False,
                           merge_rkv: bool = False) -> dict:
    """Quantize a param pytree's projection Linears to int8 on device.

    Mirrors the reference's quantization policy (rwkv_quantize.inc:1-13):
    emb/head and the small low-rank tensors stay dense; the big per-layer
    projections are quantized. head=True additionally quantizes the head
    matmul with the same mode; head='w8a8'/'w4a8'/... picks a DIFFERENT mode
    for the head (the bf16 head is ~30%% of a 1.5B decode step's HBM traffic,
    and the integer-dot modes shrink it without the per-tile dequant pass
    that made the 'block' head a measured 8%% loss at 8 logit rows —
    docs/KERNELS.md "measured dead ends"). The default (head untouched)
    matches the reference policy. `keys` overrides the layer-Linear
    selection.
    mode: 'block' (int8, per-32-block scales, fused dequant kernels), 'int4'
    (packed nibbles, per-32-block scales — half of 'block's weight traffic,
    the sub-byte serving mode), 'int5' (nibbles + a 5th-bit plane, 0.625
    B/elem — the Q5-class quality point), 'w8a8' (per-channel scales,
    native int8 MXU matmuls) or 'w4a8' (s4 codes + per-32 scales, grouped
    integer dots — int4's bus bytes with no in-kernel dequant pass).
    consume=True frees each dense HBM buffer as it is converted — required
    to quantize models whose dense + quantized copies don't fit HBM together
    (e.g. a 7B bf16 model on one 16 GB chip). The input pytree's converted
    leaves become invalid.
    """
    import functools as _ft

    quantizers = {
        "block": quantize_dense_device,
        "int4": quantize_dense_i4_device,
        "int5": quantize_dense_i5_device,
        "w8a8": quantize_dense_w8a8_device,
        "w4a8": quantize_dense_w4a8_device,
        "int4bc": quantize_dense_bc4_device,
        # bitcast + grouped s8 dots, the DMA-bound 4-bit path (group 128/256)
        "w4a8bc": quantize_dense_bc4a8_device,
        "w4a8bc256": _ft.partial(quantize_dense_bc4a8_device, group=256),
        # the Q5-class quality point on the same bitcast/integer-dot path:
        # nibble + i2 sign planes, 0.75 B/elem (qmm.py bc5a8 section)
        "w5a8bc": quantize_dense_bc5a8_device,
        "w5a8bc256": _ft.partial(quantize_dense_bc5a8_device, group=256),
        # coarse-group w4a8 variants: each per-group integer dot contracts
        # K=64/128/256 — filling the MXU's pipelined contraction depth that
        # K=32 group dots leave 4x idle (measured: g=32 w4a8 is SLOWER than
        # the f32-interior int4 kernel; see docs/KERNELS.md)
        "w4a8g64": _ft.partial(quantize_dense_w4a8_device, group=64),
        "w4a8g128": _ft.partial(quantize_dense_w4a8_device, group=128),
        "w4a8g256": _ft.partial(quantize_dense_w4a8_device, group=256),
    }
    quantize_one = quantizers[mode]

    def convert(lin):
        q = quantize_one(lin)
        if consume and q is not lin and lin.kind == "dense" and hasattr(lin.w, "delete"):
            jax.block_until_ready(jax.tree.leaves(q))
            lin.w.delete()
        return q

    out = dict(params)
    layers = dict(params["layers"])
    if keys is None:
        keys = [
            k for k, v in layers.items()
            if isinstance(v, Linear) and k in
            ("att_k", "att_v", "att_r", "att_o", "att_gate", "ffn_k", "ffn_v", "ffn_r")
        ]
    for k in keys:
        layers[k] = convert(layers[k])
    if merge_rkv and mode in ("block", "int4", "int4bc", "int5", "w4a8",
                              "w4a8g64", "w4a8g128", "w4a8g256",
                              "w4a8bc", "w4a8bc256", "w5a8bc", "w5a8bc256"):
        # fuse the r/k/v (+ gate, for v5.2/v6) projections — same in-dim,
        # inputs available at the same point in the layer — into ONE kernel
        # call per layer (qmm_stacked_multi / qmm_i4_stacked_multi),
        # amortizing per-pallas-call pipeline spin-up at decode batch sizes.
        # Single-chip serving only: the TP sharding plan does not split
        # merged weights (they replicate under a mesh).
        names = ["att_r", "att_k", "att_v"]
        if isinstance(layers.get("att_gate"), Linear):
            names.append("att_gate")
        parts = [layers.get(k) for k in names]
        want_kind = {"block": "qfast", "int4": "q4fast", "int4bc": "q4bc",
                     "int5": "q5fast", "w4a8": "w4a8g", "w4a8g64": "w4a8g",
                     "w4a8g128": "w4a8g", "w4a8g256": "w4a8g",
                     "w4a8bc": "bc4a8", "w4a8bc256": "bc4a8",
                     "w5a8bc": "bc5a8", "w5a8bc256": "bc5a8"}[mode]
        if all(isinstance(l, Linear) and l.kind == want_kind and l.m is None
               for l in parts) and len({l.q.shape for l in parts}) == 1:
            # merging is always safe: matmul_multi gates the fused kernel on
            # multi_aligned_for_kernel and otherwise evaluates the merged
            # weights per-part through the reference path (identical math,
            # same cost as unmerged — unaligned dims can't use the
            # per-projection kernels either)
            key = "att_rkvg" if len(names) == 4 else "att_rkv"
            layers[key] = merge_qfast(parts)
            for k in names:
                del layers[k]
    out["layers"] = layers
    if head and isinstance(params.get("head"), Linear):
        from rwkv_tpu.ops import qmm

        hmode = mode if head is True else head
        if hmode not in quantizers:
            raise ValueError(f"unknown head quantize mode {hmode!r}")
        hd = params["head"]
        inn, o = hd.shape
        ok = {
            "block": lambda: qmm.aligned_for_kernel(inn, o, QK),
            "int4": lambda: qmm.aligned_i4(inn, o, QK),
            "int4bc": lambda: qmm.aligned_i4(inn, o, QK),
            "int5": lambda: qmm.aligned_i4(inn, o, QK),
            # the integer-dot modes have shape-agnostic XLA fallbacks that
            # keep weights packed (no per-step dequant materialization), so
            # they are safe to apply at any head shape
            "w8a8": lambda: True,
            "w4a8": lambda: True,
            "w4a8g64": lambda: True,
            "w4a8g128": lambda: True,
            "w4a8g256": lambda: True,
            "w4a8bc": lambda: True,
            "w4a8bc256": lambda: True,
            "w5a8bc": lambda: True,
            "w5a8bc256": lambda: True,
        }[hmode]()
        if ok:
            hq = quantizers[hmode](hd)
            if consume and hq is not hd and hd.kind == "dense" and hasattr(hd.w, "delete"):
                jax.block_until_ready(jax.tree.leaves(hq))
                hd.w.delete()
            out["head"] = hq
    return out


def to_dense_f32(lin: Linear) -> Linear:
    if lin.kind == "dense" and lin.w.dtype == np.float32:
        return lin
    if lin.kind in ("dense", "f16"):
        return Linear(w=np.asarray(lin.w, dtype=np.float32), kind="dense")
    if lin.kind == "w8a8":
        w = np.asarray(lin.q).astype(np.float32) * np.asarray(lin.d, np.float32)[..., None, :]
        return Linear(w=np.ascontiguousarray(w), kind="dense")
    if lin.kind in ("qfast", "q4fast", "q5fast", "q6fast", "s4fast", "w4a8g",
                    "q4bc", "bc4a8", "bc5a8"):
        # q (..., in, out) contraction-major: dequant straight to dense (in, out)
        if lin.kind in ("q4fast", "w4a8g"):
            qp = np.asarray(lin.q).astype(np.int32)
            codes = np.concatenate([qp & 15, qp >> 4], axis=-2) - i4_bias(lin.fmt)
        elif lin.kind in ("q4bc", "bc4a8"):
            qp = np.asarray(lin.q).astype(np.int32)
            lo = ((qp & 15) ^ 8) - 8
            hi = ((qp >> 4) ^ 8) - 8
            *lead_, inn2_, o_ = qp.shape
            codes = np.stack([lo, hi], axis=-2).reshape(*lead_, 2 * inn2_, o_)
        elif lin.kind == "bc5a8":
            from rwkv_tpu.ops import qmm

            codes = np.asarray(qmm.unpack_bc5(np.asarray(lin.q),
                                              np.asarray(lin.qh)))
        elif lin.kind in ("q5fast", "q6fast"):
            from rwkv_tpu.ops import qmm

            bias, hi = i5_spec(lin.fmt)
            qp = np.asarray(lin.q).astype(np.int32)
            nib = np.concatenate([qp & 15, qp >> 4], axis=-2)
            hib = np.asarray(qmm.unpack_hi_bits(np.asarray(lin.qh), bits=hi))
            codes = nib + (hib << 4) - bias
        else:
            codes = np.asarray(lin.q)
        *lead, inn, o = codes.shape
        g = group_of(lin.fmt)
        q = codes.reshape(*lead, inn // g, g, o)
        w = q.astype(np.float32) * np.asarray(lin.d, np.float32)[..., :, None, :]
        if lin.m is not None:
            w = w + np.asarray(lin.m, np.float32)[..., :, None, :]
        return Linear(w=np.ascontiguousarray(w.reshape(*lead, inn, o)), kind="dense")
    q = np.asarray(lin.q)
    w = q.astype(np.float32) * np.asarray(lin.d, np.float32)[..., None]
    if lin.m is not None:
        w = w + np.asarray(lin.m, np.float32)[..., None]
    w = w.reshape(*w.shape[:-3], w.shape[-3], -1)
    return Linear(w=np.ascontiguousarray(np.swapaxes(w, -1, -2)), kind="dense")
