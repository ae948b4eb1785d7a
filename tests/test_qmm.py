"""Fused dequant-matmul kernel: interpret-mode Pallas vs jnp reference vs
exact dense dequantization, all quant formats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

# This module validates kernel MATH in interpret mode, which on the real
# chip (RWKV_TPU_TESTS=1) round-trips every internal op over the device
# relay — minutes per test, and force_tpu_interpret_mode can hang outright
# on the axon backend. The golden matrix + test_pallas_kernels' compiled
# @tpu_only variants cover the on-chip lowering.
pytestmark = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode math tests run on CPU; compiled variants cover TPU",
)

from rwkv_tpu.formats import quant as qc
from rwkv_tpu.ops import qmm
from rwkv_tpu.ops.linear import Linear, from_record, i4_bias, matmul, to_dense_f32
from rwkv_tpu.formats.container import make_record

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("fmt", qc.QUANT_FORMATS)
@pytest.mark.parametrize("t", [1, 8])
def test_qmm_matches_dense_dequant(fmt, t):
    out, inn = 128, 512
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    rec = make_record("w", w, fmt)
    lin = from_record(rec, parity=False)
    # every format serves at its own bit-width: 4-bit packs 2 codes/byte
    # (bitcast row-pair layout since round 4), 5-bit nibbles + a bit plane,
    # 8-bit as int8 codes
    expect_kind = {"Q4_0": "q4bc", "Q4_1": "q4bc", "Q5_0": "q5fast",
                   "Q5_1": "q5fast", "Q8_0": "qfast"}[fmt]
    assert lin.kind == expect_kind
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))

    # ground truth: exact dequantized dense matmul
    dense = to_dense_f32(lin)
    y_ref = np.asarray(x) @ np.asarray(dense.w)

    q = jnp.asarray(lin.q)
    d = jnp.asarray(lin.d)
    m = None if lin.m is None else jnp.asarray(lin.m)
    if lin.kind == "q4bc":
        y_jnp = qmm.qmm_bc4_reference(x, q, d, m)
        np.testing.assert_allclose(y_jnp, y_ref, atol=1e-4, rtol=1e-5)
        with pltpu.force_tpu_interpret_mode():
            y_pl = qmm.qmm_bc4_stacked(x, q[None], d[None],
                                       None if m is None else m[None], 0)
    elif lin.kind == "q5fast":
        from rwkv_tpu.ops.linear import i5_spec

        b, hi = i5_spec(fmt)
        qh = jnp.asarray(lin.qh)
        y_jnp = qmm.qmm_i5_reference(x, q, qh, d, m, bias=b, hi_bits=hi)
        np.testing.assert_allclose(y_jnp, y_ref, atol=1e-4, rtol=1e-5)
        with pltpu.force_tpu_interpret_mode():
            y_pl = qmm.qmm_i5(x, q, qh, d, m, bias=b, hi_bits=hi,
                              compute=jnp.float32)
    else:
        y_jnp = qmm.qmm_reference(x, q, d, m)
        np.testing.assert_allclose(y_jnp, y_ref, atol=1e-4, rtol=1e-5)
        with pltpu.force_tpu_interpret_mode():
            y_pl = qmm.qmm(x, q, d, m)
    np.testing.assert_allclose(y_pl, y_ref, atol=1e-4, rtol=1e-5)


def test_qfast_matmul_dispatch():
    """matmul() on a qfast Linear routes through qmm_reference off-TPU."""
    out, inn = 64, 128
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    lin = from_record(make_record("w", w, "Q8_0"), parity=False)
    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
    y = matmul(x, lin)
    y_ref = np.asarray(x) @ np.asarray(to_dense_f32(lin).w)
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-5)


def test_qfast_full_model_matches_parity_quality():
    """A quantized model in fast mode must produce logits close to the
    parity path (the remaining delta is ggml's activation-quantized dot)."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from tests.common import PROMPT, expected_logits, fixture, logit_diff_sum

    expected = expected_logits("5v2-730K")
    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-Q5_1.bin"), parity=False)
    # Q5_1 serves sub-byte: nibble plane + bit plane (q5fast)
    assert prm["layers"]["att_k"].kind == "q5fast"
    st = F.init_state(cfg)
    logits, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    # committed Q5_1 oracle sum is +48.07; weights-only dequant lands near it
    ds = logit_diff_sum(logits, expected)
    assert abs(ds) <= 48.068733 * 1.10, ds


@pytest.mark.parametrize("g,with_min", [(32, False), (16, False), (16, True)])
def test_qmm_stacked_matches_per_layer(g, with_min):
    """The scalar-prefetch layer-stacked kernel (the int8 decode hot path)
    must select the right layer's tiles and match the unstacked kernel, for
    both 32- and 16-element scale groups. (All 2-6-bit formats now pack to
    q4fast/q5fast/q6fast and are covered by the packed tests below; the
    qfast kernels keep serving Q8_0 plus synthetic/group-16 layouts.)"""
    L, out, inn = 3, 128, 512
    q = jnp.asarray(RNG.integers(-127, 128, size=(L, inn, out)).astype(np.int8))
    d = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01)
    m = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01) if with_min else None
    x = jnp.asarray(RNG.standard_normal((8, inn)).astype(np.float32))

    for layer in range(L):
        y_ref = qmm.qmm_reference(
            x, q[layer], d[layer], None if m is None else m[layer], group=g,
        )
        with pltpu.force_tpu_interpret_mode():
            y_st = qmm.qmm_stacked(x, q, d, m, jnp.int32(layer), group=g)
        np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("with_min", [False, True])
def test_qmm_group16_kernel(with_min):
    """The int8 Pallas kernel with 16-element scale groups. (Q2_K/Q3_K used
    to serve through this path; they now pack to q4fast — synthetic group-16
    codes keep the int8 kernel's g=16 regime covered.)"""
    out, inn, g = 128, 512, 16
    q = jnp.asarray(RNG.integers(-63, 64, size=(inn, out)).astype(np.int8))
    d = jnp.asarray(RNG.standard_normal((inn // g, out)).astype(np.float32) * 0.01)
    m = jnp.asarray(RNG.standard_normal((inn // g, out)).astype(np.float32) * 0.01) if with_min else None
    x = jnp.asarray(RNG.standard_normal((8, inn)).astype(np.float32))
    y_ref = qmm.qmm_reference(x, q, d, m, group=g)
    with pltpu.force_tpu_interpret_mode():
        y_pl = qmm.qmm(x, q, d, m, group=g)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("fmt", ["Q2_K", "Q3_K"])
def test_q2_q3_from_record_packs(fmt):
    """Q2_K/Q3_K codes fit a signed nibble, so they serve sub-byte too:
    from_record gives q4bc (0.5 B/elem, group-16 scales, bitcast layout)
    whose matmul matches exact dequantization."""
    from rwkv_tpu.formats import quant as qc_
    from rwkv_tpu.ops.linear import group_of

    out, inn = 128, 512
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    rec = make_record("w", w, fmt)
    lin = from_record(rec, parity=False)
    assert lin.kind == "q4bc" and group_of(fmt) == 16
    assert (lin.m is not None) == (fmt == "Q2_K")
    assert lin.q.size == inn * out // 2
    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
    y = matmul(x, lin)
    dense = np.asarray(qc_.dequantize(fmt, rec.data, (out, inn))).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ dense,
                               atol=1e-4, rtol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        y_pl = qmm.qmm_bc4_stacked(
            x, jnp.asarray(lin.q)[None], jnp.asarray(lin.d)[None],
            None if lin.m is None else jnp.asarray(lin.m)[None], 0, group=16)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(x) @ dense,
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Packed int4 ("half-split nibbles") kernels — the sub-byte serving path
# ---------------------------------------------------------------------------

def test_q4k_from_record_packs():
    """Q4_K (4-bit codes + per-32 min) also serves packed: from_record gives
    q4bc with the -8 code shift folded into the min plane (m' = m + 8d), and
    the packed matmul matches exact dequantization."""
    out, inn = 128, 512
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    lin = from_record(make_record("w", w, "Q4_K"), parity=False)
    assert lin.kind == "q4bc" and lin.m is not None
    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
    y = matmul(x, lin)
    y_ref = np.asarray(x) @ np.asarray(to_dense_f32(lin).w)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        y_pl = qmm.qmm_bc4_stacked(x, jnp.asarray(lin.q)[None],
                                   jnp.asarray(lin.d)[None],
                                   jnp.asarray(lin.m)[None], 0)
    np.testing.assert_allclose(np.asarray(y_pl), y_ref, atol=1e-4, rtol=1e-4)


def test_pack_unpack_i4_roundtrip():
    inn, out = 64, 8
    codes = RNG.integers(-8, 8, size=(inn, out)).astype(np.int8)
    packed = qmm.pack_i4(codes, bias=8)
    assert packed.shape == (inn // 2, out) and packed.dtype == np.uint8
    back = np.asarray(qmm.unpack_i4(jnp.asarray(packed))) - 8
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("with_min", [False, True])
@pytest.mark.parametrize("tiles", [None, (128, 256)])
def test_qmm_i4_kernel_matches_reference(with_min, tiles):
    """Packed kernel (interpret mode) vs the jnp unpack reference, incl. a
    multi-step contraction grid (tiles=(128,256) gives NH=2 accumulation)."""
    inn, out, t = 1024, 256, 8
    codes = RNG.integers(0, 16, size=(inn, out)).astype(np.uint8)
    packed = jnp.asarray(codes[: inn // 2] | (codes[inn // 2 :] << 4))
    d = jnp.asarray(RNG.standard_normal((inn // 32, out)).astype(np.float32) * 0.01)
    m = jnp.asarray(RNG.standard_normal((inn // 32, out)).astype(np.float32) * 0.01) if with_min else None
    bias = 0 if with_min else 8
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))

    y_ref = qmm.qmm_i4_reference(x, packed, d, m, bias=bias)
    with pltpu.force_tpu_interpret_mode():
        y_pl = qmm.qmm_i4(x, packed, d, m, bias=bias, tiles=tiles, compute=jnp.float32)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("with_min", [False, True])
def test_qmm_i4_stacked_matches_per_layer(with_min):
    """Scalar-prefetch layer-stacked packed kernel (the int4 decode hot
    path) must select the right layer's tiles."""
    L, inn, out, t = 3, 512, 128, 4
    codes = RNG.integers(0, 16, size=(L, inn, out)).astype(np.uint8)
    packed = jnp.asarray(codes[:, : inn // 2] | (codes[:, inn // 2 :] << 4))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    m = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01) if with_min else None
    bias = 0 if with_min else 8
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))

    for layer in range(L):
        y_ref = qmm.qmm_i4_reference(
            x, packed[layer], d[layer], None if m is None else m[layer], bias=bias)
        with pltpu.force_tpu_interpret_mode():
            y_st = qmm.qmm_i4_stacked(x, packed, d, m, jnp.int32(layer), bias=bias, compute=jnp.float32)
        np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)


def test_qmm_i4_stacked_multi_matches_parts():
    """Merged N-projection packed kernel: each part's output must equal its
    standalone packed matmul with that part's own input."""
    L, inn, eo, n, t = 2, 512, 128, 3, 4
    codes = RNG.integers(0, 16, size=(L, inn, n * eo)).astype(np.uint8)
    packed = jnp.asarray(codes[:, : inn // 2] | (codes[:, inn // 2 :] << 4))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, n * eo)).astype(np.float32) * 0.01)
    xs = jnp.asarray(RNG.standard_normal((n, t, inn)).astype(np.float32))

    for layer in range(L):
        with pltpu.force_tpu_interpret_mode():
            y = qmm.qmm_i4_stacked_multi(xs, packed, d, jnp.int32(layer), n, bias=8, compute=jnp.float32)
        for i in range(n):
            y_ref = qmm.qmm_i4_reference(
                xs[i], packed[layer, :, i * eo:(i + 1) * eo],
                d[layer, :, i * eo:(i + 1) * eo], bias=8)
            np.testing.assert_allclose(np.asarray(y[:, i * eo:(i + 1) * eo]),
                                       np.asarray(y_ref), atol=1e-4, rtol=1e-4)


def test_quantize_dense_i4_device_and_dispatch():
    """On-device int4 quantization: codes reconstruct the dense weights to
    4-bit accuracy and matmul() dispatches through the packed path."""
    from rwkv_tpu.ops.linear import quantize_dense_i4_device

    inn, out = 512, 128
    w = RNG.standard_normal((inn, out)).astype(np.float32) * 0.1
    lin = Linear(w=jnp.asarray(w), kind="dense")
    q4 = quantize_dense_i4_device(lin)
    assert q4.kind == "q4fast" and q4.fmt == "INT4"
    assert q4.q.shape == (inn // 2, out) and q4.q.dtype == jnp.uint8

    w_hat = np.asarray(to_dense_f32(q4).w)
    # 4-bit round-to-nearest against the stored (bf16-rounded) scale:
    # |err| <= d_bf16/2 <= (absmax/14) * (1 + 2^-8)
    blocks = w.reshape(inn // 32, 32, out)
    dmax = np.abs(blocks).max(axis=1) / 7.0
    err = np.abs((w_hat - w).reshape(inn // 32, 32, out))
    assert (err <= dmax[:, None, :] * 0.5 * (1 + 1 / 256) + 1e-7).all()

    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
    y = matmul(x, q4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) @ w_hat,
                               atol=1e-4, rtol=1e-4)


def test_quantize_params_int4_merge_and_forward():
    """mode='int4' with merge_rkv on a real tiny model: merged q4fast rkv
    projections flow through matmul_multi's reference path off-TPU, and the
    logits stay close to the dense fast path."""
    import jax
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))

    q4 = quantize_params_device(prm, mode="int4", merge_rkv=True)
    kinds = {k: v.kind for k, v in q4["layers"].items()
             if hasattr(v, "kind")}
    assert any(v == "q4fast" for v in kinds.values()), kinds
    logits_q4, _ = F.forward(q4, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q4))[0, 1]
    # 4-bit band: looser than int8's 0.999 (the per-matmul tests above pin
    # exactness of the packed math; this checks end-to-end quality scale)
    assert c > 0.98, c


def test_quantize_params_int5_merge_and_forward():
    """mode='int5' with merge_rkv: merged q5fast rkv projections (nibble +
    bit planes concatenated) flow through matmul_multi's reference path
    off-TPU and match the UNMERGED int5 logits exactly (merging never
    changes the codes, only the kernel batching)."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    q5 = quantize_params_device(prm, mode="int5")
    logits_q5, _ = F.forward(q5, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))

    q5m = quantize_params_device(prm, mode="int5", merge_rkv=True)
    merged = [v for v in q5m["layers"].values()
              if hasattr(v, "kind") and v.kind == "q5fast" and v.qh is not None
              and v.q.shape[-1] > q5["layers"]["att_k"].q.shape[-1]]
    assert merged, "no merged q5fast Linear produced"
    logits_q5m, _ = F.forward(q5m, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(logits_q5m), np.asarray(logits_q5),
                               atol=1e-5, rtol=1e-5)


def test_qmm_i4_bf16_interior_default():
    """The default serving interior (I4_COMPUTE=bf16) tracks the exact f32
    reference within bf16 tolerance: the MXU dot is bf16 either way, the
    only extra rounding is on scales/codes before the multiply."""
    inn, out, t = 1024, 256, 8
    codes = RNG.integers(0, 16, size=(inn, out)).astype(np.uint8)
    packed = jnp.asarray(codes[: inn // 2] | (codes[inn // 2 :] << 4))
    d = jnp.asarray(RNG.standard_normal((inn // 32, out)).astype(np.float32) * 0.01)
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    y_ref = np.asarray(qmm.qmm_i4_reference(x, packed, d, bias=8))
    with pltpu.force_tpu_interpret_mode():
        y_bf = np.asarray(qmm.qmm_i4(x, packed, d, bias=8))
    scale = np.abs(y_ref).mean() + 1e-6
    assert np.max(np.abs(y_bf - y_ref)) / scale < 0.05


@pytest.mark.slow
def test_autotuner_smoke():
    """The decode-tile autotuner sweeps candidates at model level, ranks
    them, and applies the winner to the module knob (restores on apply=False)."""
    from rwkv_tpu.ops import autotune, qmm

    prev = qmm.DECODE_TILES_I4
    res = autotune.autotune_decode_tiles(
        mode="int4", n_embed=512, n_layer=2, batch=2, steps=2, reps=1,
        candidates=[None, (128, 256)], apply=False, verbose=False)
    assert len(res) == 2 and res[0][1] >= res[1][1]
    assert qmm.DECODE_TILES_I4 == prev


def test_qmm_s4_stacked_interpret():
    """Native-s4 kernels (q stored jnp.int4, signed codes, value = code * d)
    match the packed-nibble reference exactly — same codes, same scales."""
    inn, out, t, L = 1024, 256, 8, 2
    codes = RNG.integers(0, 16, size=(L, inn, out)).astype(np.int8)
    packed = jnp.asarray(qmm.pack_i4(codes))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    ref = np.asarray(qmm.qmm_i4_reference(x, packed[1], d[1], bias=8))

    s4 = jnp.asarray(codes.astype(np.int32) - 8, dtype=jnp.int4)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.qmm_s4_stacked(x, s4, d, 1))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    # multi: 3 projections share the pipeline; each slice must equal the
    # single-projection result
    xs = jnp.asarray(np.stack([np.asarray(x)] * 3))
    q3 = jnp.concatenate([s4] * 3, axis=-1)
    d3 = jnp.concatenate([d] * 3, axis=-1)
    with pltpu.force_tpu_interpret_mode():
        y3 = np.asarray(qmm.qmm_s4_stacked_multi(xs, q3, d3, 1, 3))
    for i in range(3):
        np.testing.assert_allclose(y3[:, i * out:(i + 1) * out], ref,
                                   rtol=1e-5, atol=1e-5)


def test_qmm_i4_unpack_domains_interpret():
    """Every unpack domain of the half-split kernel (i32 / i16) produces the
    same values (u8 is kept for future Mosaic support and skipped here)."""
    inn, out, t, L = 1024, 256, 8, 2
    codes = RNG.integers(0, 16, size=(L, inn, out)).astype(np.int8)
    packed = jnp.asarray(qmm.pack_i4(codes))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    ref = np.asarray(qmm.qmm_i4_reference(x, packed[1], d[1], bias=8))

    prev = qmm.I4_UNPACK
    try:
        for dom in ("i32", "i16"):
            qmm.I4_UNPACK = dom
            with pltpu.force_tpu_interpret_mode():
                y = np.asarray(qmm.qmm_i4_stacked(
                    x, packed, d, None, 1, compute=jnp.float32))
            np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5,
                                       err_msg=dom)
    finally:
        qmm.I4_UNPACK = prev


def test_s4fast_linear_dispatch():
    """kind='s4fast' Linears evaluate through matmul on every backend (jnp
    reference fallback off-TPU) and match the q4fast path."""
    from rwkv_tpu.ops.linear import Linear, at_layer, matmul

    inn, out, L = 256, 128, 2
    codes = RNG.integers(0, 16, size=(L, inn, out)).astype(np.int8)
    packed = jnp.asarray(qmm.pack_i4(codes))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))

    l4 = Linear(q=packed, d=d, kind="q4fast", fmt="INT4")
    s4 = Linear(q=jnp.asarray(codes.astype(np.int32) - 8, dtype=jnp.int4),
                d=d, kind="s4fast", fmt="INT4")
    assert s4.shape == l4.shape == (inn, out)
    y4 = np.asarray(matmul(x, at_layer(l4, 1)))
    ys = np.asarray(matmul(x, at_layer(s4, 1)))
    np.testing.assert_allclose(ys, y4, rtol=1e-5, atol=1e-5)


def test_qmm_w4a8_grouped_interpret():
    """Grouped integer-dot kernel (w4a8g): s8 activations x packed-nibble
    codes with exact per-32 scales on block partial sums. Kernel must match
    the jnp reference bit-close; the reference must track exact dense within
    the a8 activation-rounding band."""
    inn, out, t, L = 1024, 256, 8, 2
    codes = RNG.integers(-8, 8, size=(L, inn, out)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    packed = jnp.asarray(qmm.pack_i4(codes, bias=8))  # (L, in/2, out) uint8

    w = codes[1].astype(np.float32) * np.repeat(np.asarray(d)[1], 32, axis=0)
    y_exact = np.asarray(x) @ w
    y_ref = np.asarray(qmm.qmm_w4a8_reference(x, packed[1], d[1]))
    scale = np.abs(y_exact).mean() + 1e-9
    assert np.abs(y_ref - y_exact).max() / scale < 0.05  # a8 rounding band

    xt, da = qmm.quantize_acts_s8(x)
    with pltpu.force_tpu_interpret_mode():
        y_k = np.asarray(qmm.qmm_w4a8_stacked(xt, packed, d, 1)) * np.asarray(da)
    np.testing.assert_allclose(y_k, y_ref, rtol=1e-5, atol=1e-5)


def test_w4a8g_linear_dispatch():
    from rwkv_tpu.ops.linear import Linear, at_layer, matmul

    inn, out, L = 256, 128, 2
    codes = RNG.integers(-8, 8, size=(L, inn, out)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_i4(codes, bias=8))
    lin = Linear(q=packed, d=d, kind="w4a8g", fmt="INT4")
    assert lin.shape == (inn, out)
    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
    y = np.asarray(matmul(x, at_layer(lin, 1)))
    ref = np.asarray(qmm.qmm_w4a8_reference(x, packed[1], d[1]))
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_qmm_w4a8_stacked_multi_matches_parts():
    """Merged grouped-integer-dot kernel: each slice of the fused N-projection
    output (rescaled by its part's activation scale) must equal that part's
    single-projection w4a8 result."""
    inn, eo, t, L, n = 512, 128, 8, 2, 3
    codes = RNG.integers(-8, 8, size=(L, inn, n * eo)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, n * eo)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_i4(codes, bias=8))
    xs = jnp.asarray(RNG.standard_normal((n, t, inn)).astype(np.float32))

    qa = [qmm.quantize_acts_s8(xs[i]) for i in range(n)]
    with pltpu.force_tpu_interpret_mode():
        for layer in range(L):
            y = np.asarray(qmm.qmm_w4a8_stacked_multi(
                jnp.stack([xt for xt, _ in qa]), packed, d, jnp.int32(layer), n))
            for i in range(n):
                part = y[:, i * eo:(i + 1) * eo] * np.asarray(qa[i][1])
                ref = np.asarray(qmm.qmm_w4a8_stacked(
                    qa[i][0], packed[:, :, i * eo:(i + 1) * eo],
                    d[:, :, i * eo:(i + 1) * eo], jnp.int32(layer))
                ) * np.asarray(qa[i][1])
                np.testing.assert_allclose(part, ref, rtol=1e-5, atol=1e-5)


def test_qmm_bc4_interpret_and_minfold():
    """Bitcast-layout int4 kernels (q4bc): row-pair packed signed nibbles,
    in-kernel pltpu.bitcast unpack. Kernel must match the reference unpack
    exactly; the folded min offset m' = (8-bias)*d + m must reproduce
    min-bias (Q4_1-class) semantics."""
    inn, out, t, L = 1024, 256, 8, 2
    codes = RNG.integers(0, 16, size=(L, inn, out))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_bc4(codes, bias=8))
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))

    w = (codes[1].astype(np.float32) - 8) * np.repeat(np.asarray(d)[1], 32, axis=0)
    y_exact = np.asarray(x) @ w
    ref = np.asarray(qmm.qmm_bc4_reference(x, packed[1], d[1]))
    np.testing.assert_allclose(ref, y_exact, rtol=1e-4, atol=1e-4)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.qmm_bc4_stacked(x, packed, d, None, 1))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)

    # min fold: value = code*d + m (bias 0) == s*d + (8d + m)
    m0 = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.005)
    mp = 8.0 * d + m0
    w1 = codes[1].astype(np.float32) * np.repeat(np.asarray(d)[1], 32, axis=0) \
        + np.repeat(np.asarray(m0)[1], 32, axis=0)
    y1_exact = np.asarray(x) @ w1
    with pltpu.force_tpu_interpret_mode():
        y1 = np.asarray(qmm.qmm_bc4_stacked(x, packed, d, mp, 1))
    np.testing.assert_allclose(y1, y1_exact, rtol=1e-4, atol=1e-4)


def test_qmm_bc4_stacked_multi_matches_parts():
    inn, eo, t, L, n = 512, 128, 8, 2, 3
    codes = RNG.integers(0, 16, size=(L, inn, n * eo))
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, n * eo)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_bc4(codes, bias=8))
    xs = jnp.asarray(RNG.standard_normal((n, t, inn)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        for layer in range(L):
            y = np.asarray(qmm.qmm_bc4_stacked_multi(
                xs, packed, d, None, jnp.int32(layer), n))
            for i in range(n):
                ref = np.asarray(qmm.qmm_bc4_reference(
                    xs[i], packed[layer, :, i * eo:(i + 1) * eo],
                    d[layer, :, i * eo:(i + 1) * eo]))
                np.testing.assert_allclose(y[:, i * eo:(i + 1) * eo], ref,
                                           rtol=1e-5, atol=1e-5)


def test_quantize_params_int4bc_forward_matches_int4():
    """mode='int4bc' produces the SAME weight values as mode='int4' (same
    codes/scales, different packing) — forward logits must agree to f32
    tolerance, and q4bc Linears must dispatch through the reference path
    off-TPU."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    q4, _ = F.forward(quantize_params_device(prm, mode="int4"), cfg,
                      jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    qbc_params = quantize_params_device(prm, mode="int4bc")
    kinds = {v.kind for v in qbc_params["layers"].values() if hasattr(v, "kind")}
    assert "q4bc" in kinds, kinds
    qbc, _ = F.forward(qbc_params, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(qbc), np.asarray(q4), rtol=2e-5, atol=2e-5)

    # merged rkv path
    qbcm_params = quantize_params_device(prm, mode="int4bc", merge_rkv=True)
    qbcm, _ = F.forward(qbcm_params, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(qbcm), np.asarray(qbc), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("g", [128, 256])
def test_qmm_bc4a8_interpret(g):
    """bc4a8 (bitcast + grouped s8 dots): kernel must match the grouped jnp
    reference at both serving group sizes, stacked and multi."""
    inn, out, t, L = 2048, 256, 8, 2
    codes = RNG.integers(-8, 8, size=(L, inn, out)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01)
    lo = codes[:, 0::2].astype(np.uint8) & 15
    hi = codes[:, 1::2].astype(np.uint8) & 15
    packed = jnp.asarray(lo | (hi << 4))
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    ref = np.asarray(qmm.qmm_bc4a8_reference(x, packed[1], d[1], group=g))
    xt, da = qmm.quantize_acts_s8(x)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.qmm_bc4a8_stacked(xt, packed, d, 1, group=g)) * np.asarray(da)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("interior", ["full", "groupdots", "groups"])
def test_qmm_bc4a8_interior_variants(interior):
    """The three kernel-interior schedules (full-tile batched dot, per-group
    dots, per-group bitcast+astype+dot) are exact reschedules of the same
    math — identical outputs, stacked and multi."""
    inn, out, t, L, g = 2048, 256, 8, 2, 128
    codes = RNG.integers(-8, 8, size=(L, inn, out)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_bc4_signed(codes))
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    ref = np.asarray(qmm.qmm_bc4a8_reference(x, packed[1], d[1], group=g))
    xt, da = qmm.quantize_acts_s8(x)
    xts = jnp.stack([xt, xt])
    p2 = jnp.concatenate([packed, packed], axis=2)
    d2 = jnp.concatenate([d, d], axis=2)
    old = qmm.BC4A8_INTERIOR
    qmm.BC4A8_INTERIOR = interior
    try:
        with pltpu.force_tpu_interpret_mode():
            y = np.asarray(qmm.qmm_bc4a8_stacked(xt, packed, d, 1, group=g))
            ym = np.asarray(qmm.qmm_bc4a8_stacked_multi(xts, p2, d2, 1, 2,
                                                        group=g))
    finally:
        qmm.BC4A8_INTERIOR = old
    np.testing.assert_allclose(y * np.asarray(da), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ym[:, :out] * np.asarray(da), ref, rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("g", [128, 256])
def test_qmm_bc5a8_interpret(g):
    """bc5a8 (nibble + i2 sign planes, grouped s8 dots): pack/unpack
    roundtrip is exact; kernel matches the grouped jnp reference, stacked
    and multi."""
    inn, out, t, L = 2048, 256, 8, 2
    codes = RNG.integers(-16, 16, size=(L, inn, out)).astype(np.int8)
    nib, sig = qmm.pack_bc5_signed(codes)
    rt = np.asarray(qmm.unpack_bc5(jnp.asarray(nib), jnp.asarray(sig)))
    assert np.array_equal(rt, codes.astype(np.int32))
    d = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01)
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    nibj, sigj = jnp.asarray(nib), jnp.asarray(sig)
    ref = np.asarray(qmm.qmm_bc5a8_reference(x, nibj[1], sigj[1], d[1], group=g))
    xt, da = qmm.quantize_acts_s8(x)
    xts = jnp.stack([xt, xt])
    n2 = jnp.concatenate([nibj, nibj], axis=2)
    s2 = jnp.concatenate([sigj, sigj], axis=2)
    d2 = jnp.concatenate([d, d], axis=2)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.qmm_bc5a8_stacked(xt, nibj, sigj, d, 1, group=g))
        ym = np.asarray(qmm.qmm_bc5a8_stacked_multi(xts, n2, s2, d2, 1, 2,
                                                    group=g))
    np.testing.assert_allclose(y * np.asarray(da), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ym[:, :out] * np.asarray(da), ref, rtol=1e-5,
                               atol=1e-5)


def test_quantize_params_w5a8bc_forward():
    """mode='w5a8bc' end-to-end on a real tiny model (merged rkv): bc5a8
    Linears, logits in the 5-bit band vs dense (tighter than the 4-bit
    band), and to_dense_f32 roundtrips the planes."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device, to_dense_f32
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    qw = quantize_params_device(prm, mode="w5a8bc", merge_rkv=True)
    kinds = {v.kind for v in qw["layers"].values() if hasattr(v, "kind")}
    assert "bc5a8" in kinds, kinds
    logits_q, _ = F.forward(qw, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q))[0, 1]
    assert c > 0.985, c
    # 5-bit codes must beat the 4-bit mode's correlation on the same model
    q4 = quantize_params_device(prm, mode="w4a8bc", merge_rkv=True)
    logits_q4, _ = F.forward(q4, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c4 = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q4))[0, 1]
    assert c >= c4 - 1e-3, (c, c4)
    # dense roundtrip of one bc5a8 Linear stays within the 5-bit grid step
    lin = next(v for v in qw["layers"].values()
               if hasattr(v, "kind") and v.kind == "bc5a8")
    import jax
    wq = to_dense_f32(jax.tree.map(lambda a: np.asarray(a), lin)).w
    assert wq.shape[-2:] == lin.shape


def test_quantize_params_w4a8bc_forward():
    """mode='w4a8bc' end-to-end on a real tiny model (merged rkv): bc4a8
    Linears, logits in the coarse-group 4-bit band vs dense."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    qw = quantize_params_device(prm, mode="w4a8bc", merge_rkv=True)
    kinds = {v.kind for v in qw["layers"].values() if hasattr(v, "kind")}
    assert "bc4a8" in kinds, kinds
    logits_q, _ = F.forward(qw, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q))[0, 1]
    assert c > 0.97, c


@pytest.mark.parametrize("g", [64, 128, 256])
def test_qmm_w4a8_coarse_groups(g):
    """Serving-only coarse-group w4a8 (INT4G64/128/256): each per-group
    integer dot contracts K=g, filling the MXU's pipelined contraction
    depth that K=32 group dots leave idle. Kernel must match the grouped
    jnp reference bit-close at every group size. The width is chosen so
    the scale BlockSpec keeps >= 8 sublane rows (in/2 >= 8*g — narrower
    coarse-group widths are gated out of aligned_w4a8 and serve through
    qmm_w4a8_reference; see test_w4a8_coarse_group_alignment_gate)."""
    inn, out, t, L = max(2048, 16 * g), 256, 8, 2
    codes = RNG.integers(-8, 8, size=(L, inn, out)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_i4(codes, bias=8))
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    ref = np.asarray(qmm.qmm_w4a8_reference(x, packed[1], d[1], group=g))
    xt, da = qmm.quantize_acts_s8(x)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.qmm_w4a8_stacked(xt, packed, d, 1, group=g)) * np.asarray(da)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("inn,g", [(2560, 128), (7168, 256), (2560, 256)])
def test_qmm_bc4a8_non_pow2_contraction(inn, g):
    """Regression (round-4 advisor, high): the bc4a8 packed-row tile must
    DIVIDE in/2 — the old 8-row widening loop doubled ITp without keeping
    divisibility, so the floor-divided grid silently never contracted the
    trailing rows (in=2560 @ g=128 covered 1024/1280 packed rows). Checked
    at 3.5x-FFN-style widths; infeasible combos must route to the jnp
    reference via bc4a8_aligned instead of mis-tiling."""
    out, t, L = 256, 8, 1
    codes = RNG.integers(-8, 8, size=(L, inn, out)).astype(np.int8)
    d = jnp.asarray(RNG.standard_normal((L, inn // g, out)).astype(np.float32) * 0.01)
    lo = codes[:, 0::2].astype(np.uint8) & 15
    hi = codes[:, 1::2].astype(np.uint8) & 15
    packed = jnp.asarray(lo | (hi << 4))
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    ref = np.asarray(qmm.qmm_bc4a8_reference(x, packed[0], d[0], group=g))
    if not qmm.bc4a8_aligned(inn, out, g):
        with pytest.raises(ValueError):
            xt, da = qmm.quantize_acts_s8(x)
            with pltpu.force_tpu_interpret_mode():
                qmm.qmm_bc4a8_stacked(xt, packed, d, 0, group=g)
        return
    xt, da = qmm.quantize_acts_s8(x)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(qmm.qmm_bc4a8_stacked(xt, packed, d, 0, group=g)) * np.asarray(da)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)
    # multi variant shares the tiling logic
    with pltpu.force_tpu_interpret_mode():
        ym = qmm.qmm_bc4a8_stacked_multi(
            jnp.stack([xt, xt]), jnp.concatenate([packed, packed], axis=-1),
            jnp.concatenate([d, d], axis=-1), 0, 2, group=g)
    np.testing.assert_allclose(
        np.asarray(ym)[:, :out] * np.asarray(da), ref, rtol=1e-5, atol=1e-5)


def test_w4a8_coarse_group_alignment_gate():
    """Regression (round-4 advisor, low): aligned_w4a8 must reject widths
    whose scale BlockSpec would have < 8 sublane rows (in/2 < 8*g), so the
    Linear dispatch falls back to qmm_w4a8_reference instead of handing
    Mosaic a sub-8-row f32 block."""
    assert not qmm.aligned_w4a8(2048, 256, 256)   # in/2=1024 < 8*256
    assert qmm.aligned_w4a8(4096, 256, 256)       # in/2=2048 == 8*256
    assert qmm.aligned_w4a8(2048, 256, 128)
    # bc4a8: non-power-of-two widths with a feasible divisor tile stay on
    # the kernel; ones without any route to reference
    assert qmm.bc4a8_aligned(2560, 256, 128)      # ITp=640 divides 1280
    assert qmm.bc4a8_aligned(7168, 256, 256)      # ITp=3584
    assert not qmm.bc4a8_aligned(1536, 256, 256)  # in/2=768 < 4*g=1024
    assert not qmm.bc4a8_aligned(2560, 192, 128)  # out not lane-aligned


def test_quantize_params_w4a8_coarse_group_forward():
    """mode='w4a8g128' end-to-end on a real tiny model: INT4G128 Linears,
    logits in the 4-bit band vs dense (coarser scales cost a little extra
    error vs per-32 but stay serving-quality)."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))

    qw = quantize_params_device(prm, mode="w4a8g128")
    fmts = {v.fmt for v in qw["layers"].values()
            if hasattr(v, "kind") and v.kind == "w4a8g"}
    # tiny model: in=64 matrices fall back to G64; ffn_v (in=256) holds G128
    assert fmts <= {"INT4G128", "INT4G64"} and "INT4G128" in fmts, fmts
    logits_q, _ = F.forward(qw, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q))[0, 1]
    assert c > 0.97, c


def test_quantize_params_w4a8_merge_and_forward():
    """mode='w4a8' with merge_rkv on a real tiny model: merged w4a8g rkv
    projections flow through matmul_multi's reference path off-TPU, match
    the UNMERGED w4a8 logits exactly (merging never changes codes or the
    activation quantization), and stay close to the dense fast path."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))

    qw = quantize_params_device(prm, mode="w4a8")
    kinds = {k: v.kind for k, v in qw["layers"].items() if hasattr(v, "kind")}
    assert any(v == "w4a8g" for v in kinds.values()), kinds
    logits_qw, _ = F.forward(qw, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_qw))[0, 1]
    # int4 weight band + a8 activation rounding
    assert c > 0.98, c

    qwm = quantize_params_device(prm, mode="w4a8", merge_rkv=True)
    merged = [v for v in qwm["layers"].values()
              if hasattr(v, "kind") and v.kind == "w4a8g"
              and v.q.shape[-1] > qw["layers"]["att_k"].q.shape[-1]]
    assert merged, "no merged w4a8g Linear produced"
    logits_qwm, _ = F.forward(qwm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(logits_qwm), np.asarray(logits_qw),
                               atol=1e-5, rtol=1e-5)


def test_quantize_params_head_mode_override():
    """head can pick a different quantize mode than the blocks — e.g. int4
    blocks + a w8a8/w4a8 head (the head is ~30% of 1.5B decode traffic).
    Logit quality stays in the 4-bit band."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))

    for hmode, hkind in (("w8a8", "w8a8"), ("w4a8", "w4a8g")):
        q = quantize_params_device(prm, mode="int4", head=hmode)
        assert q["head"].kind == hkind, (hmode, q["head"].kind)
        logits_q, _ = F.forward(q, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
        c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q))[0, 1]
        assert c > 0.98, (hmode, c)

    with pytest.raises(ValueError):
        quantize_params_device(prm, mode="int4", head="nope")


# ---------------------------------------------------------------------------
# Packed 5/6-bit (nibble + high-bit plane) kernels — Q5/Q6-class sub-byte
# serving
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [1, 2])
def test_pack_unpack_hi_bits_roundtrip(bits):
    inn, out = 64, 8
    hi = RNG.integers(0, 1 << bits, size=(inn, out)).astype(np.int8)
    packed = qmm.pack_hi_bits(hi, bits=bits)
    assert packed.shape == (inn * bits // 8, out) and packed.dtype == np.uint8
    back = np.asarray(qmm.unpack_hi_bits(jnp.asarray(packed), bits=bits))
    np.testing.assert_array_equal(back, hi)


def test_pack_i5_roundtrip():
    inn, out = 64, 8
    codes = RNG.integers(-16, 16, size=(inn, out)).astype(np.int8)
    nib, hib = qmm.pack_i5(codes, bias=16, hi_bits=1)
    assert nib.shape == (inn // 2, out) and hib.shape == (inn // 8, out)
    back = (np.asarray(qmm.unpack_i4(jnp.asarray(nib)))
            + (np.asarray(qmm.unpack_hi_bits(jnp.asarray(hib), bits=1)) << 4) - 16)
    np.testing.assert_array_equal(back, codes)


@pytest.mark.parametrize("with_min", [False, True])
@pytest.mark.parametrize("hi_bits", [1, 2])
def test_qmm_i5_kernel_matches_reference(with_min, hi_bits):
    """Packed 5/6-bit kernel (interpret mode) vs the jnp unpack reference,
    incl. a multi-step contraction grid (tiles force NH=2 accumulation)."""
    inn, out, t = 1024, 256, 8
    hi_max = 1 << (4 + hi_bits)
    codes = RNG.integers(0, hi_max, size=(inn, out)).astype(np.int16)
    nib, hib = qmm.pack_i5(codes, bias=0, hi_bits=hi_bits)
    g = 32 if hi_bits == 1 else 16
    d = jnp.asarray(RNG.standard_normal((inn // g, out)).astype(np.float32) * 0.01)
    m = jnp.asarray(RNG.standard_normal((inn // g, out)).astype(np.float32) * 0.01) if with_min else None
    bias = 0 if with_min else hi_max // 2
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    nib, hib = jnp.asarray(nib), jnp.asarray(hib)

    y_ref = qmm.qmm_i5_reference(x, nib, hib, d, m, bias=bias, group=g,
                                 hi_bits=hi_bits)
    # exact dense ground truth
    w = (codes.astype(np.float32) - bias).reshape(inn // g, g, out) * np.asarray(d)[:, None, :]
    if m is not None:
        w = w + np.asarray(m)[:, None, :]
    y_dense = np.asarray(x) @ w.reshape(inn, out)
    np.testing.assert_allclose(np.asarray(y_ref), y_dense, atol=1e-4, rtol=1e-4)
    for tiles in [None, (128, 256)]:
        with pltpu.force_tpu_interpret_mode():
            y_pl = qmm.qmm_i5(x, nib, hib, d, m, bias=bias, group=g,
                              hi_bits=hi_bits, tiles=tiles, compute=jnp.float32)
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("with_min", [False, True])
def test_qmm_i5_stacked_matches_per_layer(with_min):
    """Scalar-prefetch layer-stacked packed 5-bit kernel (the Q5 decode hot
    path) must select the right layer's tiles."""
    L, inn, out, t = 3, 512, 128, 4
    codes = RNG.integers(0, 32, size=(L, inn, out)).astype(np.int16)
    nib, hib = qmm.pack_i5(codes, bias=0, hi_bits=1)
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01)
    m = jnp.asarray(RNG.standard_normal((L, inn // 32, out)).astype(np.float32) * 0.01) if with_min else None
    bias = 0 if with_min else 16
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))
    nib, hib = jnp.asarray(nib), jnp.asarray(hib)

    for layer in range(L):
        y_ref = qmm.qmm_i5_reference(
            x, nib[layer], hib[layer], d[layer],
            None if m is None else m[layer], bias=bias)
        with pltpu.force_tpu_interpret_mode():
            y_st = qmm.qmm_i5_stacked(x, nib, hib, d, m, jnp.int32(layer),
                                      bias=bias, compute=jnp.float32)
        np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("hi_bits", [1, 2])
def test_qmm_i5_stacked_multi_matches_parts(hi_bits):
    """Merged N-projection packed 5/6-bit kernel: each part's output must
    equal its standalone packed matmul with that part's own input."""
    L, inn, eo, n, t = 2, 512, 128, 3, 4
    hi_max = 1 << (4 + hi_bits)
    codes = RNG.integers(0, hi_max, size=(L, inn, n * eo)).astype(np.int16)
    nib, hib = qmm.pack_i5(codes, bias=0, hi_bits=hi_bits)
    d = jnp.asarray(RNG.standard_normal((L, inn // 32, n * eo)).astype(np.float32) * 0.01)
    xs = jnp.asarray(RNG.standard_normal((n, t, inn)).astype(np.float32))
    nib, hib = jnp.asarray(nib), jnp.asarray(hib)
    bias = hi_max // 2

    for layer in range(L):
        with pltpu.force_tpu_interpret_mode():
            y = qmm.qmm_i5_stacked_multi(xs, nib, hib, d, jnp.int32(layer), n,
                                         bias=bias, hi_bits=hi_bits,
                                         compute=jnp.float32)
        for i in range(n):
            y_ref = qmm.qmm_i5_reference(
                xs[i], nib[layer, :, i * eo:(i + 1) * eo],
                hib[layer, :, i * eo:(i + 1) * eo],
                d[layer, :, i * eo:(i + 1) * eo], bias=bias, hi_bits=hi_bits)
            np.testing.assert_allclose(np.asarray(y[:, i * eo:(i + 1) * eo]),
                                       np.asarray(y_ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("fmt", ["Q5_0", "Q5_1", "Q5_K", "Q6_K"])
def test_q5_q6_from_record_packs(fmt):
    """Q5/Q6-class formats serve sub-byte: from_record gives q5fast/q6fast
    whose matmul matches exact dequantization, and to_dense_f32 restores the
    codec's exact weights."""
    from rwkv_tpu.formats import quant as qc_

    out, inn = 128, 512
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    rec = make_record("w", w, fmt)
    lin = from_record(rec, parity=False)
    assert lin.kind == ("q6fast" if fmt == "Q6_K" else "q5fast")
    assert lin.qh is not None
    # bus bytes: nibble plane + bit plane match the format's bit-width
    nbytes = lin.q.size + lin.qh.size
    assert nbytes == inn * out * (5 if fmt != "Q6_K" else 6) // 8 // 1
    x = jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
    y = matmul(x, lin)
    dense = np.asarray(qc_.dequantize(fmt, rec.data, (out, inn))).T
    y_ref = np.asarray(x) @ dense
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(to_dense_f32(lin).w), dense,
                               atol=1e-6, rtol=1e-6)


def test_q5fast_matmul_multi_reference_parts():
    """matmul_multi on a merged q5fast Linear (reference path) equals the
    per-part matmuls."""
    from rwkv_tpu.ops.linear import at_layer, merge_qfast, stack

    Lk, out, inn, n = 2, 128, 512, 3
    per_layer = []
    for _ in range(Lk):
        parts = []
        for _ in range(n):
            w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
            parts.append(from_record(make_record("w", w, "Q5_0"), parity=False))
        per_layer.append(parts)
    stacked = [stack([per_layer[l][i] for l in range(Lk)]) for i in range(n)]
    merged = merge_qfast(stacked)
    assert merged.qh is not None
    xs = [jnp.asarray(RNG.standard_normal((4, inn)).astype(np.float32))
          for _ in range(n)]
    from rwkv_tpu.ops.linear import matmul_multi

    for layer in range(Lk):
        ys = matmul_multi(xs, at_layer(merged, jnp.int32(layer)))
        for i in range(n):
            y_ref = matmul(xs[i], per_layer[layer][i])
            np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(y_ref),
                                       atol=1e-4, rtol=1e-4)


def test_quantize_params_int5_forward():
    """mode='int5' on a real tiny model: q5fast projections flow through the
    reference path off-TPU; reconstruction is 5-bit exact (err <= d/2) and
    logits track the dense fast path tighter than the int4 band."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops.linear import quantize_params_device, to_dense_f32
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    st = F.init_state(cfg)
    logits_dense, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))

    q5 = quantize_params_device(prm, mode="int5")
    att_k = q5["layers"]["att_k"]
    assert att_k.kind == "q5fast" and att_k.fmt == "INT5" and att_k.qh is not None
    # round-to-nearest against the stored (bf16-rounded) scale: err <= d/2
    w0 = np.asarray(prm["layers"]["att_k"].w, np.float32)
    wq = np.asarray(to_dense_f32(att_k).w)
    dmax = np.repeat(np.asarray(att_k.d, np.float32), 32, axis=-2)
    assert np.all(np.abs(w0 - wq) <= dmax / 2 + 1e-7)

    logits_q5, _ = F.forward(q5, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(logits_dense), np.asarray(logits_q5))[0, 1]
    # same end-to-end band as int4 (corr on the tiny model is noisy; the
    # real gain shows in logit rms: 0.33 for int5 vs 0.71 for int4 vs 0.012
    # for int8, measured on this model — halving the weight error as the
    # extra bit should)
    assert c > 0.98, c


def test_kernel_row_padding_plumbing(monkeypatch):
    """Sub-sublane activation rows (B<8 decode, B=1 speculative drafting)
    are padded to one full sublane before the fused kernels and sliced back
    (linear._pad_rows_to); force the pad on the CPU reference path and pin
    exact equality for matmul and matmul_multi."""
    import rwkv_tpu.ops.linear as L

    w = RNG.standard_normal((128, 512)).astype(np.float32) * 0.3
    lin = from_record(make_record("w", w, "Q4_0"), parity=False)
    x = jnp.asarray(RNG.standard_normal((3, 512)).astype(np.float32))
    y_ref = matmul(x, lin)

    monkeypatch.setattr(L, "_pad_rows_to", lambda t: 8 if t < 8 else None)
    y_pad = matmul(x, lin)
    np.testing.assert_array_equal(np.asarray(y_pad), np.asarray(y_ref))
    assert y_pad.shape == (3, 128)

    from rwkv_tpu.ops.linear import at_layer, matmul_multi, merge_qfast, stack

    parts = [from_record(make_record("w", RNG.standard_normal((128, 512))
                                     .astype(np.float32) * 0.3, "Q4_0"),
                         parity=False) for _ in range(3)]
    merged = merge_qfast([stack([p]) for p in parts])
    xs = [jnp.asarray(RNG.standard_normal((2, 512)).astype(np.float32))
          for _ in range(3)]
    ys = matmul_multi(xs, at_layer(merged, jnp.int32(0)))
    for i in range(3):
        y_ref = matmul(xs[i], parts[i])
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5)
        assert ys[i].shape == (2, 128)
