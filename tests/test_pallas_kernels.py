"""Pallas WKV kernels vs the jnp reference scans (interpret mode on CPU;
the same comparisons run compiled on a real TPU in bench/verify flows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.ops import wkv as ref
from rwkv_tpu.ops import pallas_wkv as pk

RNG = np.random.default_rng(42)

# interpret-mode tests validate the kernel MATH and run on the CPU suite;
# on the real chip (RWKV_TPU_TESTS=1) the interpreter round-trips every
# internal op over the device relay (minutes per test) and the compiled
# @tpu_only variants below cover the lowering — so skip them there.
cpu_interpret = pytest.mark.skipif(
    jax.default_backend() == "tpu",
    reason="interpret-mode math tests run on CPU; compiled variants cover TPU",
)


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * 0.3)


def _decayish(*shape):
    # w in (0, 1) like exp(-exp(.)) / exp(-0.6*sigmoid)
    return jnp.asarray(np.exp(-np.exp(RNG.uniform(-2, 1, shape))).astype(np.float32))


@cpu_interpret
@pytest.mark.parametrize("chunk,head_block", [(8, 2), (16, 4), (32, 2)])
def test_wkv6_fused_chunk_batched(chunk, head_block):
    """Fused chunk-parallel wkv6 kernel (sub-chunked clipped-pairwise decay)
    vs the sequential batched scan, with ragged lengths and decays spanning
    the full unbounded v6 range (w down to ~e^-20)."""
    rng = np.random.default_rng(7)
    B, T, H, S = 2, 96, 4, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    lw = -np.exp(rng.uniform(-2.0, 3.0, (B, T, H, S))).astype(np.float32)  # v6: lw = -exp(d)
    lw = jnp.asarray(lw)
    w = jnp.exp(lw)
    tf = jnp.asarray(rng.uniform(0, 0.3, (H, S)), jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 77, jnp.arange(T) < T])

    out_ref, st_ref = ref.wkv56_batched(r, k, v, tf, w, s0, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv6_chunked_pallas_batched(
            r, k, v, tf, lw, s0, valid, chunk=chunk, head_block=head_block
        )
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(m, np.asarray(out_pl), 0.0), np.where(m, np.asarray(out_ref), 0.0),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=2e-4, rtol=2e-4)


@cpu_interpret
def test_wkv6_fused_chunk_v5_constant_decay():
    """v5 mode: constant per-channel decay broadcast per token, T needing
    padding up to the chunk size."""
    rng = np.random.default_rng(8)
    B, T, H, S = 2, 40, 2, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    wc = np.exp(-np.exp(rng.uniform(-2, 1, (H, S)))).astype(np.float32)
    w = jnp.broadcast_to(jnp.asarray(wc), (B, T, H, S))
    lw = jnp.broadcast_to(jnp.log(jnp.asarray(wc)), (B, T, H, S))
    tf = jnp.asarray(np.exp(rng.uniform(-2, 0, (H, S))).astype(np.float32))
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 17, jnp.arange(T) < T])

    out_ref, st_ref = ref.wkv56_batched(r, k, v, tf, w, s0, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv6_chunked_pallas_batched(r, k, v, tf, lw, s0, valid)
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(m, np.asarray(out_pl), 0.0), np.where(m, np.asarray(out_ref), 0.0),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=2e-4, rtol=2e-4)


@cpu_interpret
def test_wkv6_fused_chunk_underflowed_decay():
    """lw = -inf (fully underflowed w) must clamp, not produce nans."""
    rng = np.random.default_rng(9)
    B, T, H, S = 1, 32, 1, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    lw = jnp.full((B, T, H, S), -jnp.inf, jnp.float32)
    tf = jnp.asarray(rng.uniform(0, 0.3, (H, S)), jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.ones((B, T), bool)

    out_ref, st_ref = ref.wkv56_batched(r, k, v, tf, jnp.exp(lw), s0, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv6_chunked_pallas_batched(r, k, v, tf, lw, s0, valid, chunk=32)
    assert np.isfinite(np.asarray(out_pl)).all()
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=2e-4, rtol=2e-4)


@cpu_interpret
@pytest.mark.parametrize("chunk,head_block", [(32, 2), (64, 4)])
def test_wkv7_fused_chunk_batched(chunk, head_block):
    """Fused chunk-parallel kernel (WY formulation, log-decay interface)
    vs the sequential batched scan, with ragged per-stream lengths."""
    rng = np.random.default_rng(11)
    B, T, H, S = 2, 96, 4, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    a = jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = a * jnp.asarray(rng.uniform(0, 1, (B, T, H, 1)), jnp.float32)
    lw = -0.606531 * jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, T, H, S)), jnp.float32))
    w = jnp.exp(lw)
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 77, jnp.arange(T) < T])

    out_ref, st_ref = ref.wkv7_batched(r, w, k, v, -a, b, s0, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv7_chunked_pallas_batched(
            r, lw, k, v, -a, b, s0, valid, chunk=chunk, head_block=head_block
        )
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(m, np.asarray(out_pl), 0.0), np.where(m, np.asarray(out_ref), 0.0),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=2e-4, rtol=2e-4)


def test_chunked_batched_matches_scan():
    """XLA chunked batched fold (no vmap) vs the sequential batched scan.
    On CPU the math is f32-exact (2e-4 band). On the real TPU the chunk
    form's value dots run one-pass bf16 (like every f32 matmul at DEFAULT
    precision), so outputs drift ~1% relative vs the scan — the same class
    as the compiled fused kernels, gated here at the same 5e-2 band."""
    from rwkv_tpu.ops import wkv_chunked as wc

    rng = np.random.default_rng(12)
    B, T, H, S = 3, 64, 2, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    a = jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = a * jnp.asarray(rng.uniform(0, 1, (B, T, H, 1)), jnp.float32)
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, T, H, S)), jnp.float32)))
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 64, jnp.arange(T) < 31, jnp.arange(T) < 1])

    tol = 2e-4 if jax.default_backend() == "cpu" else 5e-2
    out_ref, st_ref = ref.wkv7_batched(r, w, k, v, -a, b, s0, valid)
    out_c, st_c = wc.wkv7_chunked_batched(r, w, k, v, -a, b, s0, valid, chunk=32)
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(m, np.asarray(out_c), 0.0), np.where(m, np.asarray(out_ref), 0.0),
        atol=tol, rtol=tol,
    )
    np.testing.assert_allclose(np.asarray(st_c), np.asarray(st_ref), atol=tol, rtol=tol)

    # wkv6 batched fold
    tf = jnp.asarray(rng.uniform(0, 0.3, (H, S)), jnp.float32)
    out6_ref, st6_ref = ref.wkv56_batched(r, k, v, tf, w, s0, valid)
    out6, st6 = wc.wkv6_chunked_batched(r, k, v, tf, w, s0, valid, chunk=32)
    np.testing.assert_allclose(
        np.where(m, np.asarray(out6), 0.0), np.where(m, np.asarray(out6_ref), 0.0),
        atol=tol, rtol=tol,
    )
    np.testing.assert_allclose(np.asarray(st6), np.asarray(st6_ref), atol=tol, rtol=tol)


# ---------------------------------------------------------------------------
# real-TPU (Mosaic-compiled) validation — RWKV_TPU_TESTS=1 mode only.
# Interpret mode above proves the math; these prove the LOWERING: compiled
# kernels on the chip vs the jnp scans, with tolerances sized for the
# one-pass bf16 MXU value dots (see docs/KERNELS.md "precision").
# ---------------------------------------------------------------------------

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs the real TPU (RWKV_TPU_TESTS=1)"
)


@tpu_only
def test_wkv6_fused_compiled_on_tpu():
    rng = np.random.default_rng(7)
    B, T, H, S = 2, 128, 4, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    lw = jnp.asarray(-np.exp(rng.uniform(-2.0, 3.0, (B, T, H, S))).astype(np.float32))
    tf = jnp.asarray(rng.uniform(0, 0.3, (H, S)), jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 77, jnp.arange(T) < T])
    out_pl, st_pl = jax.device_get(pk.wkv6_chunked_pallas_batched(r, k, v, tf, lw, s0, valid))
    out_ref, st_ref = jax.device_get(ref.wkv56_batched(r, k, v, tf, jnp.exp(lw), s0, valid))
    m = np.asarray(valid)[:, :, None, None]
    assert np.max(np.abs(np.where(m, out_pl - out_ref, 0))) < 5e-2
    assert np.max(np.abs(st_pl - st_ref)) < 1e-2


@tpu_only
def test_wkv7_fused_compiled_on_tpu():
    rng = np.random.default_rng(11)
    B, T, H, S = 2, 128, 4, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    a = jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = a * jnp.asarray(rng.uniform(0, 1, (B, T, H, 1)), jnp.float32)
    lw = -0.606531 * jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, T, H, S)), jnp.float32))
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.ones((B, T), bool)
    out_pl, st_pl = jax.device_get(pk.wkv7_chunked_pallas_batched(r, lw, k, v, -a, b, s0, valid))
    out_ref, st_ref = jax.device_get(ref.wkv7_batched(r, jnp.exp(lw), k, v, -a, b, s0, valid))
    assert np.max(np.abs(out_pl - out_ref)) < 1e-1
    assert np.max(np.abs(st_pl - st_ref)) < 2e-2


@tpu_only
def test_qmm_default_precision_on_tpu():
    """ADVICE r1: the fused dequant-matmul runs DEFAULT (one-pass bf16 MXU)
    precision on the chip; drift vs the f32 reference must stay at the
    bf16-epsilon level (~0.4% relative of the accumulated magnitude)."""
    from rwkv_tpu.ops import qmm as Q

    rng = np.random.default_rng(3)
    inn, out = 2048, 2048
    q = jnp.asarray(rng.integers(-127, 128, (inn, out), dtype=np.int8))
    d = jnp.asarray(rng.uniform(0.001, 0.01, (inn // 32, out)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((8, inn)), jnp.float32)
    y_k = jax.device_get(Q.qmm(x, q, d))
    y_r = jax.device_get(Q.qmm_reference(x, q, d))
    denom = np.maximum(np.abs(y_r), np.abs(y_r).mean())
    rel = np.abs(y_k - y_r) / denom
    assert rel.max() < 2e-2, rel.max()
    assert np.median(rel) < 3e-3


@cpu_interpret
def test_wkv7_step_kernel():
    """Fused single-token decode-step kernel vs the jnp step (dispatched for
    large B*H in models/forward.py)."""
    rng = np.random.default_rng(13)
    B, H, S = 8, 4, 64
    r, w, k, v, a, b = (jnp.asarray(rng.uniform(-1, 1, (B, H, S)), jnp.float32)
                        for _ in range(6))
    w = jnp.exp(-0.6 * jax.nn.sigmoid(w))
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    out_ref, st_ref = ref.wkv7_step(r, w, k, v, a, b, s0)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv7_step_batched(r, w, k, v, a, b, s0)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=1e-5, rtol=1e-5)


@cpu_interpret
def test_wkv7_step_kernel_variants():
    """The v1 (per-vector streams) and v2 (stacked vecs + aliased state)
    step kernels must agree with the jnp step, for f32 and bf16 state
    carries."""
    rng = np.random.default_rng(29)
    B, H, S = 8, 4, 64
    r, w, k, v, a, b = (jnp.asarray(rng.uniform(-1, 1, (B, H, S)), jnp.float32)
                        for _ in range(6))
    w = jnp.exp(-0.6 * jax.nn.sigmoid(w))
    s0f = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    for s0 in (s0f, s0f.astype(jnp.bfloat16)):
        out_ref, st_ref = ref.wkv7_step(r, w, k, v, a, b,
                                        s0.astype(jnp.float32))
        for v2 in (False, True):
            old = pk.STEP_V2
            pk.STEP_V2 = v2
            try:
                with pltpu.force_tpu_interpret_mode():
                    out_pl, st_pl = pk.wkv7_step_batched(r, w, k, v, a, b, s0)
            finally:
                pk.STEP_V2 = old
            assert st_pl.dtype == s0.dtype
            tol = 1e-5 if s0.dtype == jnp.float32 else 2e-2
            np.testing.assert_allclose(np.asarray(out_pl),
                                       np.asarray(out_ref), atol=tol, rtol=tol)
            np.testing.assert_allclose(
                np.asarray(st_pl.astype(jnp.float32)), np.asarray(st_ref),
                atol=tol, rtol=tol)


@cpu_interpret
def test_step_kernel_knobs():
    """STEP_ALIAS (in-place state via input_output_aliases) and STEP_MXU
    (S-contractions as batched dots) are exact reschedules: v7 and v5/v6
    step kernels match the jnp steps under every knob combination."""
    rng = np.random.default_rng(31)
    B, H, S = 8, 4, 64
    r, w, k, v, a, b = (jnp.asarray(rng.uniform(-1, 1, (B, H, S)), jnp.float32)
                        for _ in range(6))
    w = jnp.exp(-0.6 * jax.nn.sigmoid(w))
    tf, w6 = (jnp.asarray(rng.uniform(0.1, 1, (B, H, S)), jnp.float32)
              for _ in range(2))
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    o7_ref, s7_ref = ref.wkv7_step(r, w, k, v, a, b, s0)
    o56_ref, s56_ref = ref.wkv56_step(r, k, v, tf, w6, s0)
    old = pk.STEP_ALIAS, pk.STEP_MXU
    try:
        for alias in (False, True):
            for mxu in (False, True):
                pk.STEP_ALIAS, pk.STEP_MXU = alias, mxu
                with pltpu.force_tpu_interpret_mode():
                    o7, s7 = pk.wkv7_step_batched(r, w, k, v, a, b, s0)
                    o56, s56 = pk.wkv56_step_batched(r, k, v, tf, w6, s0)
                for got, want in ((o7, o7_ref), (s7, s7_ref),
                                  (o56, o56_ref), (s56, s56_ref)):
                    np.testing.assert_allclose(np.asarray(got),
                                               np.asarray(want),
                                               atol=2e-5, rtol=2e-5)
    finally:
        pk.STEP_ALIAS, pk.STEP_MXU = old


@cpu_interpret
def test_step_kernel_lstacked():
    """The L-stacked in-place step kernels (scalar-prefetch layer index,
    aliased state) advance EXACTLY one slot — matching the jnp step on that
    slot and preserving every other slot bit-for-bit, for f32 and bf16
    stacked carries, v7 and v5/v6."""
    rng = np.random.default_rng(7)
    L, B, H, S = 3, 8, 4, 64
    r, w, k, v, a, b = (jnp.asarray(rng.uniform(-1, 1, (B, H, S)), jnp.float32)
                        for _ in range(6))
    w = jnp.exp(-0.6 * jax.nn.sigmoid(w))
    tf, w6 = (jnp.asarray(rng.uniform(0.1, 1, (B, H, S)), jnp.float32)
              for _ in range(2))
    for dt in (jnp.float32, jnp.bfloat16):
        tol = 2e-2 if dt == jnp.bfloat16 else 2e-5
        full = jnp.asarray(rng.standard_normal((L, B, H, S, S)) * 0.1,
                           jnp.float32).astype(dt)
        for l in (0, 2):
            o_ref, s_ref = ref.wkv7_step(r, w, k, v, a, b,
                                         full[l].astype(jnp.float32))
            with pltpu.force_tpu_interpret_mode():
                o, stf = pk.wkv7_step_batched_lstacked(r, w, k, v, a, b,
                                                       full, l)
            assert stf.dtype == dt and stf.shape == full.shape
            np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                       atol=tol, rtol=tol)
            np.testing.assert_allclose(
                np.asarray(stf[l].astype(jnp.float32)), np.asarray(s_ref),
                atol=tol, rtol=tol)
            for j in range(L):
                if j != l:
                    assert np.array_equal(np.asarray(stf[j]),
                                          np.asarray(full[j])), j
            o56r, _ = ref.wkv56_step(r, k, v, tf, w6,
                                     full[l].astype(jnp.float32))
            with pltpu.force_tpu_interpret_mode():
                o56, _ = pk.wkv56_step_batched_lstacked(r, k, v, tf, w6,
                                                        full, l)
            np.testing.assert_allclose(np.asarray(o56), np.asarray(o56r),
                                       atol=tol, rtol=tol)


@cpu_interpret
def test_wkv56_step_kernel():
    """Fused v5/v6 decode-step kernel vs the jnp step, incl. (H, S)-shaped
    constant decay broadcast (the v5 calling convention)."""
    rng = np.random.default_rng(17)
    B, H, S = 8, 4, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, H, S)), jnp.float32) for _ in range(3))
    w_b = jnp.exp(-jnp.exp(jnp.asarray(rng.uniform(-2, 1, (B, H, S)), jnp.float32)))
    w_c = jnp.exp(-jnp.exp(jnp.asarray(rng.uniform(-2, 1, (H, S)), jnp.float32)))
    tf = jnp.asarray(rng.uniform(0, 0.3, (H, S)), jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    for w in (w_b, w_c):
        out_ref, st_ref = ref.wkv56_step(r, k, v, tf, w, s0)
        with pltpu.force_tpu_interpret_mode():
            out_pl, st_pl = pk.wkv56_step_batched(r, k, v, tf, w, s0)
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=1e-5, rtol=1e-5)


@cpu_interpret
def test_wkv7_step_kernel_packed():
    """Lane-packed step kernels ((BH, 32, 128) state view, MXU segmented
    reductions) vs the jnp step: the plain and L-stacked packed forms match
    on a bf16 carry (their dispatch regime), and the L-stacked form
    preserves untouched slots bit-for-bit. In interpret mode the MXU dots
    are exact f32, so the only rounding is the bf16 state carry itself."""
    rng = np.random.default_rng(37)
    B, H, S = 8, 4, 64
    r, w, k, v, a, b = (jnp.asarray(rng.uniform(-1, 1, (B * H, S)),
                                    jnp.float32) for _ in range(6))
    w = jnp.exp(-0.6 * jax.nn.sigmoid(w))
    s0 = jnp.asarray(rng.standard_normal((B * H, S, S)) * 0.1,
                     jnp.float32).astype(jnp.bfloat16)
    o_ref, s_ref = ref.wkv7_step(
        r.reshape(B, H, S), w.reshape(B, H, S), k.reshape(B, H, S),
        v.reshape(B, H, S), a.reshape(B, H, S), b.reshape(B, H, S),
        s0.reshape(B, H, S, S).astype(jnp.float32))
    with pltpu.force_tpu_interpret_mode():
        o_p, s_p = pk.wkv7_step_pallas_packed(r, w, k, v, a, b, s0)
    assert s_p.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o_p).reshape(B, H, S),
                               np.asarray(o_ref), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(
        np.asarray(s_p.astype(jnp.float32)).reshape(B, H, S, S),
        np.asarray(s_ref), atol=2e-2, rtol=2e-2)

    L = 3
    full = jnp.asarray(rng.standard_normal((L, B * H, S, S)) * 0.1,
                       jnp.float32).astype(jnp.bfloat16)
    for l in (0, 2):
        o_ref, s_ref = ref.wkv7_step(
            r.reshape(B, H, S), w.reshape(B, H, S), k.reshape(B, H, S),
            v.reshape(B, H, S), a.reshape(B, H, S), b.reshape(B, H, S),
            full[l].reshape(B, H, S, S).astype(jnp.float32))
        with pltpu.force_tpu_interpret_mode():
            o, stf = pk.wkv7_step_pallas_lstacked_packed(
                r, w, k, v, a, b, full, l)
        assert stf.shape == full.shape and stf.dtype == full.dtype
        np.testing.assert_allclose(np.asarray(o).reshape(B, H, S),
                                   np.asarray(o_ref), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(
            np.asarray(stf[l].astype(jnp.float32)).reshape(B, H, S, S),
            np.asarray(s_ref), atol=2e-2, rtol=2e-2)
        for j in range(L):
            if j != l:
                assert np.array_equal(np.asarray(stf[j]),
                                      np.asarray(full[j])), j
