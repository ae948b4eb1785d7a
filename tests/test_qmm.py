"""Fused dequant-matmul kernel: interpret-mode Pallas vs jnp reference vs
exact dense dequantization, all quant formats."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.formats import quant as qc
from rwkv_tpu.ops import qmm
from rwkv_tpu.ops.linear import Linear, from_record, matmul, to_dense_f32
from rwkv_tpu.formats.container import make_record

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("fmt", qc.QUANT_FORMATS)
@pytest.mark.parametrize("t", [1, 8])
def test_qmm_matches_dense_dequant(fmt, t):
    out, inn = 128, 256
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    rec = make_record("w", w, fmt)
    lin = from_record(rec, parity=False)
    assert lin.kind == "qfast"
    x = jnp.asarray(RNG.standard_normal((t, inn)).astype(np.float32))

    # ground truth: exact dequantized dense matmul
    dense = to_dense_f32(lin)
    y_ref = np.asarray(x) @ np.asarray(dense.w)

    # jnp fallback path
    y_jnp = qmm.qmm_reference(x, jnp.asarray(lin.q), jnp.asarray(lin.d),
                              None if lin.m is None else jnp.asarray(lin.m))
    np.testing.assert_allclose(y_jnp, y_ref, atol=1e-4, rtol=1e-5)

    # pallas kernel (interpret mode on CPU)
    with pltpu.force_tpu_interpret_mode():
        y_pl = qmm.qmm(x, jnp.asarray(lin.q), jnp.asarray(lin.d),
                       None if lin.m is None else jnp.asarray(lin.m))
    np.testing.assert_allclose(y_pl, y_ref, atol=1e-4, rtol=1e-5)


def test_qfast_matmul_dispatch():
    """matmul() on a qfast Linear routes through qmm_reference off-TPU."""
    out, inn = 64, 128
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    lin = from_record(make_record("w", w, "Q5_1"), parity=False)
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
    assert prm["layers"]["att_k"].kind == "qfast"
    st = F.init_state(cfg)
    logits, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    # committed Q5_1 oracle sum is +48.07; weights-only dequant lands near it
    ds = logit_diff_sum(logits, expected)
    assert abs(ds) <= 48.068733 * 1.10, ds


@pytest.mark.parametrize("fmt", ["Q5_1", "Q8_0", "Q4_K", "Q6_K"])
def test_qmm_stacked_matches_per_layer(fmt):
    """The scalar-prefetch layer-stacked kernel (the int8 decode hot path)
    must select the right layer's tiles and match the unstacked kernel, for
    both 32- and 16-element scale groups."""
    from rwkv_tpu.ops.linear import from_record, group_of

    L, out, inn = 3, 128, 512
    lins = []
    for i in range(L):
        w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
        lins.append(from_record(make_record(f"w{i}", w, fmt), parity=False))
    g = group_of(fmt)
    q = jnp.stack([jnp.asarray(l.q) for l in lins])
    d = jnp.stack([jnp.asarray(l.d) for l in lins])
    m = None if lins[0].m is None else jnp.stack([jnp.asarray(l.m) for l in lins])
    x = jnp.asarray(RNG.standard_normal((8, inn)).astype(np.float32))

    for layer in range(L):
        y_ref = qmm.qmm_reference(
            x, jnp.asarray(lins[layer].q), jnp.asarray(lins[layer].d),
            None if m is None else jnp.asarray(lins[layer].m), group=g,
        )
        with pltpu.force_tpu_interpret_mode():
            y_st = qmm.qmm_stacked(x, q, d, m, jnp.int32(layer), group=g)
        np.testing.assert_allclose(np.asarray(y_st), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("fmt", ["Q2_K", "Q6_K"])
def test_qmm_group16_kernel(fmt):
    """The Pallas kernel with 16-element scale groups (Q2/Q3/Q6_K)."""
    from rwkv_tpu.ops.linear import from_record, group_of

    out, inn = 128, 512
    w = RNG.standard_normal((out, inn)).astype(np.float32) * 0.3
    lin = from_record(make_record("w", w, fmt), parity=False)
    g = group_of(fmt)
    assert g == 16
    x = jnp.asarray(RNG.standard_normal((8, inn)).astype(np.float32))
    y_ref = qmm.qmm_reference(x, jnp.asarray(lin.q), jnp.asarray(lin.d),
                              None if lin.m is None else jnp.asarray(lin.m), group=g)
    with pltpu.force_tpu_interpret_mode():
        y_pl = qmm.qmm(x, jnp.asarray(lin.q), jnp.asarray(lin.d),
                       None if lin.m is None else jnp.asarray(lin.m), group=g)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref), atol=1e-4, rtol=1e-4)
