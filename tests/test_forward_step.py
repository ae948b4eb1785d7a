"""Batched single-token decode step (models/forward.py::forward_step):
equivalence with the sequence forward at T=1 for every architecture version,
layer-major state layout round-trip, and the on-device decode loop."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models import synth
from rwkv_tpu.runtime import generate as G

VERSIONS = ["4.0", "5.1", "5.2", "6.0", "7.0"]


def _setup(ver, B=4, seed=3):
    cfg = synth.make_config(ver, n_vocab=128, n_embed=64, n_layer=3)
    params = jax.tree.map(jnp.asarray, synth.random_params(cfg, seed=seed))
    state = G.batched_init_state(cfg, B)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 128, (B,)), jnp.int32)
    return cfg, params, state, toks


@pytest.mark.parametrize("ver", VERSIONS)
def test_step_matches_forward_batch(ver):
    cfg, params, state, toks = _setup(ver)
    B = toks.shape[0]
    l1, s1 = fwd.forward_step(params, cfg, toks, state)
    l2, s2 = fwd.forward_batch(params, cfg, toks[:, None], state, jnp.ones((B,), jnp.int32))
    np.testing.assert_allclose(l1, l2, atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ver", ["4.0", "7.0"])
def test_step_layer_major_roundtrip(ver):
    cfg, params, state, toks = _setup(ver)
    l1, s1 = fwd.forward_step(params, cfg, toks, state)
    st_lm = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state)
    l2, s2_lm = fwd.forward_step(params, cfg, toks, st_lm, layer_major=True)
    s2 = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), s2_lm)
    np.testing.assert_allclose(l1, l2, atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_greedy_decode_matches_stepwise():
    cfg, params, state, toks = _setup("7.0")
    steps = 5
    out_toks, st_loop = G.greedy_decode(params, cfg, toks, state, steps=steps)
    # replay step by step through the public forward_step
    tok, st = toks, state
    got = []
    for _ in range(steps):
        logits, st = fwd.forward_step(params, cfg, tok, st)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        got.append(tok)
    np.testing.assert_array_equal(np.asarray(out_toks), np.stack(got, axis=1))
    for a, b in zip(jax.tree.leaves(st_loop), jax.tree.leaves(st)):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_bf16_state_carry_drift():
    """state_bf16 decode carries the wkv heads state in bf16 between steps
    (runtime/generate.py): teacher-forced over 160 steps on the TRAINED tiny
    model, the logits must stay tightly correlated with the f32-state run —
    pins the quality cost of the halved state HBM traffic."""
    from tests.common import fixture
    from rwkv_tpu.models import params as P

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    text = (b'"in the beginning the structure of the system was simple, '
            b'and the people who used it understood it well. ' * 3)
    toks = list(text)[:160]

    def run(cast_heads):
        st = fwd.init_state(cfg)
        logits = None
        for t in toks:
            logits, st = fwd.forward_step(
                prm, cfg, jnp.asarray([t], jnp.int32),
                jax.tree.map(lambda s: s[None], st))
            st = jax.tree.map(lambda s: s[0], st)
            if cast_heads:
                st = dict(st, heads=st["heads"].astype(jnp.bfloat16)
                          .astype(jnp.float32))
        return np.asarray(logits[0])

    lf32 = run(False)
    lbf16 = run(True)
    c = np.corrcoef(lf32, lbf16)[0, 1]
    assert c > 0.999, c
    assert int(np.argmax(lf32)) == int(np.argmax(lbf16))


def test_greedy_decode_state_bf16_smoke():
    """The state_bf16 knob: runs, returns f32 state at the boundary, and the
    first decoded token (a single step from a fresh state, where rounding
    cannot have accumulated) matches the f32 path."""
    cfg, params, state, toks = _setup("7.0")
    out_f32, st_f32 = G.greedy_decode(params, cfg, toks, state, steps=4)
    out_bf, st_bf = G.greedy_decode(params, cfg, toks, state, steps=4,
                                    state_bf16=True)
    assert st_bf["heads"].dtype == jnp.float32
    assert out_bf.shape == out_f32.shape
    np.testing.assert_array_equal(np.asarray(out_f32[:, 0]),
                                  np.asarray(out_bf[:, 0]))


def test_w8a8_quality_on_trained_weights():
    """Per-channel int8 weights + per-token int8 activations (the MXU-native
    turbo mode) must track dense logits on trained weights."""
    from tests.common import fixture
    from rwkv_tpu.models import params as P
    from rwkv_tpu.ops import linear as L

    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    toks = jnp.asarray(list(b'"in the beginning'), jnp.int32)
    st = fwd.init_state(cfg)
    n = jnp.int32(toks.shape[0])
    lg_d, _ = fwd.forward(prm, cfg, toks, st, n)
    w8 = L.quantize_params_device(prm, mode="w8a8")
    assert w8["layers"]["att_k"].kind == "w8a8"
    lg_q, _ = fwd.forward(w8, cfg, toks, st, n)
    corr = np.corrcoef(np.asarray(lg_d), np.asarray(lg_q))[0, 1]
    assert corr > 0.999, corr
    assert int(np.argmax(lg_q)) == int(np.argmax(lg_d))


def test_w8a8_matmul_matches_dense():
    from rwkv_tpu.ops import linear as L

    rng = np.random.default_rng(0)
    w = rng.standard_normal((512, 256)).astype(np.float32) * 0.05
    lin = L.Linear(w=jnp.asarray(w), kind="dense")
    q = L.quantize_dense_w8a8_device(lin)
    x = jnp.asarray(rng.standard_normal((16, 512)), jnp.float32)
    y_d = np.asarray(L.matmul(x, lin))
    y_q = np.asarray(L.matmul(x, q))
    rel = np.sqrt(np.mean((y_q - y_d) ** 2)) / np.sqrt(np.mean(y_d**2))
    assert rel < 0.02, rel
    # dense reconstruction agrees with the scales
    y_r = np.asarray(x) @ np.asarray(L.to_dense_f32(q).w)
    np.testing.assert_allclose(y_q, y_r, rtol=0.05, atol=0.05)


def test_step_quantized_params():
    """forward_step through int8 on-device-quantized weights (the serving
    path: ops/linear.py::quantize_params_device + qmm)."""
    from rwkv_tpu.ops import linear as L

    cfg, params, state, toks = _setup("7.0")
    qp = L.quantize_params_device(params)
    assert qp["layers"]["att_k"].kind == "qfast"
    l_dense, _ = fwd.forward_step(params, cfg, toks, state)
    l_q, s_q = fwd.forward_step(qp, cfg, toks, state)
    assert np.all(np.isfinite(np.asarray(l_q)))
    # int8 weights track dense logits closely on a tiny random model
    corr = np.corrcoef(np.asarray(l_dense).ravel(), np.asarray(l_q).ravel())[0, 1]
    assert corr > 0.999, corr


def test_merged_rkv_matches_unmerged():
    """quantize_params_device(merge_rkv=True) fuses r/k/v into one kernel
    call; logits must equal the unmerged quantized path (identical codes)."""
    import jax.numpy as jnp
    from rwkv_tpu.models import synth, forward as F
    from rwkv_tpu.ops import linear as L
    from rwkv_tpu.runtime import generate as G

    for ver in ("7.0", "6.0", "4.0"):
        cfg = synth.make_config(ver, n_vocab=256, n_embed=128, n_layer=2)
        params = jax.tree.map(jnp.asarray, synth.random_params(cfg))
        q = L.quantize_params_device(params)
        qm = L.quantize_params_device(params, merge_rkv=True)
        merged_key = "att_rkvg" if "att_gate" in params["layers"] else "att_rkv"
        assert merged_key in qm["layers"] and "att_r" not in qm["layers"]

        B = 2
        state = G.batched_init_state(cfg, B)
        toks = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, 8]], jnp.int32)
        lens = jnp.full((B,), 4, jnp.int32)
        l1, s1 = F.forward_seq(q, cfg, toks, state, lens)
        l2, s2 = F.forward_seq(qm, cfg, toks, state, lens)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5, rtol=1e-5)
        # decode step path too
        d1, _ = F.forward_step(q, cfg, toks[:, 0], s1, layer_major=False)
        d2, _ = F.forward_step(qm, cfg, toks[:, 0], s2, layer_major=False)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5, rtol=1e-5)
