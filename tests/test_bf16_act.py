"""bf16 activation serving mode (models/forward.py::_act_dtype).

The residual stream follows the embedding's storage dtype: bf16 embeddings
(the TPU fast/serving layout, ops/linear.py::fast_dense_dtype) run the layer
stack with bf16 activations — halving the HBM traffic of every materialized
intermediate — while parity-mode f32 embeddings keep bit-identical f32
numerics (every cast is a no-op then). State buffers stay f32 in both modes
(byte-compatible import/export, reference rwkv.h:106-108).

These tests run the bf16 path on CPU (the dtype logic is backend-independent)
and pin: (1) logits track the f32 path closely on every architecture family,
(2) state dtype/layout invariants hold, (3) serial == chunked still holds
within bf16 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models import synth
from rwkv_tpu.runtime import generate as G


def _bf16_copy(params):
    return jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if hasattr(a, "ndim") and a.ndim > 1 and a.dtype == np.float32 else a,
        params,
    )


@pytest.mark.parametrize("ver", ["4.0", "5.2", "6.0", "7.0"])
def test_bf16_acts_track_f32(ver):
    cfg = synth.make_config(ver, n_vocab=512, n_embed=128, n_layer=3)
    p32 = synth.random_params(cfg, dtype=np.float32, seed=1)
    p16 = _bf16_copy(p32)
    assert fwd._act_dtype(p16["emb"]) == jnp.bfloat16
    assert fwd._act_dtype(p32["emb"]) == jnp.float32

    B, T = 2, 24
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 512, (B, T)), jnp.int32)
    st = G.batched_init_state(cfg, B)
    lens = jnp.full((B,), T, jnp.int32)

    l32, s32 = fwd.forward_seq(p32, cfg, toks, st, lens)
    l16, s16 = fwd.forward_seq(p16, cfg, toks, st, lens)
    # state buffers stay f32 regardless of activation dtype
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(s16))
    assert l16.dtype == jnp.float32  # logits always f32 (head accumulates f32)
    c = np.corrcoef(np.asarray(l32).ravel(), np.asarray(l16).ravel())[0, 1]
    assert c > 0.999, f"{ver}: seq logits corr {c}"

    d32, _ = fwd.forward_step(p32, cfg, toks[:, 0], st)
    d16, st16 = fwd.forward_step(p16, cfg, toks[:, 0], st)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(st16))
    c = np.corrcoef(np.asarray(d32).ravel(), np.asarray(d16).ravel())[0, 1]
    assert c > 0.999, f"{ver}: step logits corr {c}"


def test_bf16_serial_equals_chunked():
    """The serial==chunked semantic contract survives bf16 activations."""
    cfg = synth.make_config("7.0", n_vocab=512, n_embed=128, n_layer=3)
    p16 = _bf16_copy(synth.random_params(cfg, dtype=np.float32, seed=3))
    T = 24
    toks = jnp.asarray(np.random.default_rng(1).integers(0, 512, (T,)), jnp.int32)
    st = fwd.init_state(cfg)

    l_seq, s_seq = fwd.forward(p16, cfg, toks, st, T)
    # token-by-token serial eval
    s = st
    for t in range(T):
        l_ser, s = fwd.forward(p16, cfg, toks[t:t + 1], s, 1)
    # bf16 residual rounding accumulates slightly differently between the
    # two paths only through the token-shift carry cast (f32 state read back
    # into bf16); everything else is the same rounding sequence
    np.testing.assert_allclose(np.asarray(l_seq), np.asarray(l_ser),
                               rtol=2e-2, atol=2e-2)
    for a, b in zip(jax.tree.leaves(s_seq), jax.tree.leaves(s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_bf16_decode_loop():
    """On-device decode loop runs under bf16 activations and matches the
    stepwise greedy path token-for-token (argmax is computed on f32 logits,
    so the two paths see identical values)."""
    cfg = synth.make_config("6.0", n_vocab=512, n_embed=128, n_layer=2)
    p16 = _bf16_copy(synth.random_params(cfg, dtype=np.float32, seed=5))
    B = 2
    st = G.batched_init_state(cfg, B)
    tok0 = jnp.zeros((B,), jnp.int32)
    toks, _ = G.greedy_decode(p16, cfg, tok0, st, steps=8)
    st2 = st
    cur = tok0
    got = []
    for _ in range(8):
        logits, st2 = fwd.forward_step(p16, cfg, cur, st2)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        got.append(np.asarray(cur))
    np.testing.assert_array_equal(np.asarray(toks), np.stack(got, axis=1))
