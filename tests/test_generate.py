"""On-device generation loops: greedy + sampled decode."""

import numpy as np

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models import params as P
from rwkv_tpu.runtime import generate as G
from tests.common import fixture


def _setup(batch):
    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    prm = jax.tree.map(jnp.asarray, prm)
    state = G.batched_init_state(cfg, batch)
    return cfg, prm, state


def test_greedy_decode_matches_stepwise():
    cfg, prm, state = _setup(2)
    tok0 = jnp.asarray([34, 66], jnp.int32)
    toks, _ = G.greedy_decode(prm, cfg, tok0, state, steps=8)
    assert toks.shape == (2, 8)

    # stepwise reference for stream 0
    st = fwd.init_state(cfg)
    logits, st = fwd.forward(prm, cfg, jnp.asarray([34], jnp.int32), st, jnp.int32(1))
    expect = []
    for _ in range(8):
        t = int(jnp.argmax(logits))
        expect.append(t)
        logits, st = fwd.forward(prm, cfg, jnp.asarray([t], jnp.int32), st, jnp.int32(1))
    assert list(np.asarray(toks)[0]) == expect


def test_sampled_decode_valid_and_deterministic_per_key():
    cfg, prm, state = _setup(3)
    tok0 = jnp.zeros(3, jnp.int32)
    key = jax.random.PRNGKey(0)
    t1, _ = G.sampled_decode(prm, cfg, tok0, state, key, steps=8, temperature=1.0, top_p=0.8)
    t2, _ = G.sampled_decode(prm, cfg, tok0, state, key, steps=8, temperature=1.0, top_p=0.8)
    assert t1.shape == (3, 8)
    assert np.array_equal(np.asarray(t1), np.asarray(t2))  # same key -> same tokens
    assert (np.asarray(t1) >= 0).all() and (np.asarray(t1) < cfg.n_vocab).all()
    t3, _ = G.sampled_decode(prm, cfg, tok0, state, jax.random.PRNGKey(1), steps=8)
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))  # different key differs


def test_sampled_decode_tiny_top_p_is_greedy():
    cfg, prm, state = _setup(2)
    tok0 = jnp.asarray([34, 66], jnp.int32)
    greedy, _ = G.greedy_decode(prm, cfg, tok0, state, steps=8)
    sampled, _ = G.sampled_decode(
        prm, cfg, tok0, state, jax.random.PRNGKey(0), steps=8, temperature=1.0, top_p=1e-6
    )
    assert np.array_equal(np.asarray(greedy), np.asarray(sampled))
