"""Speculative decoding: the emitted stream must EQUAL the target's greedy
decode no matter how good or bad the draft is — the draft only changes how
many tokens each round emits, never which tokens."""

import numpy as np

import jax
import jax.numpy as jnp

from rwkv_tpu.models import params as P
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.runtime import generate as G
from rwkv_tpu.runtime import speculative as S
from tests.common import fixture


def _tiny(batch):
    cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
    prm = jax.tree.map(jnp.asarray, prm)
    return cfg, prm, G.batched_init_state(cfg, batch)


def test_self_draft_accepts_everything():
    """Draft == target: every round must accept all k drafts + bonus."""
    cfg, prm, state = _tiny(2)
    tok0 = jnp.asarray([34, 66], jnp.int32)
    toks, cnts, _ = S.spec_rounds(prm, cfg, prm, cfg, tok0, state,
                                  G.batched_init_state(cfg, 2), k=3, rounds=4)
    assert toks.shape == (2, 4, 4) and cnts.shape == (2, 4)
    assert np.asarray(cnts).min() == 4  # k+1 every round

    greedy, _ = G.greedy_decode(prm, cfg, tok0, G.batched_init_state(cfg, 2),
                                steps=16)
    flat = np.asarray(toks).reshape(2, 16)
    assert np.array_equal(flat, np.asarray(greedy))


def test_quantized_draft_matches_target_greedy():
    """int8 self-speculation: stream == target greedy, decent accept rate."""
    cfg, prm, state = _tiny(2)
    draft = L.quantize_params_device(prm)
    tok0 = jnp.asarray([12, 99], jnp.int32)
    steps = 24
    out, accept, _ = S.speculative_generate(
        draft, cfg, prm, cfg, tok0, state, G.batched_init_state(cfg, 2),
        steps=steps, k=3, rounds_per_dispatch=3)
    greedy, _ = G.greedy_decode(prm, cfg, tok0, G.batched_init_state(cfg, 2),
                                steps=steps)
    assert np.array_equal(out, np.asarray(greedy))
    assert 0.0 <= accept <= 1.0


def test_cross_model_draft_exactness():
    """A draft with a DIFFERENT architecture (depth/width) still yields the
    target's exact greedy stream — rejection handling, not draft quality,
    carries the correctness."""
    tcfg = synth.make_config("7.0", n_vocab=256, n_embed=128, n_layer=2)
    dcfg = synth.make_config("7.0", n_vocab=256, n_embed=64, n_layer=1)
    tprm = synth.random_params(tcfg, seed=0)
    dprm = synth.random_params(dcfg, seed=1)
    tprm = jax.tree.map(jnp.asarray, tprm)
    dprm = jax.tree.map(jnp.asarray, dprm)
    B, steps = 3, 17
    tok0 = jnp.asarray([5, 200, 77], jnp.int32)
    out, accept, _ = S.speculative_generate(
        dprm, dcfg, tprm, tcfg, tok0,
        G.batched_init_state(dcfg, B), G.batched_init_state(tcfg, B),
        steps=steps, k=4, rounds_per_dispatch=2)
    greedy, _ = G.greedy_decode(tprm, tcfg, tok0,
                                G.batched_init_state(tcfg, B), steps=steps)
    assert np.array_equal(out, np.asarray(greedy))


def test_finalize_states_continue_greedy():
    """States folded by finalize_states continue exactly like a plain greedy
    decode that produced the same prefix."""
    cfg, prm, state = _tiny(1)
    tok0 = jnp.asarray([34], jnp.int32)
    toks, cnts, carry = S.spec_rounds(prm, cfg, prm, cfg, tok0, state,
                                      G.batched_init_state(cfg, 1), k=3,
                                      rounds=2)
    n = int(np.asarray(cnts).sum())
    emitted = np.asarray(toks).reshape(1, -1)[:, :n]

    dst, tst, last = S.finalize_states(prm, cfg, prm, cfg, carry)
    cont, _ = G.greedy_decode(prm, cfg, last, tst, steps=8)

    ref, _ = G.greedy_decode(prm, cfg, tok0, G.batched_init_state(cfg, 1),
                             steps=n + 8)
    ref = np.asarray(ref)
    assert np.array_equal(emitted, ref[:, :n])
    assert np.array_equal(np.asarray(cont), ref[:, n:])


def test_vocab_mismatch_raises():
    cfg, prm, state = _tiny(1)
    bad = synth.make_config("7.0", n_vocab=128, n_embed=64, n_layer=1)
    bprm = jax.tree.map(jnp.asarray, synth.random_params(bad, seed=2))
    try:
        S.spec_rounds(bprm, bad, prm, cfg, jnp.zeros(1, jnp.int32),
                      G.batched_init_state(bad, 1), state, k=2, rounds=1)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "n_vocab" in str(e)
