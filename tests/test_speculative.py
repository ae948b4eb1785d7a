"""Speculative decoding: the emitted stream must EQUAL the target's greedy
decode no matter how good or bad the draft is — the draft only changes how
many tokens each round emits, never which tokens."""

import numpy as np
import pytest

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


@pytest.mark.slow
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


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("version", ["4.0", "5.2", "6.0", "7.0"])
def test_cross_model_draft_exactness(version):
    """A draft with a DIFFERENT architecture (depth/width) still yields the
    target's exact greedy stream — rejection handling, not draft quality,
    carries the correctness. Parametrized over every model family (v4's
    exp-max state accumulators ride the same round machinery)."""
    tcfg = synth.make_config(version, n_vocab=256, n_embed=128, n_layer=2)
    dcfg = synth.make_config(version, n_vocab=256, n_embed=64, n_layer=1)
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sampled_greedy_limit_matches_greedy():
    """temperature -> 0 collapses sampled speculation to the greedy stream,
    for an int8 draft (accept/reject both exercised on near-ties)."""
    cfg, prm, state = _tiny(2)
    draft = L.quantize_params_device(prm)
    tok0 = jnp.asarray([34, 66], jnp.int32)
    toks, cnts, _ = S.spec_rounds_sampled(
        draft, cfg, prm, cfg, tok0, state, G.batched_init_state(cfg, 2),
        jax.random.PRNGKey(7), k=3, rounds=6, temperature=1e-6, top_p=0.9)
    toks, cnts = np.asarray(toks), np.asarray(cnts)
    greedy, _ = G.greedy_decode(prm, cfg, tok0, G.batched_init_state(cfg, 2),
                                steps=24)
    greedy = np.asarray(greedy)
    for b in range(2):
        flat = np.concatenate([toks[b, r, : cnts[b, r]] for r in range(6)])
        n = min(len(flat), 24)
        assert np.array_equal(flat[:n], greedy[b, :n])


@pytest.mark.slow
def test_sampled_distribution_fidelity():
    """Chi-square: the FIRST token emitted by sampled speculation (int8
    draft) must be distributed exactly as the target's sampled_decode
    transform — the rejection-sampling correctness claim, measured."""
    cfg, prm, state = _tiny(256)
    draft = L.quantize_params_device(prm)
    B, calls, k = 256, 24, 2
    temperature, top_p = 1.2, 0.9
    tok0 = jnp.full((B,), 34, jnp.int32)
    dstate = G.batched_init_state(cfg, B)

    draws = []
    for i in range(calls):
        toks, cnts, _ = S.spec_rounds_sampled(
            draft, cfg, prm, cfg, tok0, dstate,
            G.batched_init_state(cfg, B), jax.random.PRNGKey(5000 + i),
            k=k, rounds=1, temperature=temperature, top_p=top_p)
        draws.append(np.asarray(toks)[:, 0, 0])
    V = cfg.n_vocab
    counts = np.bincount(np.concatenate(draws), minlength=V).astype(np.float64)
    N = counts.sum()

    # exact target distribution: sampled_decode's top-k-window nucleus
    from rwkv_tpu.models import forward as fwd
    logits, _ = fwd.forward(prm, cfg, jnp.asarray([34], jnp.int32),
                            jax.tree.map(lambda x: x[0], state), jnp.int32(1))
    lg = np.asarray(logits, np.float64).ravel()
    order = np.argsort(-lg)
    vals = lg[order]
    probs = np.exp(vals - vals.max())
    probs /= probs.sum()
    keep = (np.cumsum(probs) - probs) < top_p
    w = np.where(keep, np.exp(vals / temperature - (vals / temperature).max()), 0.0)
    host_p = np.zeros(V)
    host_p[order] = w / w.sum()

    exp = host_p * N
    big = exp >= 5
    stat = float((((counts[big] - exp[big]) ** 2) / exp[big]).sum())
    tail_exp, tail_obs = exp[~big].sum(), counts[~big].sum()
    dof = int(big.sum()) - 1
    if tail_exp >= 5:
        stat += (tail_obs - tail_exp) ** 2 / tail_exp
        dof += 1
    assert stat < dof + 6 * np.sqrt(2 * dof) + 10, (stat, dof)


@pytest.mark.slow
def test_lookup_speculation_exact_and_accepting():
    """Draft-free prompt-lookup speculation: exact greedy stream, and the
    tiny model's cyclic continuation ('the stress and the stress...') must
    give the n-gram matcher real acceptance."""
    cfg, prm, state = _tiny(2)
    prompt = list(b'"in the beginning')
    B = 2
    pre = jnp.asarray([prompt[:-1]] * B, jnp.int32)
    lens = jnp.full((B,), pre.shape[1], jnp.int32)
    _, st = G.prefill(prm, cfg, pre, state, lens)
    tok0 = jnp.full((B,), prompt[-1], jnp.int32)

    steps = 40
    out, accept, _ = S.lookup_generate(
        prm, cfg, tok0, st, pre, lens, steps=steps, k=4,
        rounds_per_dispatch=4, window=128)

    st2 = G.batched_init_state(cfg, B)
    _, st2 = G.prefill(prm, cfg, pre, st2, lens)
    greedy, _ = G.greedy_decode(prm, cfg, tok0, st2, steps=steps)
    assert np.array_equal(out, np.asarray(greedy))
    assert accept > 0.25, accept  # cyclic text: lookup must actually bite


@pytest.mark.slow
def test_generate_completions_draft_cli(capsys, monkeypatch):
    """The --draft CLI surface: batched self-speculative generation end to
    end (greedy: both generations identical and English-ish)."""
    import sys as _sys

    from rwkv_tpu.tools import generate_completions as GC

    monkeypatch.setattr(_sys, "argv", [
        "generate_completions", fixture("tiny-rwkv-5v2-730K-FP32.bin"),
        "--prompt", '"in the beginning', "--count", "2", "--tokens", "12",
        "--temperature", "0.0", "--draft", "int8", "--spec-k", "3"])
    GC.main()
    out = capsys.readouterr().out
    assert "draft accept rate" in out and "Generation 1" in out


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
