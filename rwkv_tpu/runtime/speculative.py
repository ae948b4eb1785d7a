"""Speculative decoding: a cheap draft model proposes K tokens, the target
model verifies them in ONE sequence pass.

Decode is weight-streaming-bound (docs/KERNELS.md): a single-token step and a
K-token sequence pass stream the same weight bytes, so verifying K drafted
tokens costs the target model one stream instead of K.  With a draft that is
the same checkpoint quantized to int4 (self-speculation) or a genuinely
smaller model, the emitted stream is EXACTLY the target's greedy output —
quality of the big model at a fraction of its bandwidth cost.  The reference
has no equivalent (its explicit per-token graph model cannot express it);
this is a TPU-native serving capability layered on the same forward_seq /
forward_step primitives as everything else.

Per round (all under one jit, scanned over rounds so the host dispatch cost
is amortized the same way Server.step_window amortizes it):

  1. draft replays the pending tokens (last round's emissions) in one
     sequence pass -> logits for the first draft token, draft state advanced
     through pending;
  2. draft greedy-steps K-1 more tokens (throwaway state — rejected tokens
     must not leak into the carried state);
  3. target advances through the same pending tokens in one sequence pass;
     its last-position logits verify draft token 1;
  4. target runs ONE all-logits sequence pass over the K draft tokens from
     the advanced state: position i verifies draft token i+2, the last
     position supplies the bonus token.

  Accepted prefix d_1..d_m (longest match of drafts against the target's
  own greedy choices) plus the target's bonus token become the next round's
  pending buffer, so each round emits between 1 and K+1 tokens and both
  models' carried states are only ever advanced through VERIFIED tokens.

Cost per round: target streams its weights exactly twice (advance + verify,
independent of how many tokens were emitted); draft streams ~K times.  The
scheme pays off whenever draft_bytes * K < target_bytes * (E[accepted] - 1).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models.params import ModelConfig


def _swap(tree):
    return jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), tree)


@partial(jax.jit, static_argnames=("draft_cfg", "target_cfg", "k", "rounds"))
def spec_rounds(
    draft_params,
    draft_cfg: ModelConfig,
    target_params,
    target_cfg: ModelConfig,
    tokens0,
    draft_state,
    target_state,
    k: int = 4,
    rounds: int = 8,
):
    """Run `rounds` speculative rounds for a batch of streams on device.

    tokens0: (B,) int32 next input token per stream (same contract as
    greedy_decode: states have consumed everything BEFORE tokens0).
    draft_state / target_state: per-model state pytrees with leading B axis
    (shapes may differ — the models only need to share n_vocab).

    Returns (tokens (B, rounds, k+1) int32, counts (B, rounds) int32, carry)
    where tokens[b, r, :counts[b, r]] are the tokens emitted in round r and
    `carry` continues generation via spec_rounds_from / finalizes via
    finalize_states. The concatenated per-stream token stream equals the
    target model's greedy decode (forward_seq numerics)."""
    if draft_cfg.n_vocab != target_cfg.n_vocab:
        raise ValueError(
            f"draft and target must share n_vocab, got "
            f"{draft_cfg.n_vocab} vs {target_cfg.n_vocab}"
        )
    B = tokens0.shape[0]
    pend = jnp.zeros((B, k + 1), jnp.int32).at[:, 0].set(tokens0)
    plen = jnp.ones((B,), jnp.int32)
    carry = (pend, plen, draft_state, target_state)
    return _spec_scan(draft_params, draft_cfg, target_params, target_cfg,
                      carry, k, rounds)


@partial(jax.jit, static_argnames=("draft_cfg", "target_cfg", "k", "rounds"))
def spec_rounds_from(
    draft_params, draft_cfg: ModelConfig, target_params,
    target_cfg: ModelConfig, carry, k: int = 4, rounds: int = 8,
):
    """Continue from a carry returned by spec_rounds / spec_rounds_from."""
    return _spec_scan(draft_params, draft_cfg, target_params, target_cfg,
                      carry, k, rounds)


def _spec_scan(draft_params, draft_cfg, target_params, target_cfg, carry,
               k, rounds):
    kk = jnp.arange(k + 1)[None, :]

    def one_round(carry, _):
        pend, plen, dst, tst = carry

        # 1. draft: replay pending, first proposal from the last valid logits
        dlog, dst2 = fwd.forward_seq(draft_params, draft_cfg, pend, dst, plen)
        d1 = jnp.argmax(dlog, axis=-1).astype(jnp.int32)

        # 2. draft: K-1 greedy steps; the stepped state is throwaway (its
        #    tokens are unverified), only dst2 (after pending) is carried
        if k > 1:
            def dstep(c, _):
                tok, st = c
                lg, st = fwd.forward_step(draft_params, draft_cfg, tok, st,
                                          compute_logits=True, layer_major=True)
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                return (nxt, st), nxt

            # unrolled like greedy_decode's step window: XLA pipelines the
            # draft's weight streaming across steps (rolled scans of
            # dependent kernel calls serialize — docs/KERNELS.md)
            (_, _), rest = jax.lax.scan(dstep, (d1, _swap(dst2)), None,
                                        length=k - 1, unroll=min(8, k - 1))
            drafts = jnp.concatenate([d1[:, None], rest.T], axis=1)  # (B, k)
        else:
            drafts = d1[:, None]

        # 3. target: advance through pending; last-position logits check d_1
        tlog, tst2 = fwd.forward_seq(target_params, target_cfg, pend, tst, plen)

        # 4. target: one all-logits pass over the drafts checks d_2..d_k and
        #    supplies the bonus token; its end state is throwaway
        vlog, _ = fwd.forward_seq(
            target_params, target_cfg, drafts, tst2,
            jnp.full_like(plen, k), all_logits=True,
        )
        tgt = jnp.concatenate(
            [jnp.argmax(tlog, axis=-1)[:, None], jnp.argmax(vlog, axis=-1)],
            axis=1,
        ).astype(jnp.int32)                                          # (B, k+1)

        accept = (drafts == tgt[:, :k]).astype(jnp.int32)
        m = jnp.cumprod(accept, axis=1).sum(axis=1)                  # (B,)
        bonus = jnp.take_along_axis(tgt, m[:, None], axis=1)
        d_pad = jnp.pad(drafts, ((0, 0), (0, 1)))
        out = jnp.where(kk < m[:, None], d_pad,
                        jnp.where(kk == m[:, None], bonus, 0)).astype(jnp.int32)
        cnt = (m + 1).astype(jnp.int32)
        return (out, cnt, dst2, tst2), (out, cnt)

    carry, (toks, cnts) = jax.lax.scan(one_round, carry, None, length=rounds)
    # (rounds, B, ...) -> (B, rounds, ...)
    return jnp.swapaxes(toks, 0, 1), cnts.T, carry


@partial(jax.jit, static_argnames=("cfg", "k", "rounds", "ngram", "window"))
def spec_rounds_lookup(
    params,
    cfg: ModelConfig,
    tokens0,
    state,
    history,
    hist_len,
    k: int = 4,
    rounds: int = 8,
    ngram: int = 3,
    window: int = 512,
):
    """Draft-FREE speculation (prompt lookup): propose the K tokens that
    followed the most recent occurrence of the current n-gram in a ring
    buffer of the stream's own context, verify with the same two target
    passes as spec_rounds. Zero draft cost — a round is exactly two target
    weight streams for 1..K+1 emitted tokens, so repetitive continuations
    (code, structured text, chat templates) decode up to (K+1)/2 x faster
    while still emitting the target's EXACT greedy stream (a bad proposal
    only shrinks the round, never changes a token).

    history: (B, W0) int32 recent context per stream (W0 <= window), e.g.
    the prompt; hist_len: (B,) valid counts. tokens0/state as spec_rounds.

    Returns (tokens (B, rounds, k+1), counts (B, rounds), carry) — continue
    with spec_rounds_lookup_from."""
    B, w0 = history.shape
    if w0 >= window:
        raise ValueError(
            f"history must be narrower than window ({w0} >= {window}); "
            f"pass the last window-1 tokens")
    buf = jnp.zeros((B, window), jnp.int32)
    buf = buf.at[:, :w0].set(history.astype(jnp.int32))
    buf = jnp.where(jnp.arange(window)[None, :] < hist_len[:, None], buf, 0)
    buf = buf.at[jnp.arange(B), hist_len].set(tokens0)
    wpos = (hist_len + 1).astype(jnp.int32)
    nvalid = wpos
    pend = jnp.zeros((B, k + 1), jnp.int32).at[:, 0].set(tokens0)
    plen = jnp.ones((B,), jnp.int32)
    carry = (pend, plen, state, buf, wpos % window, jnp.minimum(nvalid, window))
    return _lookup_scan(params, cfg, carry, k, rounds, ngram, window)


@partial(jax.jit, static_argnames=("cfg", "k", "rounds", "ngram", "window"))
def spec_rounds_lookup_from(params, cfg: ModelConfig, carry, k: int = 4,
                            rounds: int = 8, ngram: int = 3,
                            window: int = 512):
    """Continue from a carry returned by spec_rounds_lookup(_from)."""
    return _lookup_scan(params, cfg, carry, k, rounds, ngram, window)


def _lookup_scan(params, cfg, carry, k, rounds, ngram, window):
    kk = jnp.arange(k + 1)[None, :]
    W = window
    B = carry[0].shape[0]
    brow = jnp.arange(B)[:, None]

    def one_round(carry, _):
        pend, plen, st, buf, wpos, nvalid = carry

        # 1. propose from the ring buffer: best (score, recency) n-gram match
        suf_idx = (wpos[:, None] - ngram + jnp.arange(ngram)[None, :]) % W
        suffix = jnp.take_along_axis(buf, suf_idx, axis=1)        # (B, ngram)
        score = jnp.zeros((B, W), jnp.int32)
        for j in range(ngram):
            # roll(buf, s)[p] == buf[(p - s) % W]
            score = score + (jnp.roll(buf, ngram - 1 - j, axis=1)
                             == suffix[:, j:j + 1]).astype(jnp.int32)
        pos = jnp.arange(W)[None, :]
        recency = (pos - wpos[:, None]) % W        # most recent -> largest
        valid = (pos < nvalid[:, None]) & (pos != (wpos[:, None] - 1) % W)
        rank = jnp.where(valid, score * W + recency, -1)
        p_best = jnp.argmax(rank, axis=1).astype(jnp.int32)        # (B,)
        d_idx = (p_best[:, None] + 1 + jnp.arange(k)[None, :]) % W
        drafts = jnp.take_along_axis(buf, d_idx, axis=1)           # (B, k)

        # 2-3. same two target passes as spec_rounds
        tlog, st2 = fwd.forward_seq(params, cfg, pend, st, plen)
        vlog, _ = fwd.forward_seq(params, cfg, drafts, st2,
                                  jnp.full_like(plen, k), all_logits=True)
        tgt = jnp.concatenate(
            [jnp.argmax(tlog, axis=-1)[:, None], jnp.argmax(vlog, axis=-1)],
            axis=1,
        ).astype(jnp.int32)
        accept = (drafts == tgt[:, :k]).astype(jnp.int32)
        m = jnp.cumprod(accept, axis=1).sum(axis=1)
        bonus = jnp.take_along_axis(tgt, m[:, None], axis=1)
        d_pad = jnp.pad(drafts, ((0, 0), (0, 1)))
        out = jnp.where(kk < m[:, None], d_pad,
                        jnp.where(kk == m[:, None], bonus, 0)).astype(jnp.int32)
        cnt = (m + 1).astype(jnp.int32)

        # 4. append the emissions to the ring buffer
        w_idx = (wpos[:, None] + jnp.arange(k + 1)[None, :]) % W
        old = jnp.take_along_axis(buf, w_idx, axis=1)
        buf = buf.at[brow, w_idx].set(jnp.where(kk < cnt[:, None], out, old))
        wpos = (wpos + cnt) % W
        nvalid = jnp.minimum(nvalid + cnt, W)
        return (out, cnt, st2, buf, wpos, nvalid), (out, cnt)

    carry, (toks, cnts) = jax.lax.scan(one_round, carry, None, length=rounds)
    return jnp.swapaxes(toks, 0, 1), cnts.T, carry


@partial(jax.jit, static_argnames=("draft_cfg", "target_cfg", "k", "rounds",
                                   "top_k"))
def spec_rounds_sampled(
    draft_params,
    draft_cfg: ModelConfig,
    target_params,
    target_cfg: ModelConfig,
    tokens0,
    draft_state,
    target_state,
    key,
    k: int = 4,
    rounds: int = 8,
    temperature: float = 1.0,
    top_p: float = 0.8,
    top_k: int = 512,
):
    """Sampled speculative rounds (rejection sampling): the emitted stream is
    distributed EXACTLY as the target's sampled_decode distribution — the
    top-k-windowed nucleus transform with probs ** (1/temperature), the
    reference sampling semantics — for ANY draft.

    The draft proposes from its own plain temperature softmax (full support,
    no sort needed, so q at an arbitrary token is one gather+logsumexp).
    Draft token i is accepted with prob min(1, p(d_i)/q(d_i)); on the first
    rejection the token is resampled from the normalized residual
    max(p - q, 0), whose support lies inside the target's top-k window (p is
    zero outside it), and padding q with a zeros row at position k makes the
    full-acceptance bonus draw (sample from p itself) the same gather.

    Returns (tokens (B, rounds, k+1), counts (B, rounds), carry) like
    spec_rounds."""
    if draft_cfg.n_vocab != target_cfg.n_vocab:
        raise ValueError(
            f"draft and target must share n_vocab, got "
            f"{draft_cfg.n_vocab} vs {target_cfg.n_vocab}"
        )
    B = tokens0.shape[0]
    pend = jnp.zeros((B, k + 1), jnp.int32).at[:, 0].set(tokens0)
    plen = jnp.ones((B,), jnp.int32)
    carry = (pend, plen, draft_state, target_state)
    return _sampled_scan(draft_params, draft_cfg, target_params, target_cfg,
                         carry, key, k, rounds, temperature, top_p, top_k)


@partial(jax.jit, static_argnames=("draft_cfg", "target_cfg", "k", "rounds",
                                   "top_k"))
def spec_rounds_sampled_from(
    draft_params, draft_cfg: ModelConfig, target_params,
    target_cfg: ModelConfig, carry, key, k: int = 4, rounds: int = 8,
    temperature: float = 1.0, top_p: float = 0.8, top_k: int = 512,
):
    """Continue sampled speculation from a carry returned by
    spec_rounds_sampled / spec_rounds_sampled_from."""
    return _sampled_scan(draft_params, draft_cfg, target_params, target_cfg,
                         carry, key, k, rounds, temperature, top_p, top_k)


def _sampled_scan(draft_params, draft_cfg, target_params, target_cfg, carry,
                  key, k, rounds, temperature, top_p, top_k):
    kw = min(top_k, target_cfg.n_vocab)
    kk = jnp.arange(k + 1)[None, :]
    temp = jnp.maximum(jnp.float32(temperature), 1e-6)

    def one_round(carry, rkey):
        pend, plen, dst, tst = carry
        kd, ka, kl = jax.random.split(rkey, 3)

        # draft: replay pending, then sample k proposals from softmax(l/temp)
        dlog0, dst2 = fwd.forward_seq(draft_params, draft_cfg, pend, dst, plen)
        d1 = jax.random.categorical(jax.random.fold_in(kd, 0),
                                    dlog0 / temp, axis=-1).astype(jnp.int32)
        if k > 1:
            def dstep(c, i):
                tok, st = c
                lg, st = fwd.forward_step(draft_params, draft_cfg, tok, st,
                                          compute_logits=True, layer_major=True)
                nxt = jax.random.categorical(jax.random.fold_in(kd, i),
                                             lg / temp, axis=-1).astype(jnp.int32)
                return (nxt, st), (lg, nxt)

            (_, _), (dlogs, rest) = jax.lax.scan(
                dstep, (d1, _swap(dst2)), jnp.arange(1, k),
                unroll=min(8, k - 1))
            drafts = jnp.concatenate([d1[:, None], rest.T], axis=1)
            q_logits = jnp.concatenate([dlog0[None], dlogs], axis=0)
        else:
            drafts = d1[:, None]
            q_logits = dlog0[None]
        q_logits = jnp.swapaxes(q_logits, 0, 1)                  # (B, k, V)

        # target: advance through pending + one verify pass over the drafts
        tlog, tst2 = fwd.forward_seq(target_params, target_cfg, pend, tst, plen)
        vlog, _ = fwd.forward_seq(target_params, target_cfg, drafts, tst2,
                                  jnp.full_like(plen, k), all_logits=True)
        t_logits = jnp.concatenate([tlog[:, None], vlog], axis=1)  # (B,k+1,V)

        # target dist: EXACT sampled_decode transform on the top-k window
        vals, idx = jax.lax.top_k(t_logits, kw)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < top_p
        p_win = jax.nn.softmax(jnp.where(keep, vals / temp, -jnp.inf), axis=-1)

        # draft dist at the drafted tokens and at the target's window indices
        q_lse = jax.scipy.special.logsumexp(q_logits / temp, axis=-1)
        q_at_d = jnp.exp(
            jnp.take_along_axis(q_logits, drafts[..., None], axis=-1)[..., 0]
            / temp - q_lse)                                       # (B, k)
        p_at_d = jnp.where(idx[:, :k, :] == drafts[:, :, None],
                           p_win[:, :k, :], 0.0).sum(axis=-1)     # (B, k)

        # accept d_i iff u < p/q  (as u*q < p: no division, q > 0 by sampling)
        u = jax.random.uniform(ka, p_at_d.shape)
        accept = (u * q_at_d < p_at_d).astype(jnp.int32)
        m = jnp.cumprod(accept, axis=1).sum(axis=1)

        # residual (p - q)+ at the reject position; zeros-padded q makes the
        # full-accept bonus (sample from p at position k) the same formula
        q_at_idx = jnp.exp(
            jnp.take_along_axis(q_logits, idx[:, :k, :], axis=-1)
            / temp - q_lse[..., None])                            # (B, k, kw)
        q_at_idx = jnp.concatenate(
            [q_at_idx, jnp.zeros_like(q_at_idx[:, :1])], axis=1)  # (B,k+1,kw)
        r = jnp.maximum(p_win - q_at_idx, 0.0) + 1e-30
        r_m = jnp.take_along_axis(r, m[:, None, None], axis=1)[:, 0]
        idx_m = jnp.take_along_axis(idx, m[:, None, None], axis=1)[:, 0]
        choice = jax.random.categorical(kl, jnp.log(r_m), axis=-1)
        last = jnp.take_along_axis(idx_m, choice[:, None], axis=1)[:, 0]

        d_pad = jnp.pad(drafts, ((0, 0), (0, 1)))
        out = jnp.where(kk < m[:, None], d_pad,
                        jnp.where(kk == m[:, None], last[:, None].astype(jnp.int32),
                                  0)).astype(jnp.int32)
        cnt = (m + 1).astype(jnp.int32)
        return (out, cnt, dst2, tst2), (out, cnt)

    keys = jax.random.split(key, rounds)
    carry, (toks, cnts) = jax.lax.scan(one_round, carry, keys)
    return jnp.swapaxes(toks, 0, 1), cnts.T, carry


@partial(jax.jit, static_argnames=("draft_cfg", "target_cfg"))
def finalize_states(draft_params, draft_cfg: ModelConfig, target_params,
                    target_cfg: ModelConfig, carry):
    """Fold a spec carry into (draft_state, target_state, last_token) with
    the greedy_decode state contract: states have consumed every emitted
    token EXCEPT last_token (the next input)."""
    pend, plen, dst, tst = carry
    consumed = plen - 1                      # leave the newest token pending
    _, dst = fwd.forward_seq(draft_params, draft_cfg, pend, dst, consumed,
                             compute_logits=False)
    _, tst = fwd.forward_seq(target_params, target_cfg, pend, tst, consumed,
                             compute_logits=False)
    last = jnp.take_along_axis(pend, (plen - 1)[:, None], axis=1)[:, 0]
    return dst, tst, last


def speculative_generate(
    draft_params, draft_cfg: ModelConfig, target_params,
    target_cfg: ModelConfig, tokens0, draft_state, target_state,
    steps: int, k: int = 4, rounds_per_dispatch: int = 8,
    temperature: float | None = None, top_p: float = 0.8, top_k: int = 512,
    key=None,
):
    """Host loop: dispatch speculative rounds until every stream has emitted
    at least `steps` tokens. Returns (tokens (B, steps) int32 ndarray,
    accept_rate float, carry). With temperature=None the token stream equals
    the target model's greedy decode; otherwise it samples from the target's
    exact sampled_decode distribution (key required). accept_rate is mean
    accepted drafts / k."""
    import numpy as np

    if temperature is not None and key is None:
        raise ValueError("sampled speculative_generate needs a PRNG `key`")
    B = int(tokens0.shape[0])
    done = np.zeros(B, np.int64)
    chunks = [[] for _ in range(B)]
    carry = None
    n_rounds = 0
    acc_sum = 0.0
    dispatch = 0
    while done.min() < steps:
        if temperature is None:
            if carry is None:
                toks, cnts, carry = spec_rounds(
                    draft_params, draft_cfg, target_params, target_cfg,
                    tokens0, draft_state, target_state, k=k,
                    rounds=rounds_per_dispatch)
            else:
                toks, cnts, carry = spec_rounds_from(
                    draft_params, draft_cfg, target_params, target_cfg,
                    carry, k=k, rounds=rounds_per_dispatch)
        else:
            dkey = jax.random.fold_in(key, dispatch)
            if carry is None:
                toks, cnts, carry = spec_rounds_sampled(
                    draft_params, draft_cfg, target_params, target_cfg,
                    tokens0, draft_state, target_state, dkey, k=k,
                    rounds=rounds_per_dispatch, temperature=temperature,
                    top_p=top_p, top_k=top_k)
            else:
                toks, cnts, carry = spec_rounds_sampled_from(
                    draft_params, draft_cfg, target_params, target_cfg,
                    carry, dkey, k=k, rounds=rounds_per_dispatch,
                    temperature=temperature, top_p=top_p, top_k=top_k)
        dispatch += 1
        toks = np.asarray(toks)
        cnts = np.asarray(cnts)
        for b in range(B):
            for r in range(cnts.shape[1]):
                chunks[b].append(toks[b, r, : cnts[b, r]])
        done += cnts.sum(axis=1)
        n_rounds += cnts.shape[1]
        acc_sum += float(cnts.mean(axis=0).sum())
    out = np.stack([np.concatenate(c)[:steps] for c in chunks])
    accept_rate = (acc_sum / n_rounds - 1.0) / k if k else 0.0
    return out, accept_rate, carry


def lookup_generate(
    params, cfg: ModelConfig, tokens0, state, history, hist_len, steps: int,
    k: int = 4, rounds_per_dispatch: int = 8, ngram: int = 3,
    window: int = 512,
):
    """Host loop for draft-free prompt-lookup speculation (greedy). Returns
    (tokens (B, steps) int32 ndarray, accept_rate, carry); the stream equals
    the target's greedy decode."""
    import numpy as np

    B = int(tokens0.shape[0])
    done = np.zeros(B, np.int64)
    chunks = [[] for _ in range(B)]
    carry = None
    n_rounds = 0
    acc_sum = 0.0
    while done.min() < steps:
        if carry is None:
            toks, cnts, carry = spec_rounds_lookup(
                params, cfg, tokens0, state, history, hist_len, k=k,
                rounds=rounds_per_dispatch, ngram=ngram, window=window)
        else:
            toks, cnts, carry = spec_rounds_lookup_from(
                params, cfg, carry, k=k, rounds=rounds_per_dispatch,
                ngram=ngram, window=window)
        toks = np.asarray(toks)
        cnts = np.asarray(cnts)
        for b in range(B):
            for r in range(cnts.shape[1]):
                chunks[b].append(toks[b, r, : cnts[b, r]])
        done += cnts.sum(axis=1)
        n_rounds += cnts.shape[1]
        acc_sum += float(cnts.mean(axis=0).sum())
    out = np.stack([np.concatenate(c)[:steps] for c in chunks])
    accept_rate = (acc_sum / n_rounds - 1.0) / k if k else 0.0
    return out, accept_rate, carry
