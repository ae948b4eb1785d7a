"""Perplexity measurement: exp(mean next-token cross-entropy), skip-first-N.

Same definitions as the reference harness (measure_pexplexity.py:69-109), but
TPU-native: instead of one graph launch per token, text is evaluated in
bucketed chunks with per-position logits (forward all_logits mode), so the
whole measurement is a handful of jit calls.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.runtime.buckets import bucket_for


@dataclass
class PerplexityResult:
    loss: float
    perplexity: float
    token_count: int
    skipped: int
    seconds: float
    ms_per_token: float


def measure_perplexity(
    ctx, tokens, ignore_first_n_tokens: int = 0, chunk_size: int = 256
) -> PerplexityResult:
    """ctx: runtime Context; tokens: token ids of the evaluation text."""
    tokens = np.asarray(tokens, dtype=np.int32)
    n = len(tokens)
    if n - ignore_first_n_tokens <= 1:
        raise ValueError("Need at least 2 tokens for evaluation")

    state = ctx.init_state()
    loss_sum = 0.0
    loss_count = 0
    t0 = time.time()
    # positions i predict tokens[i+1]; CE accumulated for i+1 > ignore_first_n
    for start in range(0, n - 1, chunk_size):
        chunk = tokens[start : start + chunk_size]
        t = len(chunk)
        # same padding policy as Context.eval_sequence so chunks share the
        # jit cache with the serving path (one keying scheme repo-wide)
        pad = bucket_for(t)
        padded = np.zeros(pad, np.int32)
        padded[:t] = chunk
        logits, state = fwd.forward(
            ctx._params, ctx.cfg, jnp.asarray(padded), state, jnp.int32(t),
            compute_logits=True, all_logits=True,
        )
        logits = np.asarray(logits[:t], dtype=np.float32)
        targets = tokens[start + 1 : start + t + 1]
        m = len(targets)  # == t except at the very end (t-1 there)
        logp = logits[:m] - _logsumexp(logits[:m])
        nll = -logp[np.arange(m), targets]
        for j in range(m):
            global_i = start + j  # predicting token global_i+1
            if ignore_first_n_tokens == 0 or global_i + 1 >= ignore_first_n_tokens:
                loss_sum += float(nll[j])
                loss_count += 1
    dt = time.time() - t0
    loss = loss_sum / max(loss_count, 1)
    return PerplexityResult(
        loss=loss,
        perplexity=float(np.exp(loss)),
        token_count=n,
        skipped=ignore_first_n_tokens,
        seconds=dt,
        ms_per_token=1000.0 * dt / max(n - 1, 1),
    )


def _logsumexp(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))
