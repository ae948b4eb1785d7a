"""On-device generation loops.

Single-token eval from Python costs one host->device dispatch per token (the
reference has the same structure: one graph launch per token). For throughput
serving and benchmarking, `greedy_decode` runs the whole decode loop on device
under one jit (lax.scan over steps), so the host is out of the hot path —
a capability ggml's explicit-graph model cannot express.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models.params import ModelConfig


def _cast_heads(state, dtype):
    """Cast the (large) wkv heads state to `dtype`, leaving the small f32
    token-shift vectors (and v4's exp-max accumulators) untouched."""
    if "heads" not in state:
        return state
    out = dict(state)
    out["heads"] = state["heads"].astype(dtype)
    return out


@partial(jax.jit, static_argnames=("cfg", "steps", "state_bf16"))
def greedy_decode(params, cfg: ModelConfig, tokens0, state, steps: int,
                  state_bf16: bool = False):
    """Greedy-decode `steps` tokens for a batch of streams entirely on device.

    tokens0: (B,) int32 last prompt token per stream; state leaves have a
    leading B axis. Returns (tokens (B, steps), final_state).

    state_bf16=True carries the wkv heads state in bf16 BETWEEN steps (f32
    compute inside each step, rounded on the carry): the (L, B, H, S, S)
    state is the dominant HBM term at large batch (read+write ~3.3 GB/step
    at B=128 on a 1.5B model) and the loop carry materializes in HBM every
    step. The caller's state contract stays f32 at both ends; quality drift
    is pinned by tests/test_forward_step.py's teacher-forced drift test."""

    def step(carry, _):
        tok, st = carry
        logits, st = fwd.forward_step(params, cfg, tok, st, compute_logits=True,
                                      layer_major=True)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, st), nxt

    # keep the state layer-major inside the loop (one transpose per call,
    # not two full-state copies per step); unroll a window of steps so XLA
    # pipelines weight streaming across steps (+23% with the unrolled layer
    # loop on a 1.5B int8 config)
    st_lm = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state)
    if state_bf16:
        st_lm = _cast_heads(st_lm, jnp.bfloat16)
    (_, st_lm), toks = jax.lax.scan(step, (tokens0, st_lm), None, length=steps,
                                    unroll=min(8, steps))
    if state_bf16:
        st_lm = _cast_heads(st_lm, jnp.float32)
    state = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), st_lm)
    return toks.T, state


@partial(jax.jit, static_argnames=("cfg", "steps", "top_k", "state_bf16"))
def sampled_decode(
    params,
    cfg: ModelConfig,
    tokens0,
    state,
    key,
    steps: int,
    temperature: float = 1.0,
    top_p: float = 0.8,
    top_k: int = 512,
    state_bf16: bool = False,
):
    """Temperature + nucleus sampling fully on device (reference semantics
    from sampling.py:10-52, with the nucleus evaluated inside a top-k window —
    exact whenever the nucleus holds fewer than top_k tokens, which it does
    for any practical top_p).

    tokens0: (B,) int32; key: jax PRNG key. Returns (tokens (B, steps), state).
    """

    def step(carry, k):
        tok, st = carry
        logits, st = fwd.forward_step(params, cfg, tok, st, compute_logits=True,
                                      layer_major=True)
        vals, idx = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))  # sorted desc
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (inclusive)
        keep = (cum - probs) < top_p
        logp = jnp.where(keep, vals, -jnp.inf) / jnp.maximum(temperature, 1e-6)
        choice = jax.random.categorical(k, logp, axis=-1)   # (B,)
        nxt = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
        return (nxt, st), nxt

    keys = jax.random.split(key, steps)
    st_lm = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state)
    if state_bf16:
        st_lm = _cast_heads(st_lm, jnp.bfloat16)
    (_, st_lm), toks = jax.lax.scan(step, (tokens0, st_lm), keys,
                                    unroll=min(8, steps))
    if state_bf16:
        st_lm = _cast_heads(st_lm, jnp.float32)
    state = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), st_lm)
    return toks.T, state


@partial(jax.jit, static_argnames=("cfg",))
def prefill(params, cfg: ModelConfig, tokens, state, lengths):
    """Batched chunk prefill: tokens (B, T), returns (last_logits (B, V), state)."""
    return fwd.forward_batch(params, cfg, tokens, state, lengths, compute_logits=True)


def batched_init_state(cfg: ModelConfig, batch: int):
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), fwd.init_state(cfg)
    )
