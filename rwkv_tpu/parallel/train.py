"""Sharded training step (beyond-reference capability).

The reference is inference-only; since the forward pass here is pure JAX,
autodiff gives training for free. This module provides a CE-loss train step
that jit-compiles over a ('dp','tp') mesh with the same param/state shardings
as inference — used by the multi-chip dry run and available for fine-tuning
dense (non-quantized) checkpoints.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models.params import ModelConfig


def next_token_loss(params, cfg: ModelConfig, tokens, lengths):
    """Mean next-token cross-entropy over valid positions.

    tokens: (B, T) int32; lengths: (B,). Fresh zero state per sequence
    (document-level training); logits for every position.
    """
    B, T = tokens.shape
    state = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), fwd.init_state(cfg)
    )
    logits, _ = fwd.forward_batch(
        params, cfg, tokens, state, lengths, compute_logits=True, all_logits=True,
        remat=True,  # recompute layers in backward: O(1) activation memory in L
    )
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(T - 1)[None, :] < (lengths[:, None] - 1)).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_train_step(cfg: ModelConfig, optimizer=None):
    """Returns (train_step, init_opt_state). train_step is jit-compiled and
    respects whatever shardings params/opt_state/batch carry."""
    if optimizer is None:
        optimizer = optax.adamw(1e-4)

    @partial(jax.jit, static_argnames=())
    def train_step(params, opt_state, tokens, lengths):
        loss, grads = jax.value_and_grad(
            lambda p: next_token_loss(p, cfg, tokens, lengths)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step, optimizer.init
