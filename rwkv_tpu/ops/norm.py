"""LayerNorm / GroupNorm / L2-norm as used by RWKV.

Reference semantics:
  rwkv_layer_norm (rwkv_operators.inc:93-97):  (x - mean) / sqrt(var + 1e-5) * w + b
  group norm over heads (rwkv_graph.inc:281-285 v5 eps=1e-5; :376-380 v6 and
  :466-470 v7 eps=64e-5), then scaled by ln_x weight/bias over flattened E
  rwkv_l2norm (rwkv_operators.inc:40-82): row / max(sqrt(sum(x^2)), 1e-12)
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, w, b, eps: float = 1e-5):
    """x (..., E) f32."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return xc / jnp.sqrt(var + jnp.float32(eps)) * w + b


def group_norm_heads(x, w, b, n_heads: int, eps: float):
    """x (..., E); normalize per (token, head) group of size E//n_heads, then
    elementwise scale/bias over E."""
    *lead, e = x.shape
    g = x.reshape(*lead, n_heads, e // n_heads)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    gc = g - mean
    var = jnp.mean(gc * gc, axis=-1, keepdims=True)
    g = gc / jnp.sqrt(var + jnp.float32(eps))
    return g.reshape(*lead, e) * w + b


def l2_norm_rows(x, eps: float = 1e-12):
    """Normalize the last axis by its L2 norm (v7 kk)."""
    s = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(s, jnp.float32(eps))
