"""LayerNorm / GroupNorm / L2-norm as used by RWKV.

Reference semantics:
  rwkv_layer_norm (rwkv_operators.inc:93-97):  (x - mean) / sqrt(var + 1e-5) * w + b
  group norm over heads (rwkv_graph.inc:281-285 v5 eps=1e-5; :376-380 v6 and
  :466-470 v7 eps=64e-5), then scaled by ln_x weight/bias over flattened E
  rwkv_l2norm (rwkv_operators.inc:40-82): row / max(sqrt(sum(x^2)), 1e-12)

All three are dtype-preserving: statistics are computed in f32 (bf16 mean/var
would lose ~3 decimal digits) and the result is cast back to the input dtype.
For f32 inputs — the parity path — this is bit-identical to computing in f32
throughout; for bf16 activations (the TPU serving path, models/forward.py)
it halves the HBM traffic of every materialized normalized tensor.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, w, b, eps: float = 1e-5):
    """x (..., E); returns x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc / jnp.sqrt(var + jnp.float32(eps)) * w + b).astype(x.dtype)


def group_norm_heads(x, w, b, n_heads: int, eps: float):
    """x (..., E); normalize per (token, head) group of size E//n_heads, then
    elementwise scale/bias over E. Returns x.dtype."""
    *lead, e = x.shape
    g = x.astype(jnp.float32).reshape(*lead, n_heads, e // n_heads)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    gc = g - mean
    var = jnp.mean(gc * gc, axis=-1, keepdims=True)
    g = gc / jnp.sqrt(var + jnp.float32(eps))
    return (g.reshape(*lead, e) * w + b).astype(x.dtype)


def l2_norm_rows(x, eps: float = 1e-12):
    """Normalize the last axis by its L2 norm (v7 kk). Returns x.dtype."""
    xf = x.astype(jnp.float32)
    s = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    return (xf / jnp.maximum(s, jnp.float32(eps))).astype(x.dtype)
