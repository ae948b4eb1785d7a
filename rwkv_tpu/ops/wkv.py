"""WKV time-mixing recurrences for RWKV v4 / v5-v6 / v7 as jnp lax.scan ops.

These are the semantic reference implementations (jit-compiles everywhere,
including the CPU test mesh). The Pallas TPU kernels in ops/pallas_wkv.py are
drop-in replacements validated against these.

Semantics transcribed from:
  v4: max-trick scalar-state recurrence, rwkv_graph.inc:119-161
  v5/v6: ggml_rwkv_wkv6 fused op (use sites rwkv_graph.inc:275, 370) —
      out_t[j] = sum_i r_t[i] * (S[i,j] + tf[i] * k_t[i] * v_t[j])
      S[i,j]  <- S[i,j] * w_t[i] + k_t[i] * v_t[j]
      (state indexed [key_dim, value_dim]; v5 has constant per-channel w,
       v6 per-token w)
  v7: rwkv_wkv_v7 custom op, rwkv_operators_wkv_v7.inc:61-99 —
      sa_i    = sum_j a_t[j] * S[i,j]
      S[i,j] <- S[i,j] * w_t[j] + v_t[i] * k_t[j] + sa_i * b_t[j]
      out_t[i] = sum_j S[i,j] * r_t[j]
      (state indexed [value_dim, key_dim]; a = -normalize(kk), b = kk * a_gate)

All ops accept a `valid` mask (T,) so padded sequence-bucket tokens pass the
state through unchanged — the jit-cache-over-buckets replacement for the
reference's graph-rebuild-per-length (rwkv_eval.inc:112-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sel(valid_t, new, old):
    return jax.tree.map(lambda n, o: jnp.where(valid_t, n, o), new, old)


def wkv4(k, v, time_first, time_decay, aa, bb, pp, valid):
    """RWKV v4 scalar-state wkv with the log-space max trick.

    k, v: (T, E); time_first/time_decay: (E,) (decay already -exp() per the
    converter, convert_pytorch_to_ggml.py:123-124); aa/bb/pp: (E,).
    Returns wkv (T, E) and final (aa, bb, pp).
    """

    def step(carry, inp):
        aa, bb, pp = carry
        kt, vt, valid_t = inp
        ww = time_first + kt
        qq = jnp.maximum(pp, ww)
        e1 = jnp.exp(pp - qq)
        e2 = jnp.exp(ww - qq)
        a = e1 * aa + e2 * vt
        b = e1 * bb + e2
        wkv = a / b
        ww2 = pp + time_decay
        qq2 = jnp.maximum(ww2, kt)
        e1b = jnp.exp(ww2 - qq2)
        e2b = jnp.exp(kt - qq2)
        new = (e1b * aa + e2b * vt, e1b * bb + e2b, qq2)
        return _sel(valid_t, new, carry), wkv

    (aa, bb, pp), out = jax.lax.scan(step, (aa, bb, pp), (k, v, valid))
    return out, (aa, bb, pp)


def wkv56(r, k, v, tf, w, state, valid):
    """RWKV v5/v6 head-state wkv (ggml_rwkv_wkv6 semantics).

    r, k, v, w: (T, H, S); tf: (H, S); state: (H, S, S) indexed [k_dim, v_dim].
    Returns out (T, H, S) and the final state.
    """

    def step(s, inp):
        rt, kt, vt, wt, valid_t = inp
        kv = kt[:, :, None] * vt[:, None, :]                      # (H, Sk, Sv)
        out = jnp.sum((s + tf[:, :, None] * kv) * rt[:, :, None], axis=1)
        s_new = s * wt[:, :, None] + kv
        return jnp.where(valid_t, s_new, s), out

    state, out = jax.lax.scan(step, state, (r, k, v, w, valid))
    return out, state


# ---------------------------------------------------------------------------
# natively batched sequence scans (B, T, ...) — the vmap-free path used by
# forward_seq; per-stream `valid` masks freeze the state on padded tokens
# ---------------------------------------------------------------------------

def wkv4_batched(k, v, time_first, time_decay, aa, bb, pp, valid):
    """k, v: (B, T, E); aa/bb/pp: (B, E); valid: (B, T)."""

    def step(carry, inp):
        kt, vt, vm = inp
        wkv, new = wkv4_step(kt, vt, time_first, time_decay, *carry)
        m = vm[:, None]
        carry = tuple(jnp.where(m, n, o) for n, o in zip(new, carry))
        return carry, wkv

    xs = (jnp.moveaxis(k, 1, 0), jnp.moveaxis(v, 1, 0), valid.T)
    (aa, bb, pp), out = jax.lax.scan(step, (aa, bb, pp), xs)
    return jnp.moveaxis(out, 0, 1), (aa, bb, pp)


def wkv56_batched(r, k, v, tf, w, state, valid):
    """r/k/v/w: (B, T, H, S); tf: (H, S); state: (B, H, S, S); valid: (B, T)."""

    def step(s, inp):
        rt, kt, vt, wt, vm = inp
        out, s_new = wkv56_step(rt, kt, vt, tf, wt, s)
        s = jnp.where(vm[:, None, None, None], s_new, s)
        return s, out

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, k, v, w)) + (valid.T,)
    state, out = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(out, 0, 1), state


def wkv7_batched(r, w, k, v, a, b, state, valid):
    """r/w/k/v/a/b: (B, T, H, S); state: (B, H, S, S); valid: (B, T)."""

    def step(s, inp):
        rt, wt, kt, vt, at, bt, vm = inp
        out, s_new = wkv7_step(rt, wt, kt, vt, at, bt, s)
        s = jnp.where(vm[:, None, None, None], s_new, s)
        return s, out

    xs = tuple(jnp.moveaxis(x, 1, 0) for x in (r, w, k, v, a, b)) + (valid.T,)
    state, out = jax.lax.scan(step, state, xs)
    return jnp.moveaxis(out, 0, 1), state


def wkv4_step(k, v, time_first, time_decay, aa, bb, pp):
    """One v4 recurrence step, batched: k, v, aa, bb, pp (..., E).
    Returns (wkv (..., E), (aa, bb, pp))."""
    ww = time_first + k
    qq = jnp.maximum(pp, ww)
    e1 = jnp.exp(pp - qq)
    e2 = jnp.exp(ww - qq)
    wkv = (e1 * aa + e2 * v) / (e1 * bb + e2)
    ww2 = pp + time_decay
    qq2 = jnp.maximum(ww2, k)
    e1b = jnp.exp(ww2 - qq2)
    e2b = jnp.exp(k - qq2)
    return wkv, (e1b * aa + e2b * v, e1b * bb + e2b, qq2)


def wkv56_step(r, k, v, tf, w, state):
    """One v5/v6 step, batched: r/k/v/w (..., H, S); tf (H, S) or (..., H, S);
    state (..., H, S, S) indexed [k_dim, v_dim]. Returns (out, state).

    The state may be carried in a reduced dtype (bf16 decode-loop carry —
    halves the dominant state HBM traffic at large batch): compute runs in
    f32 and the new state is rounded back to the carry dtype. f32 carries
    are untouched."""
    st_dtype = state.dtype
    s = state.astype(jnp.float32)
    kv = k[..., :, None] * v[..., None, :]
    out = jnp.sum((s + tf[..., :, None] * kv) * r[..., :, None], axis=-2)
    s = s * w[..., :, None] + kv
    return out, s.astype(st_dtype)


def wkv7_step(r, w, k, v, a, b, state):
    """One v7 step, batched: all of r/w/k/v/a/b (..., H, S);
    state (..., H, S, S) indexed [v_dim, k_dim]. Returns (out, state).

    Measured dead end (round 2, do not retry blindly): expanding the output
    around the OLD state (out = s.(w*r) + v(k.r) + sa(b.r)) to cut the
    nominal state-HBM passes from 5 to 3 REGRESSED decode 3.58 -> 4.33
    ms/step at B=8 — XLA's fusion of this exact form is already better than
    the hand-restructured one.

    Reduced-dtype state carries (bf16) are supported the same way as
    wkv56_step: f32 compute, new state rounded back to the carry dtype."""
    st_dtype = state.dtype
    s = state.astype(jnp.float32)
    sa = jnp.sum(s * a[..., None, :], axis=-1)
    s = (
        s * w[..., None, :]
        + v[..., :, None] * k[..., None, :]
        + sa[..., :, None] * b[..., None, :]
    )
    out = jnp.sum(s * r[..., None, :], axis=-1)
    return out, s.astype(st_dtype)


def wkv7(r, w, k, v, a, b, state, valid):
    """RWKV v7 wkv with the in-context-learning rank-1 state update.

    r, w, k, v, a, b: (T, H, S); state: (H, S, S) indexed [v_dim, k_dim].
    Returns out (T, H, S) and the final state. Output uses the *post-update*
    state (rwkv_operators_wkv_v7.inc:96-97).
    """

    def step(s, inp):
        rt, wt, kt, vt, at, bt, valid_t = inp
        sa = jnp.sum(s * at[:, None, :], axis=2)                  # (H, Sv)
        s_new = (
            s * wt[:, None, :]
            + vt[:, :, None] * kt[:, None, :]
            + sa[:, :, None] * bt[:, None, :]
        )
        out = jnp.sum(s_new * rt[:, None, :], axis=2)
        return jnp.where(valid_t, s_new, s), out

    state, out = jax.lax.scan(step, state, (r, w, k, v, a, b, valid))
    return out, state
