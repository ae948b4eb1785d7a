"""Chunk-parallel (MXU) formulation of the wkv7 recurrence.

The sequential form (ops/wkv.py::wkv7, reference rwkv_operators_wkv_v7.inc:61-99)
updates an (Sv, Sk) state per token — pure VPU work, O(T) sequential steps, and
the prefill bottleneck. But the transition is diagonal-plus-rank-1:

    S_t = S_{t-1} (D_t + a_t b_t^T) + v_t k_t^T,   D_t = diag(w_t)

so a chunk of C tokens collapses into dense matmuls via a WY-style
representation. With per-channel cumulative decay Lam_t = prod_{u<=t} w_u and
h_t := S_{t-1} a_t (the rank-1 interaction vector):

    h_t = S_0 (Lam_{t-1} . a_t) + sum_{s<t} h_s (b_s^T D(s,t-1] a_t)
                                + sum_{s<t} v_s (k_s^T D(s,t-1] a_t)

which in matrix form is one C x C triangular solve (I - A_ba)^{-1}; the
decay-weighted pairwise matrices factor as products of
khat = k * Lam^{-1}, bhat = b * Lam^{-1}, ahat = a * Lam_prev, rhat = r * Lam —
all computable with batched (H, C, S) matmuls on the MXU. Outputs and the
chunk-final state are then three more matmuls.

The triangular inverse uses Neumann doubling: for strictly-triangular M,
(I - M)^{-1} = (I + M)(I + M^2)(I + M^4)... (M is nilpotent).

Numerics: Lam^{-1} grows like w_min^{-C}. RWKV-7 guarantees
w = exp(-0.6065 * sigmoid(.)) >= 0.545, so C = 32 keeps Lam^{-1} <= e^19.4,
comfortably inside f32. (v5/v6 decays are unbounded below, so they keep the
sequential kernel for now; a sub-chunked variant can follow.)

Validated against the sequential scan (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CHUNK = 32


def _neumann_inv(m):
    """(I - M)^{-1} for strictly upper-triangular M: (..., C, C)."""
    c = m.shape[-1]
    eye = jnp.eye(c, dtype=m.dtype)
    inv = eye + m
    p = m
    steps = max(1, (c - 1).bit_length() - 1)
    for _ in range(steps):
        p = jnp.einsum("...ij,...jk->...ik", p, p, preferred_element_type=jnp.float32)
        inv = jnp.einsum("...ij,...jk->...ik", inv, eye + p, preferred_element_type=jnp.float32)
    return inv


def _chunk_step(s0, chunk):
    """One chunk for all heads. s0: (H, Sv, Sk); chunk arrays: (C, H, S)."""
    r, w, k, v, a, b = chunk
    C = r.shape[0]
    # head-major layout for batched matmuls: (H, C, S)
    r, w, k, v, a, b = (jnp.swapaxes(x, 0, 1) for x in (r, w, k, v, a, b))

    lw = jnp.log(w)
    L = jnp.cumsum(lw, axis=1)                 # (H, C, S)
    lam_inv = jnp.exp(-L)
    khat = k * lam_inv
    bhat = b * lam_inv
    ahat = a * jnp.exp(L - lw)                 # a_t * Lam_{t-1}
    rhat = r * jnp.exp(L)

    def mm(x, y):  # (H, C, S) @ (H, S, C') -> (H, C, C')
        return jnp.einsum("hcs,hds->hcd", x, y, preferred_element_type=jnp.float32)

    strict = jnp.triu(jnp.ones((C, C), jnp.float32), 1)
    incl = jnp.triu(jnp.ones((C, C), jnp.float32), 0)

    a_ba = mm(bhat, ahat) * strict             # [s, t], s < t
    a_ka = mm(khat, ahat) * strict
    g_b = mm(bhat, rhat) * incl                # [s, t], s <= t
    g_k = mm(khat, rhat) * incl

    inv = _neumann_inv(a_ba)                   # (H, C, C)

    vt = jnp.swapaxes(v, 1, 2)                 # (H, Sv, C)
    g0 = jnp.einsum("hvk,hck->hvc", s0, ahat, preferred_element_type=jnp.float32)
    hc = jnp.einsum(
        "hvc,hcd->hvd", g0 + jnp.einsum("hvc,hcd->hvd", vt, a_ka,
                                        preferred_element_type=jnp.float32),
        inv, preferred_element_type=jnp.float32,
    )                                          # (H, Sv, C)

    out = (
        jnp.einsum("hvk,hck->hvc", s0, rhat, preferred_element_type=jnp.float32)
        + jnp.einsum("hvc,hcd->hvd", hc, g_b, preferred_element_type=jnp.float32)
        + jnp.einsum("hvc,hcd->hvd", vt, g_k, preferred_element_type=jnp.float32)
    )                                          # (H, Sv, C)

    lam_c = jnp.exp(L[:, -1, :])               # (H, Sk)
    s_c = (
        s0
        + jnp.einsum("hvc,hck->hvk", hc, bhat, preferred_element_type=jnp.float32)
        + jnp.einsum("hvc,hck->hvk", vt, khat, preferred_element_type=jnp.float32)
    ) * lam_c[:, None, :]

    return s_c, jnp.transpose(out, (2, 0, 1))  # out back to (C, H, Sv)


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv7_chunked(r, w, k, v, a, b, state, chunk: int = CHUNK):
    """Chunk-parallel wkv7: r/w/k/v/a/b (T, H, S) f32, state (H, S, S).
    T must be a multiple of `chunk` (callers pad; padding with w=1 and
    k=v=a=b=0 is an exact no-op on the state)."""
    T, H, S = r.shape
    assert T % chunk == 0, f"T={T} not a multiple of chunk={chunk}"
    n = T // chunk
    xs = tuple(x.reshape(n, chunk, H, S).astype(jnp.float32) for x in (r, w, k, v, a, b))
    state, out = jax.lax.scan(_chunk_step, state.astype(jnp.float32), xs)
    return out.reshape(T, H, S), state


# ---------------------------------------------------------------------------
# wkv6 / wkv5 chunked (diagonal transition):
#   S_t = diag(w_t) S_{t-1} + k_t v_t^T        [S indexed (k_dim, v_dim)]
#   out_t = r_t^T S_{t-1} + (r_t . (tf*k_t)) v_t^T
#
# v6 decays are unbounded below (w = exp(-exp(.)) can be ~0), so the factored
# k/Lam form would overflow. Instead the pairwise decay tensor is computed
# directly with exponents clipped at 0 — every valid (s < t) exponent is
# already <= 0 (pure decay), and clipping only affects masked entries.
# ---------------------------------------------------------------------------

def _chunk6_step(carry, chunk_arrs):
    s0, tf = carry                              # s0: (H, Sk, Sv); tf: (H, S)
    r, k, v, w = chunk_arrs                     # (C, H, S)
    C = r.shape[0]
    r, k, v, w = (jnp.swapaxes(x, 0, 1) for x in (r, k, v, w))  # (H, C, S)

    lw = jnp.log(w)
    L = jnp.cumsum(lw, axis=1)
    Lprev = L - lw

    # pairwise per-channel decay exp(L_{t-1} - L_s) for s < t, clipped so the
    # (masked) s >= t entries cannot overflow
    expo = jnp.minimum(Lprev[:, :, None, :] - L[:, None, :, :], 0.0)  # (H,t,s,S)
    q = jnp.einsum("htsi,hti,hsi->hts", jnp.exp(expo), r, k,
                   preferred_element_type=jnp.float32)
    strict = jnp.tril(jnp.ones((C, C), jnp.float32), -1)              # s < t
    q = q * strict

    # cross-chunk read of the carried state + intra-chunk + bonus diagonal
    r_dec = r * jnp.exp(Lprev)
    out = (
        jnp.einsum("hts,hsv->htv", q, v, preferred_element_type=jnp.float32)
        + jnp.einsum("hti,hiv->htv", r_dec, s0, preferred_element_type=jnp.float32)
        + jnp.einsum("hti,hti,htv->htv", r, tf[:, None, :] * k, v,
                     preferred_element_type=jnp.float32)
    )

    lam_c = jnp.exp(L[:, -1, :])                                       # (H, S)
    k_dec = k * jnp.exp(L[:, -1:, :] - L)                              # k_s * Lam_C/Lam_s
    s_c = s0 * lam_c[:, :, None] + jnp.einsum(
        "hsi,hsv->hiv", k_dec, v, preferred_element_type=jnp.float32
    )
    return (s_c, tf), jnp.swapaxes(out, 0, 1)   # out -> (C, H, Sv)


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv6_chunked(r, k, v, tf, w, state, chunk: int = CHUNK):
    """Chunk-parallel wkv6/wkv5: r/k/v/w (T, H, S) f32; tf (H, S);
    state (H, S, S) indexed [k_dim, v_dim]. T must be a chunk multiple."""
    T, H, S = r.shape
    assert T % chunk == 0
    n = T // chunk
    xs = tuple(x.reshape(n, chunk, H, S).astype(jnp.float32) for x in (r, k, v, w))
    (state, _), out = jax.lax.scan(
        _chunk6_step, (state.astype(jnp.float32), tf.astype(jnp.float32)), xs
    )
    return out.reshape(T, H, S), state


def wkv6_chunked_masked(r, k, v, tf, w, state, valid, chunk: int = CHUNK):
    """Padding-safe wrapper matching ops/wkv.py::wkv56's signature."""
    T, H, S = r.shape
    Tp = ((T + chunk - 1) // chunk) * chunk
    pad = Tp - T

    def padded(x, fill):
        m = valid[:, None, None].astype(x.dtype)
        x = x * m + fill * (1 - m)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad, H, S), fill, x.dtype)], axis=0)
        return x

    out, st = wkv6_chunked(
        padded(r, 0.0), padded(k, 0.0), padded(v, 0.0), tf,
        padded(w, 1.0), state, chunk=chunk
    )
    return out[:T], st


def _fold_batch(x, fill, valid, chunk):
    """(B, T, H, S) + valid (B, T) -> masked, T-padded, (Tp, B*H, S)."""
    B, T, H, S = x.shape
    m = valid[:, :, None, None].astype(x.dtype)
    x = x * m + fill * (1 - m)
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        x = jnp.concatenate([x, jnp.full((B, Tp - T, H, S), fill, x.dtype)], axis=1)
    return jnp.swapaxes(x, 0, 1).reshape(Tp, B * H, S)


def wkv7_chunked_batched(r, w, k, v, a, b, state, valid, chunk: int = CHUNK):
    """Natively batched chunked wkv7: fold (B, H) into the head axis so the
    whole batch runs as ONE chunked scan (no vmap — a vmapped kernel would
    re-batch every internal matmul). Shapes: r.. (B, T, H, S);
    state (B, H, Sv, Sk); valid (B, T)."""
    B, T, H, S = r.shape
    out, st = wkv7_chunked(
        _fold_batch(r, 0.0, valid, chunk), _fold_batch(w, 1.0, valid, chunk),
        _fold_batch(k, 0.0, valid, chunk), _fold_batch(v, 0.0, valid, chunk),
        _fold_batch(a, 0.0, valid, chunk), _fold_batch(b, 0.0, valid, chunk),
        state.reshape(B * H, S, S), chunk=chunk,
    )
    out = jnp.swapaxes(out[:T].reshape(T, B, H, S), 0, 1)
    return out, st.reshape(B, H, S, S)


def wkv6_chunked_batched(r, k, v, tf, w, state, valid, chunk: int = CHUNK):
    """Batched chunked wkv6/wkv5 via (B, H) folding; tf (H, S) broadcasts
    across streams. state (B, H, Sk, Sv); valid (B, T)."""
    B, T, H, S = r.shape
    tf_b = jnp.broadcast_to(tf, (B, H, S)).reshape(B * H, S)
    out, st = wkv6_chunked(
        _fold_batch(r, 0.0, valid, chunk), _fold_batch(k, 0.0, valid, chunk),
        _fold_batch(v, 0.0, valid, chunk), tf_b,
        _fold_batch(w, 1.0, valid, chunk),
        state.reshape(B * H, S, S), chunk=chunk,
    )
    out = jnp.swapaxes(out[:T].reshape(T, B, H, S), 0, 1)
    return out, st.reshape(B, H, S, S)


def wkv7_chunked_masked(r, w, k, v, a, b, state, valid, chunk: int = CHUNK):
    """Padding-safe wrapper with the same signature as ops/wkv.py::wkv7.
    Pads T up to a chunk multiple internally."""
    T, H, S = r.shape
    Tp = ((T + chunk - 1) // chunk) * chunk
    pad = Tp - T

    def padded(x, fill):
        m = valid[:, None, None].astype(x.dtype)
        x = x * m + fill * (1 - m)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad, H, S), fill, x.dtype)], axis=0)
        return x

    out, st = wkv7_chunked(
        padded(r, 0.0), padded(w, 1.0), padded(k, 0.0),
        padded(v, 0.0), padded(a, 0.0), padded(b, 0.0), state, chunk=chunk
    )
    return out[:T], st
