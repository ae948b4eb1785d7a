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

# Default chunk length for the v5/v6/v7 chunk-parallel forms. Module-level
# so an on-chip sweep can flip it (jit caches trace-time reads: clear the
# OUTER caches after changing). v7 numerics stay in f32 range through C=64
# (Lam^-1 <= e^{0.6065*C} = e^38.8); v6 is safe at any C (clipped pairwise).
CHUNK = 32

# v7-specific chunk length. The v7 decay is bounded below (w >= 0.545), so
# the WY-factored form stays in f32 range up to C=128 (Lam^-1 <= e^77.6,
# validated against the sequential scan incl. floor-decay + 4-sigma-k
# adversarial inputs: rel err 4e-5, finite). Bigger chunks quarter the
# chunk-scan length and grow the per-chunk dots to MXU-friendly (128, 64)
# shapes: measured +11% end-to-end v7 prefill at B=8 T=512 on v5e vs C=32.
# (v6/v5 keep CHUNK=32: their clipped-pairwise decay tensor is O(C^2).)
CHUNK_V7 = 128


def _v7_chunk(chunk, T):
    """Resolve the v7 chunk length: default CHUNK_V7, clamped to the next
    power of two >= T so short sequences don't pad 5x."""
    if chunk is not None:
        return chunk
    c = 16
    while c < T and c < CHUNK_V7:
        c *= 2
    return c


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
    """One chunk for all heads. s0: (H, Sv, Sk); chunk arrays: (H, C, S)
    head-major — the layout every einsum here consumes. Callers fold to this
    layout ONCE (see _fold_bh); an earlier version folded (C, H, S) chunks
    and transposed all six operands per chunk, which cost two full copies of
    every operand per layer (~47 ms/call of pure relayout at B=8 T=512 on a
    1.5B model — the single largest non-MXU term in the prefill profile).
    Takes log-decay lw directly (callers have it for free; recomputing
    log(exp(lw)) cost two more full-tensor transcendental passes)."""
    r, lw, k, v, a, b = chunk
    C = r.shape[1]

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

    return s_c, jnp.swapaxes(out, 1, 2)        # out (H, C, Sv)


def _chunks_hm(x, chunk):
    """(T, H, S) -> (n, H, C, S) head-major chunks in one relayout."""
    T, H, S = x.shape
    n = T // chunk
    return x.reshape(n, chunk, H, S).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("chunk", "io_bf16"))
def wkv7_chunked(r, w, k, v, a, b, state, chunk: int | None = None, lw=None,
                 io_bf16: bool = False):
    """Chunk-parallel wkv7: r/w/k/v/a/b (T, H, S) f32, state (H, S, S).
    T must be a multiple of `chunk` (callers pad; padding with w=1 and
    k=v=a=b=0 is an exact no-op on the state). Pass lw = log(w) when the
    caller already has it (forward.py does — w itself is then unused).

    io_bf16=True relayouts r/k/v/a/b in bf16 (the log-decay stays f32):
    the chunk transposes are the largest non-MXU term of the prefill
    profile, the operand values are O(1), and the MXU dots round operands
    to bf16 at DEFAULT precision anyway — serving mode opts in
    (forward.py), parity keeps pure f32."""
    T, H, S = r.shape
    chunk = _v7_chunk(chunk, T)
    assert T % chunk == 0, f"T={T} not a multiple of chunk={chunk}"
    lw = jnp.log(w) if lw is None else lw
    dt = jnp.bfloat16 if io_bf16 else jnp.float32
    xs = tuple(_chunks_hm(x.astype(jnp.float32 if i == 1 else dt), chunk)
               for i, x in enumerate((r, lw, k, v, a, b)))
    state, out = jax.lax.scan(_chunk_step, state.astype(jnp.float32), xs)
    return out.transpose(0, 2, 1, 3).reshape(T, H, S), state


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
    r, k, v, lw = chunk_arrs                    # (H, C, S) head-major
    C = r.shape[1]

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
    return (s_c, tf), out                       # out (H, C, Sv) head-major


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv6_chunked(r, k, v, tf, w, state, chunk: int | None = None, lw=None):
    """Chunk-parallel wkv6/wkv5: r/k/v/w (T, H, S) f32; tf (H, S);
    state (H, S, S) indexed [k_dim, v_dim]. T must be a chunk multiple.
    Pass lw = log(w) when the caller has it (v6 computes the decay as
    -exp(.), so its log is free; w is then unused)."""
    chunk = CHUNK if chunk is None else chunk
    T, H, S = r.shape
    assert T % chunk == 0
    lw = jnp.log(w) if lw is None else lw
    xs = tuple(_chunks_hm(x.astype(jnp.float32), chunk) for x in (r, k, v, lw))
    (state, _), out = jax.lax.scan(
        _chunk6_step, (state.astype(jnp.float32), tf.astype(jnp.float32)), xs
    )
    return out.transpose(0, 2, 1, 3).reshape(T, H, S), state


def wkv6_chunked_masked(r, k, v, tf, w, state, valid, chunk: int | None = None, lw=None):
    """Padding-safe wrapper matching ops/wkv.py::wkv56's signature."""
    chunk = CHUNK if chunk is None else chunk
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
        w, state, chunk=chunk,
        lw=padded(jnp.log(w) if lw is None else lw, 0.0),
    )
    return out[:T], st


def _fold_batch(x, fill, valid, chunk):
    """(B, T, H, S) + valid (B, T) -> masked, T-padded, (Tp, B*H, S).
    Layout consumed by the opt-in Pallas chunk kernels (ops/pallas_wkv.py);
    the XLA chunked path uses _fold_bh below (one relayout, head-major)."""
    B, T, H, S = x.shape
    m = valid[:, :, None, None].astype(x.dtype)
    x = x * m + fill * (1 - m)
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        x = jnp.concatenate([x, jnp.full((B, Tp - T, H, S), fill, x.dtype)], axis=1)
    return jnp.swapaxes(x, 0, 1).reshape(Tp, B * H, S)


def _fold_bh(x, fill, valid, chunk):
    """(B, T, H, S) + valid (B, T) -> (n, B*H, C, S): masked, T-padded,
    head-major chunks — the layout _chunk_step consumes — in ONE relayout.
    (The previous fold went through (Tp, B*H, S) plus a per-chunk
    (C, H, S) -> (H, C, S) transpose inside the scan: two full copies of
    every operand per layer, ~47 ms/call of pure data movement at
    B=8 T=512 on a 1.5B model.)"""
    B, T, H, S = x.shape
    m = valid[:, :, None, None].astype(x.dtype)
    x = x * m + fill * (1 - m)
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        x = jnp.concatenate([x, jnp.full((B, Tp - T, H, S), fill, x.dtype)], axis=1)
    n = Tp // chunk
    return (x.reshape(B, n, chunk, H, S).transpose(1, 0, 3, 2, 4)
             .reshape(n, B * H, chunk, S))


def _unfold_bh(out, B, T, H, S):
    """Scan output (n, B*H, C, Sv) -> (B, T, H, Sv)."""
    n, _, C, Sv = out.shape
    return (out.reshape(n, B, H, C, Sv).transpose(1, 0, 3, 2, 4)
               .reshape(B, n * C, H, Sv)[:, :T])


def wkv7_chunked_batched(r, w, k, v, a, b, state, valid, chunk: int | None = None,
                         lw=None, io_bf16: bool = False):
    """Natively batched chunked wkv7: fold (B, H) into the head axis so the
    whole batch runs as ONE chunked scan (no vmap — a vmapped kernel would
    re-batch every internal matmul). Shapes: r.. (B, T, H, S);
    state (B, H, Sv, Sk); valid (B, T). lw = log(w) if the caller has it.
    io_bf16: see wkv7_chunked."""
    B, T, H, S = r.shape
    chunk = _v7_chunk(chunk, T)
    lw = jnp.log(w) if lw is None else lw
    dt = jnp.bfloat16 if io_bf16 else jnp.float32
    xs = tuple(_fold_bh(x.astype(jnp.float32 if i == 1 else dt), f, valid, chunk)
               for i, (x, f) in enumerate(((r, 0.0), (lw, 0.0), (k, 0.0),
                                           (v, 0.0), (a, 0.0), (b, 0.0))))
    st, out = jax.lax.scan(_chunk_step,
                           state.reshape(B * H, S, S).astype(jnp.float32), xs)
    return _unfold_bh(out, B, T, H, S), st.reshape(B, H, S, S)


def wkv6_chunked_batched(r, k, v, tf, w, state, valid, chunk: int | None = None,
                         lw=None, io_bf16: bool = False):
    """Batched chunked wkv6/wkv5 via (B, H) folding; tf (H, S) broadcasts
    across streams. state (B, H, Sk, Sv); valid (B, T). io_bf16: see
    wkv7_chunked (r/k/v relayout in bf16; log-decay stays f32)."""
    chunk = CHUNK if chunk is None else chunk
    B, T, H, S = r.shape
    tf_b = jnp.broadcast_to(tf, (B, H, S)).reshape(B * H, S)
    lw = jnp.log(w) if lw is None else lw
    dt = jnp.bfloat16 if io_bf16 else jnp.float32
    xs = tuple(_fold_bh(x.astype(jnp.float32 if i == 3 else dt), f, valid, chunk)
               for i, (x, f) in enumerate(((r, 0.0), (k, 0.0), (v, 0.0),
                                           (lw, 0.0))))
    (st, _), out = jax.lax.scan(
        _chunk6_step,
        (state.reshape(B * H, S, S).astype(jnp.float32), tf_b.astype(jnp.float32)),
        xs,
    )
    return _unfold_bh(out, B, T, H, S), st.reshape(B, H, S, S)


# ---------------------------------------------------------------------------
# wkv4 chunked (scalar per-channel state with the log-space max trick,
# reference rwkv_graph.inc:119-161). The recurrence keeps (aa, bb, pp) with
# the invariant  true_a = aa * e^pp  (pp is the shared exponent). Unrolled
# from a carry (aa0, bb0, pp0), after t in-chunk tokens:
#
#   a_t = e^{t*d + pp0} aa0 + sum_{s<=t} e^{(t-s)*d + k_s} v_s
#       = e^{t*d + M_t} * A_t,   A_t = sum_{s<=t} e^{phi_s - M_t} v_s (+ carry)
#   phi_s = k_s - s*d,  M_t = max(pp0, max_{s<=t} phi_s)   (RUNNING max)
#
# The running (prefix) max matters: a chunk-global max would underflow every
# early-position prefix whenever the max lands late in the chunk (0/0 NaNs
# in the output division) — exactly the failure the sequential max trick
# avoids. The renormalized prefix sums obey the first-order linear recurrence
#   A_t = A_{t-1} * e^{M_{t-1}-M_t} + e^{phi_t-M_t} v_t
# whose coefficients are all <= 1 and computable upfront (cummax), so the
# whole chunk evaluates with one jax.lax.associative_scan (log-depth, pure
# VPU, vectorized over (B, E)) — no sequential T loop. The output at t adds
# the time_first bonus with its own max (rho), exactly like the reference's
# qq. The carry renormalizes per chunk: aa'=A_C, bb'=B_C, pp'=n_valid*d+M_C.
# ---------------------------------------------------------------------------

def _wkv4_chunk_step(carry, inp, u, d):
    """carry: aa/bb/pp (..., E); inp: (kc, vc, validc) with kc/vc (..., C, E),
    validc (..., C) a prefix mask."""
    aa, bb, pp = carry
    kc, vc, validc = inp
    C = kc.shape[-2]
    mask = validc[..., :, None]
    t = jnp.arange(1, C + 1, dtype=jnp.float32)[:, None]          # (C, 1)
    phi = jnp.where(mask, kc - t * d, -jnp.inf)                   # (..., C, E)
    M = jnp.maximum(pp[..., None, :], jax.lax.cummax(phi, axis=phi.ndim - 2))
    Mprev = jnp.concatenate([pp[..., None, :], M[..., :-1, :]], axis=-2)
    alpha = jnp.exp(Mprev - M)                                    # <= 1
    beta = jnp.exp(phi - M)                                       # <= 1; 0 at padding

    def combine(x, y):
        ax, Ax, Bx = x
        ay, Ay, By = y
        return (ax * ay, Ax * ay + Ay, Bx * ay + By)

    P, Qa, Qb = jax.lax.associative_scan(
        combine, (alpha, beta * vc, beta), axis=phi.ndim - 2
    )
    A = P * aa[..., None, :] + Qa                                 # (..., C, E)
    B = P * bb[..., None, :] + Qb
    Aprev = jnp.concatenate([aa[..., None, :], A[..., :-1, :]], axis=-2)
    Bprev = jnp.concatenate([bb[..., None, :], B[..., :-1, :]], axis=-2)

    td_prev = (t - 1.0) * d + Mprev                               # (..., C, E)
    wk = u + kc
    rho = jnp.maximum(td_prev, wk)
    e1 = jnp.exp(td_prev - rho)
    e2 = jnp.exp(wk - rho)
    wkv = (e1 * Aprev + e2 * vc) / (e1 * Bprev + e2)

    n_valid = jnp.sum(validc, axis=-1).astype(jnp.float32)        # (...,)
    new = (A[..., -1, :], B[..., -1, :], n_valid[..., None] * d + M[..., -1, :])
    return new, wkv


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv4_chunked_batched(k, v, u, d, aa, bb, pp, valid, chunk: int = 128):
    """Chunk-parallel v4 wkv: k/v (B, T, E) f32; u = time_first, d =
    time_decay (both (E,), decay already -exp() per the converter); aa/bb/pp
    (B, E); valid (B, T) prefix masks. Returns (wkv (B, T, E), carry)."""
    B, T, E = k.shape
    Tp = ((T + chunk - 1) // chunk) * chunk
    if Tp != T:
        padk = jnp.zeros((B, Tp - T, E), k.dtype)
        k = jnp.concatenate([k, padk], axis=1)
        v = jnp.concatenate([v, padk], axis=1)
        valid = jnp.concatenate([valid, jnp.zeros((B, Tp - T), valid.dtype)], axis=1)
    n = Tp // chunk
    xs = (
        jnp.moveaxis(k.reshape(B, n, chunk, E), 1, 0).astype(jnp.float32),
        jnp.moveaxis(v.reshape(B, n, chunk, E), 1, 0).astype(jnp.float32),
        jnp.moveaxis(valid.reshape(B, n, chunk), 1, 0),
    )
    step = functools.partial(_wkv4_chunk_step, u=u, d=d)
    carry, out = jax.lax.scan(step, (aa, bb, pp), xs)
    return jnp.moveaxis(out, 0, 1).reshape(B, Tp, E)[:, :T], carry


@functools.partial(jax.jit, static_argnames=("chunk",))
def wkv4_chunked(k, v, u, d, aa, bb, pp, valid, chunk: int = 128):
    """Single-stream form: k/v (T, E), aa/bb/pp (E,), valid (T,)."""
    out, (aa, bb, pp) = wkv4_chunked_batched(
        k[None], v[None], u, d, aa[None], bb[None], pp[None], valid[None],
        chunk=chunk,
    )
    return out[0], (aa[0], bb[0], pp[0])


def wkv7_chunked_masked(r, w, k, v, a, b, state, valid, chunk: int | None = None,
                        lw=None):
    """Padding-safe wrapper with the same signature as ops/wkv.py::wkv7.
    Pads T up to a chunk multiple internally."""
    T, H, S = r.shape
    chunk = _v7_chunk(chunk, T)
    Tp = ((T + chunk - 1) // chunk) * chunk
    pad = Tp - T

    def padded(x, fill):
        m = valid[:, None, None].astype(x.dtype)
        x = x * m + fill * (1 - m)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad, H, S), fill, x.dtype)], axis=0)
        return x

    out, st = wkv7_chunked(
        padded(r, 0.0), w, padded(k, 0.0),
        padded(v, 0.0), padded(a, 0.0), padded(b, 0.0), state, chunk=chunk,
        lw=padded(jnp.log(w) if lw is None else lw, 0.0),
    )
    return out[:T], st
