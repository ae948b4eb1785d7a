"""Pallas TPU kernels for the WKV recurrences.

wkv7 semantics (reference rwkv_operators_wkv_v7.inc:61-99, same math as
ops/wkv.py::wkv7, validated against it):

    sa_i    = sum_j a_t[j] * S[i,j]
    S[i,j] <- S[i,j] * w_t[j] + v_t[i] * k_t[j] + sa_i * b_t[j]
    out_t[i] = sum_j S[i,j] * r_t[j]

Kernel design (TPU): grid over (batch*heads_blocks, T_blocks). The per-head
S×S f32 state lives in a VMEM scratch across the whole T loop (it is the
recurrence carry — streaming it to HBM per step is what makes the naive XLA
scan memory-bound). Heads are blocked so the (Sv, Sk) tiles fill the 8x128
VPU: with S=64 we process HB heads per program as a (HB*Sv, Sk) 3D block.

The T loop is sequential (the recurrence is), but all heads/batch in the
block update in parallel on the VPU, and Pallas pipelines the HBM->VMEM
streaming of the per-token r/w/k/v/a/b blocks against compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wkv7_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref, out_ref, sT_ref, s_scr):
    """One grid step: (HB heads) x (TB tokens). Block shapes:
    r/w/k/v/a/b: (TB, HB, S); s0/sT: (HB, S, S); out: (TB, HB, S);
    s_scr: (HB, S, S) f32 VMEM scratch carrying the state across T blocks."""
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        s_scr[...] = s0_ref[...]

    TB = r_ref.shape[0]

    def step(t, _):
        rt = r_ref[t]  # (HB, S)
        wt = w_ref[t]
        kt = k_ref[t]
        vt = v_ref[t]
        at = a_ref[t]
        bt = b_ref[t]
        s = s_scr[...]  # (HB, Sv, Sk)
        sa = jnp.sum(s * at[:, None, :], axis=2)  # (HB, Sv)
        s = s * wt[:, None, :] + vt[:, :, None] * kt[:, None, :] + sa[:, :, None] * bt[:, None, :]
        s_scr[...] = s
        out_ref[t] = jnp.sum(s * rt[:, None, :], axis=2)
        return 0

    jax.lax.fori_loop(0, TB, step, 0, unroll=True)

    @pl.when(tb == pl.num_programs(1) - 1)
    def _():
        sT_ref[...] = s_scr[...]


@functools.partial(jax.jit, static_argnames=("head_block", "t_block"))
def wkv7_pallas(r, w, k, v, a, b, state, head_block: int = 8, t_block: int = 16):
    """r/w/k/v/a/b: (T, H, S) f32; state: (H, S, S) f32 [v_dim, k_dim].
    Returns (out (T, H, S), state_T). Drop-in for ops/wkv.py::wkv7 (without
    the `valid` mask — callers pad w=1, k/v/a/b=0 so padding is a no-op:
    S <- S*1 + 0 + sa*0 = S)."""
    T, H, S = r.shape
    HB = min(head_block, H)
    while H % HB:
        HB -= 1
    TB = min(t_block, T)
    while T % TB:
        TB -= 1

    grid = (H // HB, T // TB)
    vec_spec = pl.BlockSpec((TB, HB, S), lambda h, t: (t, h, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((HB, S, S), lambda h, t: (h, 0, 0), memory_space=pltpu.VMEM)

    out, state_t = pl.pallas_call(
        _wkv7_kernel,
        grid=grid,
        in_specs=[vec_spec] * 6 + [st_spec],
        out_specs=[vec_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, S), jnp.float32),
            jax.ShapeDtypeStruct((H, S, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HB, S, S), jnp.float32)],
    )(r, w, k, v, a, b, state)
    return out, state_t


def wkv7_masked(r, w, k, v, a, b, state, valid):
    """Padding-safe wrapper matching ops/wkv.py::wkv7's signature: invalid
    positions are rewritten to identity updates (w=1, k=v=a=b=0)."""
    m = valid[:, None, None].astype(r.dtype)
    one = jnp.ones_like(w)
    return wkv7_pallas(
        r * m, jnp.where(m > 0, w, one), k * m, v * m, a * m, b * m, state
    )


# ---------------------------------------------------------------------------
# wkv6 (also serves v5 with per-token-broadcast constant decay)
# out_t[j] = sum_i r_t[i] * (S[i,j] + tf[i] * k_t[i] * v_t[j])
# S[i,j] <- S[i,j] * w_t[i] + k_t[i] * v_t[j]        [i = k_dim, j = v_dim]
# ---------------------------------------------------------------------------

def _wkv6_kernel(r_ref, k_ref, v_ref, w_ref, tf_ref, s0_ref, out_ref, sT_ref, s_scr):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        s_scr[...] = s0_ref[...]

    TB = r_ref.shape[0]
    tf = tf_ref[...]  # (HB, S)

    def step(t, _):
        rt = r_ref[t]
        kt = k_ref[t]
        vt = v_ref[t]
        wt = w_ref[t]
        s = s_scr[...]  # (HB, Sk, Sv)
        kv = kt[:, :, None] * vt[:, None, :]
        out_ref[t] = jnp.sum((s + tf[:, :, None] * kv) * rt[:, :, None], axis=1)
        s_scr[...] = s * wt[:, :, None] + kv
        return 0

    jax.lax.fori_loop(0, TB, step, 0, unroll=True)

    @pl.when(tb == pl.num_programs(1) - 1)
    def _():
        sT_ref[...] = s_scr[...]


@functools.partial(jax.jit, static_argnames=("head_block", "t_block"))
def wkv6_pallas(r, k, v, tf, w, state, head_block: int = 8, t_block: int = 16):
    """r/k/v/w: (T, H, S) f32; tf: (H, S); state: (H, S, S) [k_dim, v_dim]."""
    T, H, S = r.shape
    HB = min(head_block, H)
    while H % HB:
        HB -= 1
    TB = min(t_block, T)
    while T % TB:
        TB -= 1

    grid = (H // HB, T // TB)
    vec_spec = pl.BlockSpec((TB, HB, S), lambda h, t: (t, h, 0), memory_space=pltpu.VMEM)
    tf_spec = pl.BlockSpec((HB, S), lambda h, t: (h, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((HB, S, S), lambda h, t: (h, 0, 0), memory_space=pltpu.VMEM)

    out, state_t = pl.pallas_call(
        _wkv6_kernel,
        grid=grid,
        in_specs=[vec_spec] * 3 + [vec_spec, tf_spec, st_spec],
        out_specs=[vec_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, S), jnp.float32),
            jax.ShapeDtypeStruct((H, S, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HB, S, S), jnp.float32)],
    )(r, k, v, w, tf, state)
    return out, state_t


def wkv6_masked(r, k, v, tf, w, state, valid):
    """Padding-safe wrapper: invalid positions get w=1, k=0 (so kv=0 and the
    state passes through); r=0 only zeroes the (unused) padded outputs."""
    m = valid[:, None, None].astype(r.dtype)
    one = jnp.ones_like(w)
    return wkv6_pallas(r * m, k * m, v, tf, jnp.where(m > 0, w, one), state)


# ---------------------------------------------------------------------------
# fused chunk-parallel wkv7 (the WY formulation of ops/wkv_chunked.py as one
# Pallas kernel): per grid program a block of heads advances chunk-by-chunk
# with the (transposed) state resident in VMEM, every product a 64x64-class
# MXU dot. XLA's lowering of the same math spends most of its time in tiny
# batched matmuls and relayouts; fusing the chunk pipeline here runs the
# whole recurrence at MXU rate.
#
# Orientation: the kernel carries S^T (Sk, Sv) so every step is a natural
# (C,S)/(C,C) dot_general with no physical transposes:
#   M    = (ahat . bhat^T)[t,s] strictly-lower   -> (I-M)^-1 by Neumann
#   hc^T = (I-M)^-1 (ahat S^T + (ahat.khat^T)_< v)
#   out^T= rhat S^T + (rhat.bhat^T)_<= hc^T + (rhat.khat^T)_<= v
#   S^T <- (S^T + bhat^T hc^T + khat^T v) * lam_C
# ---------------------------------------------------------------------------

def _wkv7_chunk_kernel(r_ref, lw_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                       out_ref, sT_ref, s_scr, *, heads_per_block):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        s_scr[...] = s0_ref[...]

    C = r_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    lower_strict = (col < row).astype(jnp.float32)
    lower_incl = (col <= row).astype(jnp.float32)
    eye = (col == row).astype(jnp.float32)

    def dot(x, y, dims):
        return jax.lax.dot_general(x, y, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    # load blocks once; per-head slicing happens on values (static lax.slice —
    # integer indexing a Ref's non-leading dim lowers to an unsupported
    # dynamic_slice in Mosaic)
    rb, lwb, kb, vb, ab, bbk = (ref[...] for ref in (r_ref, lw_ref, k_ref, v_ref, a_ref, b_ref))

    for h in range(heads_per_block):
        rr = rb[:, h, :]
        lw = lwb[:, h, :]                            # log-decay (<= 0)
        kk = kb[:, h, :]
        vv = vb[:, h, :]
        aa = ab[:, h, :]
        bb = bbk[:, h, :]
        sT = s_scr[h]                                # (Sk, Sv)

        # ONE transcendental per element: lam = 1/exp(-L); lam_prev = shifted
        # lam (transcendentals, not matmuls, dominate this kernel's runtime)
        L = dot(lower_incl, lw, ((1,), (0,)))        # in-chunk cumsum on MXU
        lam_inv = jnp.exp(-L)
        lam = 1.0 / lam_inv
        khat = kk * lam_inv
        bhat = bb * lam_inv
        lam_prev = jnp.concatenate([jnp.ones((1, lam.shape[1]), jnp.float32), lam[: C - 1]], axis=0)
        ahat = aa * lam_prev
        rhat = rr * lam

        M = dot(ahat, bhat, ((1,), (1,))) * lower_strict       # (C_t, C_s)
        A_k = dot(ahat, khat, ((1,), (1,))) * lower_strict
        G_b = dot(rhat, bhat, ((1,), (1,))) * lower_incl
        G_k = dot(rhat, khat, ((1,), (1,))) * lower_incl

        inv = eye + M
        p = M
        steps = max(1, (C - 1).bit_length() - 1)
        for _ in range(steps):
            p = dot(p, p, ((1,), (0,)))
            inv = dot(inv, eye + p, ((1,), (0,)))

        rhsT = dot(ahat, sT, ((1,), (0,))) + dot(A_k, vv, ((1,), (0,)))
        hcT = dot(inv, rhsT, ((1,), (0,)))           # (C, Sv)

        out_ref[:, h, :] = (
            dot(rhat, sT, ((1,), (0,)))
            + dot(G_b, hcT, ((1,), (0,)))
            + dot(G_k, vv, ((1,), (0,)))
        )

        lam_c = lam[C - 1, :]                        # (Sk,)
        s_scr[h] = (
            sT + dot(bhat, hcT, ((0,), (0,))) + dot(khat, vv, ((0,), (0,)))
        ) * lam_c[:, None]

    @pl.when(tb == pl.num_programs(1) - 1)
    def _():
        sT_ref[...] = s_scr[...]


@functools.partial(jax.jit, static_argnames=("chunk", "head_block"))
def wkv7_chunked_pallas(r, lw, k, v, a, b, state, chunk: int = 64, head_block: int = 8):
    """Fused chunked wkv7: r/k/v/a/b (T, H, S) f32, lw = log(decay) (<= 0;
    callers have it for free — RWKV-7's decay is exp(-0.6065*sigmoid(.)));
    state (H, Sv, Sk). T must be a multiple of `chunk` (pad with lw=0,
    k=v=a=b=0). Returns (out (T, H, S), final state (H, Sv, Sk))."""
    T, H, S = r.shape
    assert T % chunk == 0
    HB = min(head_block, H)
    while H % HB:
        HB -= 1

    grid = (H // HB, T // chunk)
    vec_spec = pl.BlockSpec((chunk, HB, S), lambda h, t: (t, h, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((HB, S, S), lambda h, t: (h, 0, 0), memory_space=pltpu.VMEM)

    sT0 = jnp.swapaxes(state.astype(jnp.float32), -1, -2)  # (H, Sk, Sv)
    out, sT = pl.pallas_call(
        functools.partial(_wkv7_chunk_kernel, heads_per_block=HB),
        grid=grid,
        in_specs=[vec_spec] * 6 + [st_spec],
        out_specs=[vec_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, S), jnp.float32),
            jax.ShapeDtypeStruct((H, S, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HB, S, S), jnp.float32)],
    )(r.astype(jnp.float32), lw.astype(jnp.float32), k.astype(jnp.float32),
      v.astype(jnp.float32), a.astype(jnp.float32), b.astype(jnp.float32), sT0)
    return out, jnp.swapaxes(sT, -1, -2)


def wkv7_chunked_pallas_batched(r, lw, k, v, a, b, state, valid, chunk: int = 64,
                                head_block: int = 16):
    """Batched fused chunked wkv7 via (B, H) folding (no vmap — the Pallas
    batching rule can't lower this kernel, and folding is faster anyway:
    the grid parallelizes over all B*H head-states at once).
    Shapes: r/lw/.. (B, T, H, S), lw = log(decay); state (B, H, Sv, Sk);
    valid (B, T)."""
    from rwkv_tpu.ops.wkv_chunked import _fold_batch

    B, T, H, S = r.shape
    out, st = wkv7_chunked_pallas(
        _fold_batch(r, 0.0, valid, chunk), _fold_batch(lw, 0.0, valid, chunk),
        _fold_batch(k, 0.0, valid, chunk), _fold_batch(v, 0.0, valid, chunk),
        _fold_batch(a, 0.0, valid, chunk), _fold_batch(b, 0.0, valid, chunk),
        state.reshape(B * H, S, S), chunk=chunk, head_block=head_block,
    )
    out = jnp.swapaxes(out[:T].reshape(T, B, H, S), 0, 1)
    return out, st.reshape(B, H, S, S)
