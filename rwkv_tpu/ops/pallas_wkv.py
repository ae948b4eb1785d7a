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
