"""Isolated wkv7 step-kernel cost at decode shapes (round 5).

Chains N kernel calls in one jitted lax.scan (state carried, fresh vectors
per step from a tiny table) so per-call overhead and DMA pipelining show up
like they do in the real decode body. Floor = one state read + one write at
819 GB/s.

Usage: python scratch/step_bench_r5.py [BH ...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from rwkv_tpu.ops import pallas_wkv as PW

S = 64
N_STEPS = 64
HBM_GBS = 819.0


# --- experimental kernel variants -----------------------------------------

def _kernel_packed(r_ref, w_ref, k_ref, v_ref, vo_ref, a_ref, b_ref, s0_ref,
                   out_ref, sT_ref):
    """Lane-packed wkv7 step: the (HB, 64, 64) state block is viewed as
    (HB, 32, 128) — two consecutive sv rows side-by-side in the lane dim
    (a free row-major bitcast outside the kernel) — so every elementwise op
    runs on FULL 128-lane vregs instead of half-empty 64-lane ones. The two
    S-deep segmented reductions (sa = s·a, out = s_new·r) become ONE MXU dot
    each against a constant block-diagonal ones matrix M (128, 128):
    dot(t, M)[.., l] = sum of t's half containing l — reduction AND
    broadcast-back in a single op.

    Inputs: r/w/k/a/b pre-tiled to (HB, 128) = concat([x, x]); v split to
    v_even/v_odd (HB, 32) outside; state (HB, 32, 128). out is (HB, 32, 2) — reshape to
    (HB, 64) outside is a free bitcast (sv = 2r + j)."""
    HB = s0_ref.shape[0]
    sp = s0_ref[...].astype(jnp.float32)             # (HB, 32, 128)
    r = r_ref[...]
    w = w_ref[...]
    k = k_ref[...]
    a = a_ref[...]
    b = b_ref[...]
    ve = v_ref[...]                                  # (HB, 32)
    vo = vo_ref[...]                                 # (HB, 32)

    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    M = ((row < 64) == (col < 64)).astype(jnp.float32)
    ER = ((row // 64) == (col % 2)).astype(jnp.float32)[:, :2]  # (128, 2)

    def halfdot(t, m):
        return jax.lax.dot_general(
            t.reshape(HB * 32, 128), m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    saexp = halfdot(sp * a[:, None, :], M).reshape(HB, 32, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (HB, 32, 128), 2)
    vexp = jnp.where(lane < 64, ve[:, :, None], vo[:, :, None])
    s_new = (sp * w[:, None, :] + vexp * k[:, None, :]
             + saexp * b[:, None, :])
    sT_ref[...] = s_new.astype(sT_ref.dtype)
    out_ref[...] = halfdot(s_new * r[:, None, :], ER).reshape(HB, 32, 2)


@functools.partial(jax.jit, static_argnames=("head_block",))
def step_packed(r, w, k, v, a, b, state, head_block=128):
    """state (BH, S, S) bf16; returns (out (BH, S) f32, new state)."""
    BH, S = r.shape
    HB = min(head_block, BH)
    while BH % HB:
        HB -= 1
    t2 = lambda x: jnp.concatenate([x, x], axis=-1)
    v_even, v_odd = v[:, 0::2], v[:, 1::2]            # (BH, 32) each
    sp = state.reshape(BH, 32, 128)
    vec = pl.BlockSpec((HB, 128), lambda h: (h, 0), memory_space=pltpu.VMEM)
    vv = pl.BlockSpec((HB, 32), lambda h: (h, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((HB, 32, 128), lambda h: (h, 0, 0),
                      memory_space=pltpu.VMEM)
    ot = pl.BlockSpec((HB, 32, 2), lambda h: (h, 0, 0),
                      memory_space=pltpu.VMEM)
    out, stf = pl.pallas_call(
        _kernel_packed,
        grid=(BH // HB,),
        in_specs=[vec] * 3 + [vv, vv] + [vec] * 2 + [st],
        out_specs=[ot, st],
        out_shape=[
            jax.ShapeDtypeStruct((BH, 32, 2), jnp.float32),
            jax.ShapeDtypeStruct((BH, 32, 128), state.dtype),
        ],
    )(t2(r), t2(w), t2(k), v_even, v_odd, t2(a), t2(b), sp)
    return out.reshape(BH, S), stf.reshape(BH, S, S)

def _kernel_copyonly(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                     out_ref, sT_ref):
    """Wrong math: state passthrough (astype only) — isolates DMA+grid cost
    from the VPU chain."""
    sT_ref[...] = s0_ref[...]
    out_ref[...] = r_ref[...]


def _kernel_half(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                 out_ref, sT_ref):
    """Wrong math: decay-only state update + out reduction (drops sa and
    the two rank-1 terms — roughly half the VPU chain)."""
    s = s0_ref[...].astype(jnp.float32)
    s = s * w_ref[...][:, None, :]
    sT_ref[...] = s.astype(sT_ref.dtype)
    out_ref[...] = jnp.sum(s * r_ref[...][:, None, :], axis=2)


def _kernel_oldstate(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                     out_ref, sT_ref):
    """Exact math, restructured: both S-deep reductions read the OLD state
    and fuse into ONE batched MXU dot with 2 columns; the VPU keeps only the
    broadcast elementwise state update (~5 ops/elem instead of ~11):

      sa  = s . a
      out = s_new . r = s.(w*r) + v (k.r) + sa (b.r)
    """
    s = s0_ref[...].astype(jnp.float32)              # (HB, Sv, Sk)
    r = r_ref[...]
    w = w_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    a = a_ref[...]
    b = b_ref[...]
    cols = jnp.stack([a, w * r], axis=2)             # (HB, Sk, 2)
    red = jax.lax.dot_general(
        s, cols, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (HB, Sv, 2)
    sa = red[:, :, 0]
    swr = red[:, :, 1]
    kr = jnp.sum(k * r, axis=1, keepdims=True)       # (HB, 1)
    br = jnp.sum(b * r, axis=1, keepdims=True)
    sT_ref[...] = (
        s * w[:, None, :]
        + v[:, :, None] * k[:, None, :]
        + sa[:, :, None] * b[:, None, :]
    ).astype(sT_ref.dtype)
    out_ref[...] = swr + v * kr + sa * br

def _kernel_bf16(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                 out_ref, sT_ref):
    """Interior entirely in the state dtype (bf16): no astype pass, half the
    VPU bytes. sa/out reductions accumulate f32 via preferred_element_type of
    jnp.sum? (jnp.sum on bf16 accumulates bf16 — use f32 upcast on the small
    (HB, S) reductions only.)"""
    s = s0_ref[...]                                   # (HB, Sv, Sk) bf16
    a = a_ref[...].astype(s.dtype)
    sa = jnp.sum((s * a[:, None, :]).astype(jnp.float32), axis=2)
    s = (
        s * w_ref[...].astype(s.dtype)[:, None, :]
        + (v_ref[...][:, :, None] * k_ref[...][:, None, :]).astype(s.dtype)
        + (sa[:, :, None] * b_ref[...][:, None, :]).astype(s.dtype)
    )
    sT_ref[...] = s
    out_ref[...] = jnp.sum(
        (s * r_ref[...].astype(s.dtype)[:, None, :]).astype(jnp.float32),
        axis=2)


@functools.partial(jax.jit, static_argnames=("head_block", "kernel", "alias",
                                              "vmem_mb"))
def step_variant(r, w, k, v, a, b, state, head_block=128, kernel="f32",
                 alias=False, vmem_mb=0):
    BH, _ = r.shape
    HB = min(head_block, BH)
    while BH % HB:
        HB -= 1
    body = {"f32": PW._wkv7_step_kernel, "copy": _kernel_copyonly,
            "half": _kernel_half, "oldstate": _kernel_oldstate}[kernel]
    vec = pl.BlockSpec((HB, S), lambda h: (h, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
    kw = {}
    cp = {}
    if alias:
        kw["input_output_aliases"] = {6: 1}
        cp["dimension_semantics"] = ("parallel",)
    if vmem_mb:
        cp["vmem_limit_bytes"] = vmem_mb * 1024 * 1024
    if cp:
        kw["compiler_params"] = pltpu.CompilerParams(**cp)
    out, stf = pl.pallas_call(
        body,
        grid=(BH // HB,),
        in_specs=[vec] * 6 + [st],
        out_specs=[vec, st],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, S), state.dtype),
        ],
        **kw,
    )(r, w, k, v, a, b, state)
    return out, stf


def run(BH, label, fn):
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.standard_normal((8, 6, BH, S)), jnp.float32) * 0.1
    state0 = jnp.asarray(rng.standard_normal((BH, S, S)), jnp.bfloat16)

    def make_loop(n):
        @jax.jit
        def loop(state):
            def body(s, i):
                r, w, k, v, a, b = (vecs[i % 8, j] for j in range(6))
                o, s = fn(r, jax.nn.sigmoid(w), k, v, a, b, s)
                return s, o[0, 0]
            s, os_ = jax.lax.scan(body, state, jnp.arange(n), unroll=8)
            # scalar result: device_get of the full state costs ~100 ms over
            # the axon tunnel and would dominate the measurement
            return s[0, 0, 0].astype(jnp.float32) + os_.sum()
        return loop

    # two-length diff cancels the per-dispatch axon-relay latency (~8 ms),
    # which otherwise dominates: device time for 64 calls is only ~2 ms
    n_small, n_big = 128, 1152
    small, big = make_loop(n_small), make_loop(n_big)
    _ = jax.device_get(small(state0))
    _ = jax.device_get(big(state0))
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = small(state0)
    _ = jax.device_get(out)
    t_small = (time.time() - t0) / reps
    t0 = time.time()
    for _ in range(reps):
        out = big(state0)
    _ = jax.device_get(out)
    t_big = (time.time() - t0) / reps
    dt = (t_big - t_small) / (n_big - n_small)
    bytes_ = 2 * BH * S * S * 2  # bf16 state r+w
    floor = bytes_ / HBM_GBS / 1e9
    print(f"BH={BH:5d} {label:28s} {dt*1e6:8.2f} us/call  "
          f"floor {floor*1e6:6.2f} us  ({100*floor/dt:5.1f}% of floor)",
          flush=True)


def main():
    # numeric check of the packed kernel vs the production one
    rng = np.random.default_rng(1)
    BHc = 256
    vecs = [jnp.asarray(rng.standard_normal((BHc, S)), jnp.float32) * 0.3
            for _ in range(6)]
    vecs[1] = jax.nn.sigmoid(vecs[1])  # w in (0, 1)
    st0 = jnp.asarray(rng.standard_normal((BHc, S, S)), jnp.bfloat16)
    o_ref, s_ref = PW.wkv7_step_pallas(*vecs, st0)
    o_p, s_p = step_packed(*vecs, st0)
    eo = float(jnp.max(jnp.abs(o_p - o_ref)) / (jnp.max(jnp.abs(o_ref)) + 1e-9))
    es = float(jnp.max(jnp.abs(s_p.astype(jnp.float32) - s_ref.astype(jnp.float32)))
               / (jnp.max(jnp.abs(s_ref.astype(jnp.float32))) + 1e-9))
    print(f"packed-vs-prod rel err: out {eo:.2e}  state {es:.2e}", flush=True)

    bhs = [int(x) for x in sys.argv[1:]] or [512, 1024, 4096, 8192]
    for BH in bhs:
        run(BH, "copy-only (DMA+grid floor)",
            lambda *a: step_variant(*a, kernel="copy"))
        run(BH, "v1 f32 HB=128 (prod)", lambda *a: step_variant(*a))
        run(BH, "v1 + alias", lambda *a: step_variant(*a, alias=True))
        run(BH, "oldstate (1 MXU dot)",
            lambda *a: step_variant(*a, kernel="oldstate"))
        run(BH, "oldstate + alias",
            lambda *a: step_variant(*a, kernel="oldstate", alias=True))
        run(BH, "packed HB=128", lambda *a: step_packed(*a))
        # bf16 interior: Mosaic rejects the bf16 [:, None, :] shape cast
        # (vector<128x64xbf16> -> 128x1x64) — dead end, f32 interior only


if __name__ == "__main__":
    main()
