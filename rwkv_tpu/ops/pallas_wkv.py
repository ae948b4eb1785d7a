"""Fused chunk-parallel Pallas TPU kernels for the WKV recurrences.

Both model families get one fused kernel each, dispatched by
models/forward.py for TPU prefill (the reference's analogue is one fused
ggml op per layer: ggml_rwkv_wkv6 at rwkv_graph.inc:275/370, rwkv_wkv_v7 at
rwkv_operators_wkv_v7.inc:61-99 — semantics transcribed in ops/wkv.py and
validated against it):

  - wkv7: WY chunk formulation — the diag-plus-rank-1 transition collapses a
    chunk into dense MXU dots with a Neumann triangular inverse; f32-safe
    because RWKV-7 bounds w >= exp(-0.6065).
  - wkv6/wkv5: sub-chunked clipped-pairwise formulation — v6's decay is
    unbounded below, so sub-chunks keep every factor <= 1 (see the kernel's
    comment block).

Shared design: grid over (head_blocks, T_blocks); the per-head S×S f32 state
lives in VMEM scratch across the whole T loop (streaming it to HBM per step
is what makes the naive XLA scan memory-bound); batch folds into the head
grid ((B, H) -> B*H states). Sequential per-token T-loop kernels were
measured and removed: at T=1 the per-program overhead of tiny vector blocks
loses to the XLA scan at every batch size (docs/KERNELS.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# fused single-token wkv7 decode step. The jnp step (ops/wkv.py::wkv7_step)
# lowers to ~5 XLA fusions that each re-stream the (B, H, S, S) state from
# HBM; this kernel reads the state once and writes it once. Measured on
# v5e (int8 1.5B decode): LOSES at B=8 (3.58 -> 3.83 ms/step — the custom
# call breaks XLA's cross-op fusion, and at small B the state is a minor
# term) but WINS at large B where state traffic dominates the step —
# models/forward.py dispatches it by batch size (STEP_KERNEL_MIN_B).
# ---------------------------------------------------------------------------

# v3 experiment knobs for the v1 step kernels (A/B'd at model level by
# scratch/step_ab.py; the v2 stacked-operand rebuild measured a LOSS, see
# STEP_V2 below):
#   STEP_ALIAS — alias the state input to the state output buffer
#     (input_output_aliases) and mark the head grid parallel: the in-place
#     update removes any XLA copy-for-donation around the custom call.
#   STEP_MXU  — issue the two S-contractions (sa = s·a, out = s'·r) as
#     batched dot_generals so they run on the MXU instead of the VPU
#     (the kernel interior is ~9 VPU ops/elem; the two reductions are 4
#     of them).
STEP_ALIAS = False
STEP_MXU = False


def _bmv(s, x):
    """(HB, Sv, Sk) · (HB, Sk) -> (HB, Sv): batched matvec, MXU-eligible."""
    return jax.lax.dot_general(
        s, x, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def _wkv7_step_kernel(r_ref, w_ref, k_ref, v_ref, a_ref, b_ref, s0_ref,
                      out_ref, sT_ref):
    # the state may be carried in bf16 (halves the dominant HBM term at
    # large batch); compute is f32 either way, rounded back on store
    s = s0_ref[...].astype(jnp.float32)              # (HB, Sv, Sk)
    a = a_ref[...]
    if STEP_MXU:
        sa = _bmv(s, a)
    else:
        sa = jnp.sum(s * a[:, None, :], axis=2)      # (HB, Sv)
    s = (
        s * w_ref[...][:, None, :]
        + v_ref[...][:, :, None] * k_ref[...][:, None, :]
        + sa[:, :, None] * b_ref[...][:, None, :]
    )
    sT_ref[...] = s.astype(sT_ref.dtype)
    if STEP_MXU:
        out_ref[...] = _bmv(s, r_ref[...])
    else:
        out_ref[...] = jnp.sum(s * r_ref[...][:, None, :], axis=2)


def _step_head_block(head_block, BH, S, state_dtype):
    """Clamp the per-grid-step head block to the VMEM budget: the state
    block lives in VMEM as carry-in (state dtype), f32 compute values, and
    carry-out, double-buffered — ~22 MB at HB=256 S=64 exceeds the 16 MB
    scoped limit (measured). HB=128 measured best at B=128 on v5e (11.4k
    vs 11.0k tok/s at HB=32); 64 is within noise of 32 at small batch."""
    HB = min(head_block, BH)
    per_head = S * S * (jnp.dtype(state_dtype).itemsize * 2 + 8)
    # 13.5 MB budget: bf16-state HB=128 at S=64 uses 12.6 MB (measured ok);
    # f32-state HB=128 would need 16.8 MB (over the 16 MB scoped limit) and
    # clamps to 64
    while HB > 8 and HB * per_head * 2 > 13_500_000:
        HB //= 2
    while BH % HB:
        HB -= 1
    return HB


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv7_step_pallas(r, w, k, v, a, b, state, head_block: int = 128):
    """One decode step, (B, H) folded: r/w/k/v/a/b (BH, S) f32, state
    (BH, Sv, Sk) f32 or bf16 (the carry dtype is preserved on the output
    state). Returns (out (BH, S) f32, new state)."""
    BH, S = r.shape
    HB = _step_head_block(head_block, BH, S, state.dtype)
    vec_spec = pl.BlockSpec((HB, S), lambda h: (h, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
    kw = {}
    if STEP_ALIAS:
        kw = dict(input_output_aliases={6: 1},
                  compiler_params=pltpu.CompilerParams(
                      dimension_semantics=("parallel",)))
    out, st = pl.pallas_call(
        _wkv7_step_kernel,
        grid=(BH // HB,),
        in_specs=[vec_spec] * 6 + [st_spec],
        out_specs=[vec_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, S), state.dtype),
        ],
        **kw,
    )(r, w, k, v, a, b, state)
    return out, st


# ---------------------------------------------------------------------------
# Lane-packed wkv7 step kernels (round 5). The (HB, S, S) blocks of the v1
# kernels above put S=64 in the lane dim, so every VPU op runs on half-empty
# 128-lane vregs, and the two S-deep reductions (sa = s·a, out = s_new·r)
# are 6-step lane shuffles — measured 35 us/call at BH=512 with the state
# resident in VMEM, pure interior cost (scratch/step_bench_r5.py). The
# packed variants view the state as (HB, S/2, 2S) = (HB, 32, 128) — two
# consecutive sv rows side-by-side in the lane dim, a FREE row-major bitcast
# reshape outside the kernel — so elementwise ops run on full vregs, and
# each segmented reduction becomes ONE MXU dot against a constant
# block-diagonal ones matrix M (128, 128): dot(t, M)[.., l] = sum of t's
# half containing l — reduction AND broadcast-back in a single op.
#
# The MXU dots run at DEFAULT precision (operands rounded to bf16), so the
# kernel is exact only to ~1e-3 relative — the same error class as the bf16
# state carry itself. Dispatch (wkv7_step_batched*) therefore uses the
# packed form ONLY for bf16-carried state (the serving/decode state_bf16
# regime where BH >= 512 perf matters); f32 states keep the exact v1 form.
# Measured (isolated, VMEM-resident state): 33 vs 44 us/call at BH=512,
# 60 vs 67 at BH=1024.
# ---------------------------------------------------------------------------


def _packed_consts(HB):
    row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    M = ((row < 64) == (col < 64)).astype(jnp.float32)
    ER = ((row // 64) == (col % 2)).astype(jnp.float32)[:, :2]   # (128, 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (HB, 32, 128), 2)
    return M, ER, lane


def _packed_body(sp, r, w, k, ve, vo, a, b, out_ref, sT_ref, sT_idx=None):
    """Shared packed-step math: sp (HB, 32, 128) f32, r/w/k/a/b (HB, 128)
    tiled [x|x], ve/vo (HB, 32). Writes out (HB, 32, 2) and the new state."""
    HB = sp.shape[0]
    M, ER, lane = _packed_consts(HB)

    def halfdot(t, m):
        return jax.lax.dot_general(
            t.reshape(HB * 32, 128), m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    saexp = halfdot(sp * a[:, None, :], M).reshape(HB, 32, 128)
    vexp = jnp.where(lane < 64, ve[:, :, None], vo[:, :, None])
    s_new = (sp * w[:, None, :] + vexp * k[:, None, :]
             + saexp * b[:, None, :])
    if sT_idx is None:
        sT_ref[...] = s_new.astype(sT_ref.dtype)
    else:
        sT_ref[sT_idx] = s_new.astype(sT_ref.dtype)
    out_ref[...] = halfdot(s_new * r[:, None, :], ER).reshape(HB, 32, 2)


def _wkv7_step_kernel_packed(r_ref, w_ref, k_ref, ve_ref, vo_ref, a_ref,
                             b_ref, s0_ref, out_ref, sT_ref):
    _packed_body(s0_ref[...].astype(jnp.float32), r_ref[...], w_ref[...],
                 k_ref[...], ve_ref[...], vo_ref[...], a_ref[...], b_ref[...],
                 out_ref, sT_ref)


def _wkv7_step_kernel_packed_l(l_ref, r_ref, w_ref, k_ref, ve_ref, vo_ref,
                               a_ref, b_ref, s0_ref, out_ref, sT_ref):
    _packed_body(s0_ref[0].astype(jnp.float32), r_ref[...], w_ref[...],
                 k_ref[...], ve_ref[...], vo_ref[...], a_ref[...], b_ref[...],
                 out_ref, sT_ref, sT_idx=0)


def _packed_operands(r, w, k, v, a, b):
    t2 = lambda x: jnp.concatenate([x, x], axis=-1)      # (BH, 128) [x|x]
    return t2(r), t2(w), t2(k), v[:, 0::2], v[:, 1::2], t2(a), t2(b)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv7_step_pallas_packed(r, w, k, v, a, b, state, head_block: int = 128):
    """Lane-packed wkv7 decode step: r/w/k/v/a/b (BH, S=64) f32, state
    (BH, S, S) (bf16 carry intended). Returns (out (BH, S) f32, new state).
    ~1e-3-exact (MXU DEFAULT-precision reductions)."""
    BH, S = r.shape
    assert S == 64, "packed step kernel requires head size 64"
    HB = _step_head_block(head_block, BH, S, state.dtype)
    sp = state.reshape(BH, 32, 128)
    vec = pl.BlockSpec((HB, 128), lambda h: (h, 0), memory_space=pltpu.VMEM)
    vv = pl.BlockSpec((HB, 32), lambda h: (h, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((HB, 32, 128), lambda h: (h, 0, 0),
                      memory_space=pltpu.VMEM)
    ot = pl.BlockSpec((HB, 32, 2), lambda h: (h, 0, 0),
                      memory_space=pltpu.VMEM)
    out, stf = pl.pallas_call(
        _wkv7_step_kernel_packed,
        grid=(BH // HB,),
        in_specs=[vec] * 3 + [vv, vv] + [vec] * 2 + [st],
        out_specs=[ot, st],
        out_shape=[
            jax.ShapeDtypeStruct((BH, 32, 2), jnp.float32),
            jax.ShapeDtypeStruct((BH, 32, 128), state.dtype),
        ],
    )(*_packed_operands(r, w, k, v, a, b), sp)
    return out.reshape(BH, S), stf.reshape(BH, S, S)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv7_step_pallas_lstacked_packed(r, w, k, v, a, b, state, layer,
                                     head_block: int = 128):
    """Lane-packed twin of wkv7_step_pallas_lstacked: state (L, BH, S, S),
    slot `layer` advanced IN PLACE (aliased)."""
    BH, S = r.shape
    assert S == 64, "packed step kernel requires head size 64"
    L = state.shape[0]
    HB = _step_head_block(head_block, BH, S, state.dtype)
    sp = state.reshape(L, BH, 32, 128)
    vec = pl.BlockSpec((HB, 128), lambda h, l: (h, 0), memory_space=pltpu.VMEM)
    vv = pl.BlockSpec((HB, 32), lambda h, l: (h, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((1, HB, 32, 128), lambda h, l: (l[0], h, 0, 0),
                      memory_space=pltpu.VMEM)
    ot = pl.BlockSpec((HB, 32, 2), lambda h, l: (h, 0, 0),
                      memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH // HB,),
        in_specs=[vec] * 3 + [vv, vv] + [vec] * 2 + [st],
        out_specs=[ot, st],
    )
    out, stf = pl.pallas_call(
        _wkv7_step_kernel_packed_l,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, 32, 2), jnp.float32),
            jax.ShapeDtypeStruct(sp.shape, state.dtype),
        ],
        # operand 0 is the scalar-prefetch layer index; state is operand 8
        input_output_aliases={8: 1},
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      *_packed_operands(r, w, k, v, a, b), sp)
    return out.reshape(BH, S), stf.reshape(state.shape)


# MEASURED LOSS at model level (round 5, default off): isolated, the packed
# kernels win (33 vs 44 us/call at BH=512, 60 vs 67 at BH=1024,
# scratch/step_bench_r5.py) — but in the serving loop they LOSE 28%
# (B=32 sampled 3,391 vs 4,697 tok/s, scratch/packed_ab_r5.py, interleaved
# same-process A/B). The (L, BH, S, S) -> (L, BH, 32, 128) reshape around
# the aliased pallas_call defeats the input/output state aliasing, so XLA
# re-materializes the FULL stacked state every layer — exactly the
# per-layer copy the L-stacked kernels exist to avoid (~110 us/layer at
# B=32). A win would need the serving state carried in the packed layout
# end-to-end; parked. Flip STEP_PACKED to re-measure.
STEP_PACKED = False


def _use_packed(state, S):
    """The packed kernels trade ~1e-3 exactness (MXU DEFAULT-precision
    reductions) for full-vreg VPU work — the same error class as the bf16
    state carry, so they would dispatch only for bf16-carried states; see
    STEP_PACKED above for why they are off by default."""
    return STEP_PACKED and S == 64 and state.dtype == jnp.bfloat16


# Round-5 step-kernel experiment (MEASURED LOSS — default off): the v1
# kernels above move 8-10 separate BlockSpec streams per grid step; the v2
# kernels stack the vectors into ONE (6, BH, S) operand, alias the state
# input to the state output, and mark the head grid parallel. On-chip
# (1.5B v7 w4a8bc decode, scratch/step_ab_r5.log): v2 LOSES — B=32
# 6,784 vs 7,010 tok/s (-3%), B=128 9,978 vs 11,025 (-10%). The jnp.stack
# feeding the kernel is a real extra pass over all six vectors per step,
# and the separate tiny DMAs were never the binder. Kept for reference;
# tests pin both forms.
STEP_V2 = False


def _wkv7_step_kernel_v2(vecs_ref, s0_ref, out_ref, sT_ref):
    s = s0_ref[...].astype(jnp.float32)              # (HB, Sv, Sk)
    r, w, k, v, a, b = (vecs_ref[i] for i in range(6))
    sa = jnp.sum(s * a[:, None, :], axis=2)          # (HB, Sv)
    s = (
        s * w[:, None, :]
        + v[:, :, None] * k[:, None, :]
        + sa[:, :, None] * b[:, None, :]
    )
    sT_ref[...] = s.astype(sT_ref.dtype)
    out_ref[...] = jnp.sum(s * r[:, None, :], axis=2)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv7_step_pallas_v2(vecs, state, head_block: int = 128):
    """One decode step: vecs (6, BH, S) f32 stacked [r, w, k, v, a, b],
    state (BH, Sv, Sk) f32 or bf16 (carry dtype preserved; in-place via
    input_output_aliases). Returns (out (BH, S) f32, new state)."""
    _, BH, S = vecs.shape
    HB = _step_head_block(head_block, BH, S, state.dtype)
    out, st = pl.pallas_call(
        _wkv7_step_kernel_v2,
        grid=(BH // HB,),
        in_specs=[
            pl.BlockSpec((6, HB, S), lambda h: (0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((HB, S), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, S), state.dtype),
        ],
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the stacked vec block pushes HB=128 just past the default
            # 16 MB scoped-vmem cap; v5e has 128 MB physical VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
    )(vecs, state)
    return out, st


# ---------------------------------------------------------------------------
# L-stacked IN-PLACE step kernels. The decode/serving state is layer-major
# (L, B, H, S, S); with the per-layer kernels above, XLA must copy each
# kernel's (B, H, S, S) output back into the stacked array — measured as 24
# constant_dynamic-update-slice fusions of 51 us each at B=32 serving
# (1.2 ms/step, scratch/traces/serve_w16). These variants take the FULL
# stacked state plus the layer index as a scalar-prefetch arg, write only
# slot `layer`, and alias the state input to the state output, so the
# update is genuinely in place and the separate copy pass disappears.
# ---------------------------------------------------------------------------


def _wkv7_step_kernel_l(l_ref, r_ref, w_ref, k_ref, v_ref, a_ref, b_ref,
                        s0_ref, out_ref, sT_ref):
    s = s0_ref[0].astype(jnp.float32)                # (HB, Sv, Sk)
    a = a_ref[...]
    if STEP_MXU:
        sa = _bmv(s, a)
    else:
        sa = jnp.sum(s * a[:, None, :], axis=2)      # (HB, Sv)
    s = (
        s * w_ref[...][:, None, :]
        + v_ref[...][:, :, None] * k_ref[...][:, None, :]
        + sa[:, :, None] * b_ref[...][:, None, :]
    )
    sT_ref[0] = s.astype(sT_ref.dtype)
    if STEP_MXU:
        out_ref[...] = _bmv(s, r_ref[...])
    else:
        out_ref[...] = jnp.sum(s * r_ref[...][:, None, :], axis=2)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv7_step_pallas_lstacked(r, w, k, v, a, b, state, layer,
                              head_block: int = 128):
    """One decode step against the FULL layer-stacked state: r/w/k/v/a/b
    (BH, S) f32, state (L, BH, Sv, Sk) f32 or bf16, layer a scalar index.
    Writes slot `layer` IN PLACE (input_output_aliases) and returns
    (out (BH, S) f32, the same stacked state with slot `layer` advanced)."""
    BH, S = r.shape
    HB = _step_head_block(head_block, BH, S, state.dtype)
    vec = pl.BlockSpec((HB, S), lambda h, l: (h, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((1, HB, S, S), lambda h, l: (l[0], h, 0, 0),
                      memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH // HB,),
        in_specs=[vec] * 6 + [st],
        out_specs=[vec, st],
    )
    out, stf = pl.pallas_call(
        _wkv7_step_kernel_l,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        # operand 0 is the scalar-prefetch layer index; state is operand 7
        input_output_aliases={7: 1},
    )(jnp.asarray(layer, jnp.int32).reshape(1), r, w, k, v, a, b, state)
    return out, stf


def wkv7_step_batched_lstacked(r, w, k, v, a, b, state, layer,
                               head_block: int = 128):
    """(B, H, S) vectors against (L, B, H, S, S) stacked state; returns
    (out (B, H, S), updated stacked state)."""
    B, H, S = r.shape
    L = state.shape[0]
    fold = lambda x: x.reshape(B * H, *x.shape[2:])
    fn = (wkv7_step_pallas_lstacked_packed if _use_packed(state, S)
          else wkv7_step_pallas_lstacked)
    out, stf = fn(
        fold(r), fold(w), fold(k), fold(v), fold(a), fold(b),
        state.reshape(L, B * H, S, S), layer, head_block=head_block)
    return out.reshape(B, H, S), stf.reshape(L, B, H, S, S)


def _wkv56_step_kernel_l(l_ref, r_ref, k_ref, v_ref, w_ref, tf_ref, s0_ref,
                         out_ref, sT_ref):
    s = s0_ref[0].astype(jnp.float32)                # (HB, Sk, Sv)
    k = k_ref[...]
    v = v_ref[...]
    kv = k[:, :, None] * v[:, None, :]
    if STEP_MXU:
        out_ref[...] = jax.lax.dot_general(
            r_ref[...], s + tf_ref[...][:, :, None] * kv,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    else:
        out_ref[...] = jnp.sum(
            (s + tf_ref[...][:, :, None] * kv) * r_ref[...][:, :, None],
            axis=1)
    sT_ref[0] = (s * w_ref[...][:, :, None] + kv).astype(sT_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv56_step_pallas_lstacked(r, k, v, tf, w, state, layer,
                               head_block: int = 128):
    """v5/v6 twin of wkv7_step_pallas_lstacked: state (L, BH, Sk, Sv),
    slot `layer` advanced in place."""
    BH, S = r.shape
    HB = _step_head_block(head_block, BH, S, state.dtype)
    vec = pl.BlockSpec((HB, S), lambda h, l: (h, 0), memory_space=pltpu.VMEM)
    st = pl.BlockSpec((1, HB, S, S), lambda h, l: (l[0], h, 0, 0),
                      memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH // HB,),
        in_specs=[vec] * 5 + [st],
        out_specs=[vec, st],
    )
    out, stf = pl.pallas_call(
        _wkv56_step_kernel_l,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct(state.shape, state.dtype),
        ],
        input_output_aliases={6: 1},
    )(jnp.asarray(layer, jnp.int32).reshape(1), r, k, v, w, tf, state)
    return out, stf


def wkv56_step_batched_lstacked(r, k, v, tf, w, state, layer,
                                head_block: int = 128):
    """(B, H, S) vectors against (L, B, H, S, S) stacked state; tf/w may be
    (H, S) (v5's constant decay) — broadcast here."""
    B, H, S = r.shape
    L = state.shape[0]
    fold = lambda x: x.reshape(B * H, *x.shape[2:])
    out, stf = wkv56_step_pallas_lstacked(
        fold(r), fold(k), fold(v),
        fold(jnp.broadcast_to(tf, (B, H, S))),
        fold(jnp.broadcast_to(w, (B, H, S))),
        state.reshape(L, B * H, S, S), layer, head_block=head_block)
    return out.reshape(B, H, S), stf.reshape(L, B, H, S, S)


def wkv7_step_batched(r, w, k, v, a, b, state, head_block: int = 128):
    """Drop-in for ops/wkv.py::wkv7_step at (B, H, S) shapes."""
    B, H, S = r.shape
    fold = lambda x: x.reshape(B * H, *x.shape[2:])
    if STEP_V2:
        vecs = jnp.stack([fold(r), fold(w), fold(k), fold(v), fold(a),
                          fold(b)])
        out, st = wkv7_step_pallas_v2(vecs, fold(state),
                                      head_block=head_block)
        return out.reshape(B, H, S), st.reshape(B, H, S, S)
    fn = (wkv7_step_pallas_packed if _use_packed(state, S)
          else wkv7_step_pallas)
    out, st = fn(
        fold(r), fold(w), fold(k), fold(v), fold(a), fold(b), fold(state),
        head_block=head_block,
    )
    return out.reshape(B, H, S), st.reshape(B, H, S, S)


def _wkv56_step_kernel(r_ref, k_ref, v_ref, w_ref, tf_ref, s0_ref,
                       out_ref, sT_ref):
    s = s0_ref[...].astype(jnp.float32)              # (HB, Sk, Sv)
    k = k_ref[...]
    v = v_ref[...]
    kv = k[:, :, None] * v[:, None, :]
    if STEP_MXU:
        # batched vec·mat on the MXU: contraction over Sk (axis 1 of s)
        out_ref[...] = jax.lax.dot_general(
            r_ref[...], s + tf_ref[...][:, :, None] * kv,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    else:
        out_ref[...] = jnp.sum(
            (s + tf_ref[...][:, :, None] * kv) * r_ref[...][:, :, None],
            axis=1)
    sT_ref[...] = (s * w_ref[...][:, :, None] + kv).astype(sT_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv56_step_pallas(r, k, v, tf, w, state, head_block: int = 128):
    """One v5/v6 decode step, (B, H) folded: r/k/v/w/tf (BH, S) f32, state
    (BH, Sk, Sv) f32 or bf16 (carry dtype preserved, f32 compute). Returns
    (out (BH, S) f32, new state). Same one-read-one-write rationale as the
    wkv7 step kernel above."""
    BH, S = r.shape
    HB = _step_head_block(head_block, BH, S, state.dtype)
    vec_spec = pl.BlockSpec((HB, S), lambda h: (h, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0), memory_space=pltpu.VMEM)
    kw = {}
    if STEP_ALIAS:
        kw = dict(input_output_aliases={5: 1},
                  compiler_params=pltpu.CompilerParams(
                      dimension_semantics=("parallel",)))
    out, st = pl.pallas_call(
        _wkv56_step_kernel,
        grid=(BH // HB,),
        in_specs=[vec_spec] * 5 + [st_spec],
        out_specs=[vec_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, S), state.dtype),
        ],
        **kw,
    )(r, k, v, w, tf, state)
    return out, st


def _wkv56_step_kernel_v2(vecs_ref, s0_ref, out_ref, sT_ref):
    s = s0_ref[...].astype(jnp.float32)              # (HB, Sk, Sv)
    r, k, v, tf, w = (vecs_ref[i] for i in range(5))
    kv = k[:, :, None] * v[:, None, :]
    out_ref[...] = jnp.sum(
        (s + tf[:, :, None] * kv) * r[:, :, None], axis=1)
    sT_ref[...] = (s * w[:, :, None] + kv).astype(sT_ref.dtype)


@functools.partial(jax.jit, static_argnames=("head_block",))
def wkv56_step_pallas_v2(vecs, state, head_block: int = 128):
    """One v5/v6 decode step: vecs (5, BH, S) f32 stacked [r, k, v, tf, w],
    state (BH, Sk, Sv) f32 or bf16 (carry dtype preserved; in-place via
    input_output_aliases). Returns (out (BH, S) f32, new state)."""
    _, BH, S = vecs.shape
    HB = _step_head_block(head_block, BH, S, state.dtype)
    out, st = pl.pallas_call(
        _wkv56_step_kernel_v2,
        grid=(BH // HB,),
        in_specs=[
            pl.BlockSpec((5, HB, S), lambda h: (0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((HB, S), lambda h: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, S, S), lambda h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, S), jnp.float32),
            jax.ShapeDtypeStruct((BH, S, S), state.dtype),
        ],
        input_output_aliases={1: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the stacked vec block pushes HB=128 just past the default
            # 16 MB scoped-vmem cap; v5e has 128 MB physical VMEM
            vmem_limit_bytes=64 * 1024 * 1024),
    )(vecs, state)
    return out, st


def wkv56_step_batched(r, k, v, tf, w, state, head_block: int = 128):
    """Drop-in for ops/wkv.py::wkv56_step at (B, H, S) shapes; tf and w may
    be (H, S) (v5's constant decay) — broadcast across the batch here."""
    B, H, S = r.shape
    fold = lambda x: x.reshape(B * H, *x.shape[2:])
    if STEP_V2:
        vecs = jnp.stack([
            fold(r), fold(k), fold(v),
            fold(jnp.broadcast_to(tf, (B, H, S))),
            fold(jnp.broadcast_to(w, (B, H, S)))])
        out, st = wkv56_step_pallas_v2(vecs, fold(state),
                                       head_block=head_block)
        return out.reshape(B, H, S), st.reshape(B, H, S, S)
    tf_b = fold(jnp.broadcast_to(tf, (B, H, S)))
    w_b = fold(jnp.broadcast_to(w, (B, H, S)))
    out, st = wkv56_step_pallas(
        fold(r), fold(k), fold(v), tf_b, w_b, fold(state), head_block=head_block,
    )
    return out.reshape(B, H, S), st.reshape(B, H, S, S)


# ---------------------------------------------------------------------------
# fused chunk-parallel wkv6 (also serves v5 with per-token-broadcast constant
# decay). Semantics (ggml_rwkv_wkv6, use sites rwkv_graph.inc:275, 370):
#
#   out_t[j] = sum_i r_t[i] * (S[i,j] + tf[i] * k_t[i] * v_t[j])
#   S[i,j]  <- S[i,j] * w_t[i] + k_t[i] * v_t[j]     [i = k_dim, j = v_dim]
#
# Unlike v7, the decay is unbounded below (w = exp(-exp(.)) can be ~e^-20),
# so the WY factored form (k/Lam, r*Lam) would overflow f32. Instead the
# kernel advances in SUB-chunks of `sub` tokens: within a sub-chunk the
# pairwise per-channel decay exp(Lprev_t - L_s) (s < t) is computed directly
# with exponents clipped at 0 (valid entries are pure decay, <= 0; the clip
# only touches masked s >= t garbage), and everything older flows through the
# carried (Sk, Sv) state with Lam_c/Lam_s <= 1 factors — every term bounded.
# The state stays in VMEM scratch across the whole T loop; the cumsum, the
# output contraction, and the state update are MXU dots.
# ---------------------------------------------------------------------------

def _wkv6_chunk_kernel(r_ref, lw_ref, k_ref, v_ref, tf_ref, s0_ref,
                       out_ref, sT_ref, s_scr, *, heads_per_block):
    """One grid step = one sub-chunk of c tokens for HB heads. The grid's T
    dimension iterates sequentially (Pallas guarantee), so the sub-chunk loop
    IS the grid and the per-head state carries across steps in VMEM scratch —
    no in-kernel loop over sub-chunks, which keeps the compiled body small."""
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        s_scr[...] = s0_ref[...]

    c = r_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    strict = (col < row).astype(jnp.float32)        # q[t, s] keeps s < t
    lower_incl = (col <= row).astype(jnp.float32)
    eye = (col == row).astype(jnp.float32)

    def dot(x, y, dims, precision=None):
        return jax.lax.dot_general(x, y, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    # exponent-critical dots must not round inputs to bf16: a 0.4% relative
    # error on a log-decay of -20 is an absolute error of ~0.08 in the
    # exponent, i.e. ~8% on every decayed value. Value-path dots keep the
    # one-pass bf16 MXU mode (DEFAULT) like every other matmul here.
    F32 = jax.lax.Precision.HIGHEST

    rb, lwb, kb, vb = (ref[...] for ref in (r_ref, lw_ref, k_ref, v_ref))
    tfb = tf_ref[...]

    for h in range(heads_per_block):
        tf = tfb[h]                                  # (S,)
        rr, lw, kk, vv = (x[:, h, :] for x in (rb, lwb, kb, vb))  # (c, S)
        s = s_scr[h]                                 # (Sk, Sv)
        L = dot(lower_incl, lw, ((1,), (0,)), precision=F32)  # cumsum
        Lprev = L - lw
        # pairwise decayed r.k for s < t; clip keeps masked entries finite
        expo = jnp.minimum(Lprev[:, None, :] - L[None, :, :], 0.0)  # (c,c,S)
        q = jnp.sum(jnp.exp(expo) * rr[:, None, :] * kk[None, :, :], axis=2)
        # diagonal: the tf-weighted current-token bonus term
        u = jnp.sum(rr * tf[None, :] * kk, axis=1, keepdims=True)  # (c, 1)
        q = q * strict + eye * u
        out_ref[:, h, :] = (
            dot(q, vv, ((1,), (0,)))
            + dot(rr * jnp.exp(Lprev), s, ((1,), (0,)))
        )
        lam_c = jnp.exp(L[c - 1, :])                 # (S,)
        k_dec = kk * jnp.exp(L[c - 1 : c, :] - L)    # k_s * Lam_c/Lam_s (<= 1)
        s_scr[h] = s * lam_c[:, None] + dot(k_dec, vv, ((0,), (0,)))

    @pl.when(tb == pl.num_programs(1) - 1)
    def _():
        sT_ref[...] = s_scr[...]


@functools.partial(jax.jit, static_argnames=("chunk", "head_block"))
def wkv6_chunked_pallas(r, k, v, tf, lw, state, chunk: int = 16,
                        head_block: int = 8):
    """Fused chunked wkv6/wkv5: r/k/v/lw (T, H, S) f32 with lw = log(decay)
    (v6 has it for free: w = exp(-exp(d)) => lw = -exp(d)); tf (H, S);
    state (H, S, S) indexed [k_dim, v_dim]. T must be a multiple of `chunk`
    (pad with lw=0, k=v=0). Returns (out (T, H, S), final state).

    `chunk` is the pairwise sub-chunk size (one grid step): it bounds the
    (c, c, S) clipped-pairwise decay tensor that survives v6's unbounded
    decay, at c·S transcendentals per token."""
    T, H, S = r.shape
    assert T % chunk == 0
    HB = min(head_block, H)
    while H % HB:
        HB -= 1

    grid = (H // HB, T // chunk)
    vec_spec = pl.BlockSpec((chunk, HB, S), lambda h, t: (t, h, 0), memory_space=pltpu.VMEM)
    tf_spec = pl.BlockSpec((HB, S), lambda h, t: (h, 0), memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((HB, S, S), lambda h, t: (h, 0, 0), memory_space=pltpu.VMEM)

    # clamp log-decay so a fully underflowed w (lw = -inf) cannot poison the
    # cumsum with inf - inf = nan; e^-80 is indistinguishable from 0 in any
    # f32 accumulation over a sub-chunk
    lw = jnp.maximum(lw.astype(jnp.float32), jnp.float32(-80.0))

    out, state_t = pl.pallas_call(
        functools.partial(_wkv6_chunk_kernel, heads_per_block=HB),
        grid=grid,
        in_specs=[vec_spec] * 4 + [tf_spec, st_spec],
        out_specs=[vec_spec, st_spec],
        out_shape=[
            jax.ShapeDtypeStruct((T, H, S), jnp.float32),
            jax.ShapeDtypeStruct((H, S, S), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HB, S, S), jnp.float32)],
    )(r.astype(jnp.float32), lw, k.astype(jnp.float32), v.astype(jnp.float32),
      tf.astype(jnp.float32), state.astype(jnp.float32))
    return out, state_t


def wkv6_chunked_pallas_batched(r, k, v, tf, lw, state, valid, chunk: int = 16,
                                head_block: int = 16):
    """Batched fused chunked wkv6/wkv5 via (B, H) folding (no vmap — the grid
    parallelizes over all B*H head-states at once). Shapes: r/k/v/lw
    (B, T, H, S) with lw = log(decay); tf (H, S); state (B, H, Sk, Sv);
    valid (B, T). Padding fill lw=0 (w=1), k=v=0 keeps the state frozen."""
    from rwkv_tpu.ops.wkv_chunked import _fold_batch

    B, T, H, S = r.shape
    tf_b = jnp.broadcast_to(tf, (B, H, S)).reshape(B * H, S)
    out, st = wkv6_chunked_pallas(
        _fold_batch(r, 0.0, valid, chunk), _fold_batch(k, 0.0, valid, chunk),
        _fold_batch(v, 0.0, valid, chunk), tf_b,
        _fold_batch(lw, 0.0, valid, chunk),
        state.reshape(B * H, S, S), chunk=chunk, head_block=head_block,
    )
    out = jnp.swapaxes(out[:T].reshape(T, B, H, S), 0, 1)
    return out, st.reshape(B, H, S, S)


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

    def dot(x, y, dims, precision=None):
        return jax.lax.dot_general(x, y, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)

    # the log-decay cumsum feeds exp(): its inputs must stay f32 on the MXU
    # (bf16 rounding of the summands becomes relative error on exp'd values)
    F32 = jax.lax.Precision.HIGHEST

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
        L = dot(lower_incl, lw, ((1,), (0,)), precision=F32)  # in-chunk cumsum
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
