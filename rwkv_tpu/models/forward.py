"""Pure-functional RWKV forward pass (all versions), jit-compilable.

One code path serves both eval modes of the reference:
  - serial (RNN) mode  = T=1 (reference rwkv_build_serial_graph, rwkv_graph.inc:611-739)
  - sequence mode      = T>1 with logits from the last *valid* token
    (rwkv_build_sequential_graph, rwkv_graph.inc:744-882)

Instead of the reference's graph-rebuild-per-sequence-length
(rwkv_eval.inc:112-120), T is a static (bucketed) shape and `length` a dynamic
arg; tokens at positions >= length are padding whose state updates are masked
out inside the wkv scans, so chunked-prefill == serial exactly.

Layers run under lax.scan over stacked layer params (single compiled block
regardless of depth). The v7 cross-layer value-residual (v_first) and the
layer-0 specialization are carried explicitly (SURVEY.md §7 hard part 5).

Recurrent state is an explicit pytree owned by the caller — RWKV's analogue of
a KV cache (reference externalizes it as a user FP32 buffer, rwkv.h:106-108).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rwkv_tpu.models.params import ModelConfig
from rwkv_tpu.ops import wkv as wkv_ops
from rwkv_tpu.ops.linear import matmul
from rwkv_tpu.ops.norm import group_norm_heads, l2_norm_rows, layer_norm


def _use_pallas(explicit) -> bool:
    """Fused Pallas WKV kernels are opt-in (pallas=True). Measured end-to-end
    on a v5e (B=8 T=512 and B=1 T=2048, 1.5B-class): the pure-XLA chunked
    form beats the hand-written fused chunk kernels by 10-20% for BOTH v6 and
    v7 — the kernels are dot-issue-bound on tiny (c x S) MXU dots while XLA
    fuses the same math into the surrounding layer. So the default prefill
    dispatch is the chunked XLA path on every backend; the kernels stay
    available, tested (interpret + on-chip), and may win on other topologies."""
    return explicit is True


def _wkv7(r, w, k, v, a, b, heads, valid, pallas, lw=None, io_bf16=False):
    """r.. (T, H, S) with valid (T,), or batched (B, T, H, S) with (B, T).
    lw = log(w) when the caller has it for free (saves the fused kernel's
    transcendentals). io_bf16 relayouts the chunk operands in bf16
    (serving mode only — see ops/wkv_chunked.py)."""
    on_tpu = jax.default_backend() == "tpu"
    if r.ndim == 4:
        if _use_pallas(pallas) and r.shape[1] >= 16 and on_tpu:
            # explicit opt-in: the fused Pallas chunk kernel with (B, H)
            # folded into its head grid (ops/pallas_wkv.py)
            from rwkv_tpu.ops.pallas_wkv import wkv7_chunked_pallas_batched

            lw = jnp.log(w) if lw is None else lw
            return wkv7_chunked_pallas_batched(r, lw, k, v, a, b, heads, valid)
        if r.shape[1] >= 16:
            from rwkv_tpu.ops.wkv_chunked import wkv7_chunked_batched

            return wkv7_chunked_batched(r, w, k, v, a, b, heads, valid, lw=lw,
                                        io_bf16=io_bf16)
        return wkv_ops.wkv7_batched(r, w, k, v, a, b, heads, valid)
    if r.shape[0] >= 16:
        # single-stream prefill: chunk-parallel form (MXU matmuls per chunk);
        # short sequences keep the scan (chunk overhead dominates)
        if _use_pallas(pallas) and on_tpu:
            from rwkv_tpu.ops.pallas_wkv import wkv7_chunked_pallas_batched

            lw = jnp.log(w) if lw is None else lw
            out, st = wkv7_chunked_pallas_batched(
                r[None], lw[None], k[None], v[None], a[None], b[None],
                heads[None], valid[None],
            )
            return out[0], st[0]
        from rwkv_tpu.ops.wkv_chunked import wkv7_chunked_masked

        return wkv7_chunked_masked(r, w, k, v, a, b, heads, valid, lw=lw)
    # (single-stream masked path keeps f32 relayouts — it is not the
    # serving prefill hot path and shares wkv7_chunked with parity tests)
    return wkv_ops.wkv7(r, w, k, v, a, b, heads, valid)


# decode-step wkv7 dispatch threshold on B*H: at small batch the jnp step
# fuses into the unrolled decode body and wins (the Pallas call broke
# fusion: 3.58 -> 3.83 ms/step at B=8, BH=256); from BH=512 up the
# (B, H, S, S) state traffic dominates and the one-read-one-write kernel
# wins (v5e int8 1.5B, H=32: +6% tok/s at B=16, +12% B=32, +19% B=64,
# +16% B=128 — docs/KERNELS.md)
STEP_KERNEL_MIN_BH = 512


def _wkv7_step_dispatch(r, w, k, v, a, b, heads):
    """`heads` is either this layer's (B, H, S, S) state, or a tuple
    (heads_full (L, B, H, S, S), layer_idx) — the L-stacked form lets the
    Pallas step kernel advance slot `layer` IN PLACE (aliased), removing
    the per-layer copy-back into the stacked array that cost 1.2 ms/step
    at B=32 serving (docs/KERNELS.md round-5 serving profile). Either form
    returns its own shape back."""
    stacked = isinstance(heads, tuple)
    use_kernel = (
        r.ndim == 3
        and r.shape[0] * r.shape[1] >= STEP_KERNEL_MIN_BH
        and jax.default_backend() == "tpu"
    )
    if use_kernel:
        if stacked:
            from rwkv_tpu.ops.pallas_wkv import wkv7_step_batched_lstacked

            return wkv7_step_batched_lstacked(r, w, k, v, a, b, *heads)
        from rwkv_tpu.ops.pallas_wkv import wkv7_step_batched

        return wkv7_step_batched(r, w, k, v, a, b, heads)
    if stacked:
        full, idx = heads
        out, st = wkv_ops.wkv7_step(r, w, k, v, a, b, full[idx])
        return out, full.at[idx].set(st.astype(full.dtype))
    return wkv_ops.wkv7_step(r, w, k, v, a, b, heads)


def _wkv56_step_dispatch(r, k, v, tf, w, heads):
    """Kernel dispatch for the v5/v6 decode step (same (B, H, S, S)-or-
    (full, idx) contract as _wkv7_step_dispatch). Unlike v7 (which only
    wins from BH=512 up), the fused step kernel beats XLA's fusion of the
    v5/v6 jnp step at EVERY batch size (v5e int8 1.5B v6: +22% tok/s at
    B=8, +27% B=16, +52% B=64), so it is unconditional on TPU."""
    stacked = isinstance(heads, tuple)
    if r.ndim == 3 and jax.default_backend() == "tpu":
        if stacked:
            from rwkv_tpu.ops.pallas_wkv import wkv56_step_batched_lstacked

            return wkv56_step_batched_lstacked(r, k, v, tf, w, *heads)
        from rwkv_tpu.ops.pallas_wkv import wkv56_step_batched

        return wkv56_step_batched(r, k, v, tf, w, heads)
    if stacked:
        full, idx = heads
        out, st = wkv_ops.wkv56_step(r, k, v, tf, w, full[idx])
        return out, full.at[idx].set(st.astype(full.dtype))
    return wkv_ops.wkv56_step(r, k, v, tf, w, heads)


def _wkv56(r, k, v, tf, w, heads, valid, pallas, lw=None, io_bf16=False):
    """lw = log(w) when the caller has it for free (v6's pre-exp decay, or
    one log of v5's tiny constant-decay vector) — the fused kernel's input.
    io_bf16: bf16 chunk relayouts (serving mode, ops/wkv_chunked.py)."""
    on_tpu = jax.default_backend() == "tpu"
    if r.ndim == 4:
        if _use_pallas(pallas) and r.shape[1] >= 16 and on_tpu:
            # explicit opt-in: fused chunk Pallas kernel, (B, H) folded into
            # its head grid — the same treatment v7 gets (ops/pallas_wkv.py)
            from rwkv_tpu.ops.pallas_wkv import wkv6_chunked_pallas_batched

            lw = jnp.log(w) if lw is None else lw
            return wkv6_chunked_pallas_batched(r, k, v, tf, lw, heads, valid)
        if r.shape[1] >= 16:
            from rwkv_tpu.ops.wkv_chunked import wkv6_chunked_batched

            return wkv6_chunked_batched(r, k, v, tf, w, heads, valid, lw=lw,
                                        io_bf16=io_bf16)
        return wkv_ops.wkv56_batched(r, k, v, tf, w, heads, valid)
    if r.shape[0] >= 16:
        if _use_pallas(pallas) and on_tpu:
            from rwkv_tpu.ops.pallas_wkv import wkv6_chunked_pallas_batched

            lw = jnp.log(w) if lw is None else lw
            out, st = wkv6_chunked_pallas_batched(
                r[None], k[None], v[None], tf, lw[None], heads[None], valid[None]
            )
            return out[0], st[0]
        from rwkv_tpu.ops.wkv_chunked import wkv6_chunked_masked

        return wkv6_chunked_masked(r, k, v, tf, w, heads, valid, lw=lw)
    return wkv_ops.wkv56(r, k, v, tf, w, heads, valid)


# ---------------------------------------------------------------------------
# state pytree
# ---------------------------------------------------------------------------

def init_state(cfg: ModelConfig):
    """Zero state; v4 pp slots get -1e30 (rwkv_eval.inc:224-241 — a zeroed v4
    state is documented UB in the reference, rwkv.h:197-199)."""
    L, E = cfg.n_layer, cfg.n_embed
    if cfg.version_major == 4:
        return {
            "ffn_xx": jnp.zeros((L, E), jnp.float32),
            "att_xx": jnp.zeros((L, E), jnp.float32),
            "aa": jnp.zeros((L, E), jnp.float32),
            "bb": jnp.zeros((L, E), jnp.float32),
            "pp": jnp.full((L, E), -1e30, jnp.float32),
        }
    H, S = cfg.head_count, cfg.head_size
    return {
        "ffn_xx": jnp.zeros((L, E), jnp.float32),
        "att_xx": jnp.zeros((L, E), jnp.float32),
        "heads": jnp.zeros((L, H, S, S), jnp.float32),
    }


def state_to_buffer(cfg: ModelConfig, state) -> jnp.ndarray:
    """Pytree -> flat f32 buffer, byte-compatible with the reference layout
    (rwkv_create_input_and_output_views, rwkv_graph.inc:545-606)."""
    L = cfg.n_layer
    if cfg.version_major == 4:
        parts = [state[k] for k in ("ffn_xx", "att_xx", "aa", "bb", "pp")]
        return jnp.concatenate([p.reshape(L, -1) for p in parts], axis=1).reshape(-1)
    parts = [state["ffn_xx"], state["att_xx"], state["heads"].reshape(L, -1)]
    return jnp.concatenate(parts, axis=1).reshape(-1)


def state_from_buffer(cfg: ModelConfig, buf) -> dict:
    L, E = cfg.n_layer, cfg.n_embed
    if cfg.version_major == 4:
        b = buf.reshape(L, 5 * E)
        names = ("ffn_xx", "att_xx", "aa", "bb", "pp")
        return {n: b[:, i * E : (i + 1) * E] for i, n in enumerate(names)}
    H, S = cfg.head_count, cfg.head_size
    b = buf.reshape(L, 2 * E + H * S * S)
    return {
        "ffn_xx": b[:, :E],
        "att_xx": b[:, E : 2 * E],
        "heads": b[:, 2 * E :].reshape(L, H, S, S),
    }


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _act_dtype(emb):
    """Activation dtype for the residual stream: follows the embedding's
    storage dtype — bf16 in TPU fast/serving mode (halves the HBM traffic of
    every materialized intermediate; the MXU dot rounds operands to bf16 at
    DEFAULT precision anyway), true f32 in parity mode (the reference's
    numerics; every cast below is then a no-op). Recurrent state stays f32
    regardless (byte-compatible state buffers, rwkv.h:106-108)."""
    return jnp.bfloat16 if emb.dtype == jnp.bfloat16 else jnp.float32


def _token_shift(x_ln, carry_xx, length):
    """x_prev[t] = x_ln[t-1] with the recurrent carry at t=0; returns
    (x_prev, new_carry = x_ln[length-1]) (rwkv_carry_x, rwkv_graph.inc:56-82).
    The carry is read in the activation dtype and stored back as f32 (state
    buffers are f32)."""
    x_prev = jnp.concatenate([carry_xx.astype(x_ln.dtype)[None, :], x_ln[:-1]], axis=0)
    new_xx = jax.lax.dynamic_index_in_dim(x_ln, length - 1, axis=0,
                                          keepdims=False).astype(jnp.float32)
    return x_prev, new_xx


def _lerp_mix(x, x_prev, mix):
    # x*mix + x_prev*(1-mix), written as in the reference graph; the mix
    # vector follows the activation dtype (no-op in parity mode)
    mix = mix.astype(x.dtype)
    return x * mix + (x_prev - x_prev * mix)


def _heads(x, H, S):
    return x.reshape(*x.shape[:-1], H, S)


# ---------------------------------------------------------------------------
# attention (time-mix) blocks
# ---------------------------------------------------------------------------

def _rkv(lp, xr, xk, xv):
    """r/k/v projections: fused single-kernel path when the serving
    quantizer merged them (quantize_params_device(merge_rkv=True)), else
    three matmuls."""
    if "att_rkv" in lp:
        from rwkv_tpu.ops.linear import matmul_multi

        return matmul_multi([xr, xk, xv], lp["att_rkv"])
    return matmul(xr, lp["att_r"]), matmul(xk, lp["att_k"]), matmul(xv, lp["att_v"])


def _rkvg(lp, xr, xk, xv, xg):
    """r/k/v + gate (v5.2/v6): 4-way fused kernel when merged, else _rkv +
    a separate gate matmul. Returns (r, k, v, gate_preact)."""
    if "att_rkvg" in lp:
        from rwkv_tpu.ops.linear import matmul_multi

        return matmul_multi([xr, xk, xv, xg], lp["att_rkvg"])
    r, k, v = _rkv(lp, xr, xk, xv)
    return r, k, v, matmul(xg, lp["att_gate"])


def _att_v4(lp, x_ln, x_prev, st, valid, step=False):
    xk = _lerp_mix(x_ln, x_prev, lp["att_mix_k"])
    xv = _lerp_mix(x_ln, x_prev, lp["att_mix_v"])
    xr = _lerp_mix(x_ln, x_prev, lp["att_mix_r"])
    rr, k, v = _rkv(lp, xr, xk, xv)
    r = jax.nn.sigmoid(rr)
    if step:
        wkv, (aa, bb, pp) = wkv_ops.wkv4_step(
            k, v, lp["time_first"], lp["time_decay"], st["aa"], st["bb"], st["pp"]
        )
    elif k.shape[-2] >= 16:
        # chunk-parallel prefill: the max-trick recurrence collapses into
        # per-chunk cumsums (ops/wkv_chunked.py) — no sequential T loop
        from rwkv_tpu.ops.wkv_chunked import wkv4_chunked, wkv4_chunked_batched

        fn = wkv4_chunked_batched if k.ndim == 3 else wkv4_chunked
        wkv, (aa, bb, pp) = fn(
            k, v, lp["time_first"], lp["time_decay"], st["aa"], st["bb"], st["pp"], valid
        )
    elif k.ndim == 3:
        wkv, (aa, bb, pp) = wkv_ops.wkv4_batched(
            k, v, lp["time_first"], lp["time_decay"], st["aa"], st["bb"], st["pp"], valid
        )
    else:
        wkv, (aa, bb, pp) = wkv_ops.wkv4(
            k, v, lp["time_first"], lp["time_decay"], st["aa"], st["bb"], st["pp"], valid
        )
    out = matmul(r * wkv, lp["att_o"])
    return out, {"aa": aa, "bb": bb, "pp": pp}


def _att_v5(lp, x_ln, x_prev, heads, valid, cfg: ModelConfig, pallas=None, step=False):
    H, S = cfg.head_count, cfg.head_size
    xk = _lerp_mix(x_ln, x_prev, lp["att_mix_k"])
    xv = _lerp_mix(x_ln, x_prev, lp["att_mix_v"])
    xr = _lerp_mix(x_ln, x_prev, lp["att_mix_r"])
    if cfg.version_minor >= 2:
        xg = _lerp_mix(x_ln, x_prev, lp["att_mix_g"])
        rr, kk_, vv_, gp = _rkvg(lp, xr, xk, xv, xg)
        g = jax.nn.silu(gp)
    else:
        rr, kk_, vv_ = _rkv(lp, xr, xk, xv)
        g = None
    r, k, v = _heads(rr, H, S), _heads(kk_, H, S), _heads(vv_, H, S)
    if step:
        out, heads = _wkv56_step_dispatch(r, k, v, lp["time_first"], lp["time_decay"], heads)
    else:
        w = jnp.broadcast_to(lp["time_decay"], r.shape)
        # one log over the (H, S) constant-decay vector, broadcast lazily —
        # the fused kernel's log-decay input for free
        lw = jnp.broadcast_to(jnp.log(lp["time_decay"]), r.shape)
        out, heads = _wkv56(r, k, v, lp["time_first"], w, heads, valid, pallas,
                            lw=lw, io_bf16=x_ln.dtype == jnp.bfloat16)
    x = group_norm_heads(out.reshape(*out.shape[:-2], H * S), lp["ln_x_w"], lp["ln_x_b"], H, 1e-5)
    if g is not None:
        x = x * g
    return matmul(x, lp["att_o"]), heads


def _att_v6(lp, x_ln, x_prev, heads, valid, cfg: ModelConfig, pallas=None, step=False):
    H, S = cfg.head_count, cfg.head_size
    sx = x_prev - x_ln
    xxx = x_ln + sx * lp["maa_x"].astype(x_ln.dtype)
    five = jnp.tanh(matmul(xxx, lp["tm_w1"]))                    # (..., T, 5K)
    five = five.reshape(*five.shape[:-1], 5, -1)                 # (..., T, 5, K)
    # tiny (K=32) contraction: keep true-f32 on TPU for oracle parity
    mixes = jnp.einsum("...ik,ike->i...e", five, lp["tm_w2"],
                       precision=jax.lax.Precision.HIGHEST)      # (5, ..., T, E)
    mw, mk, mv, mr, mg = mixes
    # xw stays f32 (it feeds the decay low-rank whose output is the wkv
    # log-decay); the other four are dot operands — activation dtype
    xw = x_ln.astype(jnp.float32) + (mw + lp["maa_w"]) * sx.astype(jnp.float32)
    xk = (x_ln + ((mk + lp["maa_k"]) * sx).astype(x_ln.dtype))
    xv = (x_ln + ((mv + lp["maa_v"]) * sx).astype(x_ln.dtype))
    xr = (x_ln + ((mr + lp["maa_r"]) * sx).astype(x_ln.dtype))
    xg = (x_ln + ((mg + lp["maa_g"]) * sx).astype(x_ln.dtype))
    rr, kk_, vv_, gp = _rkvg(lp, xr, xk, xv, xg)
    r, k, v = _heads(rr, H, S), _heads(kk_, H, S), _heads(vv_, H, S)
    g = jax.nn.silu(gp)
    w = matmul(jnp.tanh(matmul(xw, lp["decay_w1"])), lp["decay_w2"])
    w = w + lp["decay_base"]
    lw = -jnp.exp(w)          # log-decay, free for the fused kernel
    w = jnp.exp(lw)
    if step:
        out, heads = _wkv56_step_dispatch(r, k, v, lp["time_first"], _heads(w, H, S), heads)
    else:
        out, heads = _wkv56(r, k, v, lp["time_first"], _heads(w, H, S), heads, valid,
                            pallas, lw=_heads(lw, H, S),
                            io_bf16=x_ln.dtype == jnp.bfloat16)
    x = group_norm_heads(out.reshape(*out.shape[:-2], H * S), lp["ln_x_w"], lp["ln_x_b"], H, 64e-5)
    x = x * g
    return matmul(x, lp["att_o"]), heads


def _att_v7(lp, x_ln, x_prev, heads, v_first, layer_idx, valid, cfg: ModelConfig,
            pallas=None, step=False):
    H, S = cfg.head_count, cfg.head_size
    sx = x_prev - x_ln                                          # (..., T, E)
    mix = lp["x_rwkvag"].reshape(
        (6,) + (1,) * (x_ln.ndim - 1) + (x_ln.shape[-1],)).astype(x_ln.dtype)
    xxx = sx[None] * mix + x_ln[None]                           # (6, ..., T, E)
    xr, xw, xk, xv, xa, xg = xxx

    r, k, v = _rkv(lp, xr, xk, xv)
    g = matmul(jax.nn.sigmoid(matmul(xg, lp["g1"])), lp["g2"])
    a = jax.nn.sigmoid(matmul(matmul(xa, lp["a1"]), lp["a2"]) + lp["a0"])
    w = matmul(jnp.tanh(matmul(xw, lp["w1"])), lp["w2"]) + lp["w0"]
    lw = jax.nn.sigmoid(w) * jnp.float32(-0.606531)  # log-decay, free for kernels
    w = jnp.exp(lw)

    kk = l2_norm_rows(_heads(k * lp["k_k"], H, S))
    ka = k * lp["k_a"]
    k = k + (a * ka - ka)

    v_resid = v + (v_first - v) * jax.nn.sigmoid(
        matmul(matmul(xv, lp["v1"]), lp["v2"]) + lp["v0"]
    )
    is_first = layer_idx == 0
    v = jnp.where(is_first, v, v_resid)
    v_first = jnp.where(is_first, v, v_first)

    rh, wh, kh, vh, ah = (_heads(t, H, S) for t in (r, w, k, v, a))
    if step:
        out, heads = _wkv7_step_dispatch(rh, wh, kh, vh, -kk, kk * ah, heads)
    else:
        out, heads = _wkv7(rh, wh, kh, vh, -kk, kk * ah, heads, valid, pallas,
                           lw=_heads(lw, H, S),
                           io_bf16=x_ln.dtype == jnp.bfloat16)

    x = group_norm_heads(out.reshape(*out.shape[:-2], H * S), lp["ln_x_w"], lp["ln_x_b"], H, 64e-5)
    # bonus: v * sum_per_head(k * r * r_k) (rwkv_graph.inc:472-477)
    bonus = vh * jnp.sum(kh * rh * lp["r_k"], axis=-1, keepdims=True)
    x = x + bonus.reshape(*x.shape)
    x = x * g
    return matmul(x, lp["att_o"]), heads, v_first


# ---------------------------------------------------------------------------
# channel-mix (FFN) blocks
# ---------------------------------------------------------------------------

def _ffn_v4_v5(lp, x_ln, x_prev):
    xk = _lerp_mix(x_ln, x_prev, lp["ffn_mix_k"])
    xr = _lerp_mix(x_ln, x_prev, lp["ffn_mix_r"])
    r = jax.nn.sigmoid(matmul(xr, lp["ffn_r"]))
    k = jnp.square(jax.nn.relu(matmul(xk, lp["ffn_k"])))
    return r * matmul(k, lp["ffn_v"])


def _ffn_v6(lp, x_ln, x_prev):
    sx = x_prev - x_ln
    xk = x_ln + sx * lp["ffn_maa_k"].astype(x_ln.dtype)
    xr = x_ln + sx * lp["ffn_maa_r"].astype(x_ln.dtype)
    r = jax.nn.sigmoid(matmul(xr, lp["ffn_r"]))
    k = jnp.square(jax.nn.relu(matmul(xk, lp["ffn_k"])))
    return r * matmul(k, lp["ffn_v"])


def _ffn_v7(lp, x_ln, x_prev):
    sx = x_prev - x_ln
    xk = x_ln + sx * lp["ffn_x_k"].astype(x_ln.dtype)
    k = jnp.square(jax.nn.relu(matmul(xk, lp["ffn_k"])))
    return matmul(k, lp["ffn_v"])


# ---------------------------------------------------------------------------
# full forward
# ---------------------------------------------------------------------------

def _stack_single(params, cfg: ModelConfig, tokens, state, length, pallas):
    """The layer stack for one single-stream evaluation: tokens (T,) int32,
    positions >= length are padding. Returns (x (T, E) final-layer
    activations, new_state). Shared by forward() and forward_chunks()."""
    T = tokens.shape[0]
    valid = jnp.arange(T) < length
    major = cfg.version_major

    emb = params["emb"]
    x = emb[tokens].astype(_act_dtype(emb))
    x = layer_norm(x, params["ln0_w"], params["ln0_b"])

    v_first0 = jnp.zeros(x.shape, jnp.float32)

    def layer_fn(carry, xs):
        x, v_first = carry
        lp, st, idx = xs

        x_ln1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        x_prev1, att_xx = _token_shift(x_ln1, st["att_xx"], length)

        if major == 4:
            att_out, new4 = _att_v4(lp, x_ln1, x_prev1, st, valid)
            new_st = {"att_xx": att_xx, **new4}
        elif major == 5:
            att_out, heads = _att_v5(lp, x_ln1, x_prev1, st["heads"], valid, cfg, pallas)
            new_st = {"att_xx": att_xx, "heads": heads}
        elif major == 6:
            att_out, heads = _att_v6(lp, x_ln1, x_prev1, st["heads"], valid, cfg, pallas)
            new_st = {"att_xx": att_xx, "heads": heads}
        else:
            att_out, heads, v_first = _att_v7(
                lp, x_ln1, x_prev1, st["heads"], v_first, idx, valid, cfg, pallas
            )
            new_st = {"att_xx": att_xx, "heads": heads}
        x = x + att_out.astype(x.dtype)

        x_ln2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        x_prev2, ffn_xx = _token_shift(x_ln2, st["ffn_xx"], length)
        if major == 7:
            ffn_out = _ffn_v7(lp, x_ln2, x_prev2)
        elif major == 6:
            ffn_out = _ffn_v6(lp, x_ln2, x_prev2)
        else:
            ffn_out = _ffn_v4_v5(lp, x_ln2, x_prev2)
        x = x + ffn_out.astype(x.dtype)

        new_st["ffn_xx"] = ffn_xx
        return (x, v_first), new_st

    (x, _), new_state = jax.lax.scan(
        layer_fn,
        (x, v_first0),
        (params["layers"], state, jnp.arange(cfg.n_layer)),
    )
    return x, new_state


@partial(jax.jit, static_argnames=("cfg", "compute_logits", "all_logits", "pallas"))
def forward(
    params,
    cfg: ModelConfig,
    tokens,
    state,
    length,
    compute_logits: bool = True,
    all_logits: bool = False,
    pallas: bool | None = None,
):
    """Evaluate `tokens` (T,) int32 against `state`; positions >= length are
    padding. Returns (logits (V,) f32 or None, new_state).

    compute_logits=False skips the head matmul entirely (the reference's
    pre/post-logits graph truncation, rwkv_eval.inc:25-35).
    all_logits=True returns logits for every position, (T, V) — needed for
    perplexity measurement and training, beyond the reference's
    last-token-only sequential head (rwkv_graph.inc:851-854).
    """
    x, new_state = _stack_single(params, cfg, tokens, state, length, pallas)

    if not compute_logits:
        return None, new_state

    if all_logits:
        x_out = layer_norm(x, params["ln_out_w"], params["ln_out_b"])
        return matmul(x_out, params["head"]), new_state

    x_last = jax.lax.dynamic_index_in_dim(x, length - 1, axis=0, keepdims=True)
    x_last = layer_norm(x_last, params["ln_out_w"], params["ln_out_b"])
    logits = matmul(x_last, params["head"])[0]
    return logits, new_state


@partial(jax.jit, static_argnames=("cfg", "compute_logits", "pallas"))
def forward_chunks(
    params,
    cfg: ModelConfig,
    tokens,
    state,
    length,
    compute_logits: bool = True,
    pallas: bool | None = None,
):
    """Single-jit chunked prefill: tokens (NC, C) int32 — a long prompt cut
    into NC device-scanned chunks of C — with `length` the number of valid
    tokens from the start of this block (clipped per chunk, may exceed NC*C
    when more blocks follow). Returns (logits (V,) | None, new_state).

    Replaces the reference's host loop over rwkv_eval_sequence calls
    (rwkv_eval_sequence_in_chunks, rwkv_eval.inc:158-221) with ONE dispatch:
    at T=8k and chunk 16 the host loop costs ~500 dispatches; here the scan
    over chunk blocks runs entirely on device. Logits come from the last
    valid token's final-layer activation, carried across the scan."""
    NC, C = tokens.shape
    E = cfg.n_embed

    def chunk_body(carry, inp):
        state, x_last = carry
        toks_c, start = inp
        ln = jnp.clip(length - start, 0, C)
        active = ln > 0
        # ln=0 chunks still execute (static shapes) but their state and
        # x_last are discarded below; ln_safe keeps the token-shift gather
        # in-bounds
        ln_safe = jnp.maximum(ln, 1)
        x, new_state = _stack_single(params, cfg, toks_c, state, ln_safe, pallas)
        state = jax.tree.map(lambda n, o: jnp.where(active, n, o), new_state, state)
        xl = jax.lax.dynamic_index_in_dim(x, ln_safe - 1, axis=0, keepdims=False)
        x_last = jnp.where(active, xl, x_last)
        return (state, x_last), None

    starts = jnp.arange(NC, dtype=jnp.int32) * C
    (state, x_last), _ = jax.lax.scan(
        chunk_body, (state, jnp.zeros((E,), jnp.float32)), (tokens, starts)
    )
    if not compute_logits:
        return None, state
    x_last = layer_norm(x_last[None], params["ln_out_w"], params["ln_out_b"])
    return matmul(x_last, params["head"])[0], state


@partial(jax.jit, static_argnames=("cfg", "compute_logits", "layer_major"))
def forward_step(params, cfg: ModelConfig, tokens, state, compute_logits: bool = True,
                 layer_major: bool = False):
    """Native batched single-token decode step: tokens (B,) int32, state
    leaves with a leading B axis. Returns (logits (B, V) | None, new_state).

    This is the serving hot path. Unlike vmap(forward) at T=1, the batch is a
    real matrix dimension, so every projection is one (B, E) x (E, O) matmul
    and each weight matrix streams from HBM exactly once per step — decode is
    HBM-bandwidth-bound, making this the difference between SoL and B-fold
    slowdown for quantized (Pallas qmm) weights, which vmap would re-stream
    per stream.

    layer_major=True takes/returns state leaves as (L, B, ...) — the layout
    the layer scan consumes — so a decode loop can keep the (large) state in
    that layout across steps instead of paying two full-state transposes per
    step (at B=128 on a 1.5B model those copies cost more than the weights)."""
    major = cfg.version_major

    x = params["emb"][tokens].astype(_act_dtype(params["emb"]))    # (B, E)
    x = layer_norm(x, params["ln0_w"], params["ln0_b"])
    v_first0 = jnp.zeros(x.shape, jnp.float32)

    if layer_major:
        st_layers = state
    else:
        # state leaves (B, L, ...) -> (L, B, ...) for the layer scan
        st_layers = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state)

    from rwkv_tpu.ops import linear as linear_mod

    # Weight matrices do NOT ride the scan's xs: a scanned xs slice feeding a
    # Pallas kernel forces XLA to materialize a copy of that layer's weights
    # every step (measured: the copies outweigh the matmuls at decode batch
    # sizes). Instead the stacked arrays are closed over and matmul indexes
    # them lazily (at_layer), letting the kernel DMA tiles of the right layer
    # straight from the stacked HBM buffer. Small per-layer vectors still
    # scan normally — their slices fuse fine.
    weights = {k: v for k, v in params["layers"].items()
               if isinstance(v, linear_mod.Linear)}
    vectors = {k: v for k, v in params["layers"].items()
               if not isinstance(v, linear_mod.Linear)}

    # The (L, B, H, S, S) heads state rides the CARRY as one stacked array
    # (v5+): the step dispatch advances slot idx in place — the Pallas step
    # kernels via an aliased scalar-prefetch write, the jnp step via a
    # static-index .at[].set that fuses like the old scan-ys stacking did.
    # Riding the scan ys instead forced a per-layer copy of each kernel's
    # output back into the stacked array (24 x 51 us/step at B=32 serving).
    heads_full = st_layers.get("heads") if major >= 5 else None
    xs_state = ({k: v for k, v in st_layers.items() if k != "heads"}
                if major >= 5 else st_layers)

    def layer_fn(carry, xs):
        x, v_first, heads_full = carry
        vecs, st, idx = xs
        lp = {**vecs, **{k: linear_mod.at_layer(v, idx) for k, v in weights.items()}}

        x_ln1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        x_prev1, att_xx = st["att_xx"].astype(x_ln1.dtype), x_ln1.astype(jnp.float32)

        if major == 4:
            att_out, new4 = _att_v4(lp, x_ln1, x_prev1, st, None, step=True)
            new_st = {"att_xx": att_xx, **new4}
        elif major == 5:
            att_out, heads_full = _att_v5(lp, x_ln1, x_prev1,
                                          (heads_full, idx), None, cfg,
                                          step=True)
            new_st = {"att_xx": att_xx}
        elif major == 6:
            att_out, heads_full = _att_v6(lp, x_ln1, x_prev1,
                                          (heads_full, idx), None, cfg,
                                          step=True)
            new_st = {"att_xx": att_xx}
        else:
            att_out, heads_full, v_first = _att_v7(
                lp, x_ln1, x_prev1, (heads_full, idx), v_first, idx, None,
                cfg, step=True
            )
            new_st = {"att_xx": att_xx}
        x = x + att_out.astype(x.dtype)

        x_ln2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        x_prev2, ffn_xx = st["ffn_xx"].astype(x_ln2.dtype), x_ln2.astype(jnp.float32)
        if major == 7:
            ffn_out = _ffn_v7(lp, x_ln2, x_prev2)
        elif major == 6:
            ffn_out = _ffn_v6(lp, x_ln2, x_prev2)
        else:
            ffn_out = _ffn_v4_v5(lp, x_ln2, x_prev2)
        x = x + ffn_out.astype(x.dtype)

        new_st["ffn_xx"] = ffn_xx
        return (x, v_first, heads_full), new_st

    # layer loop fully unrolled: static layer indices let XLA fuse the
    # per-layer state slices/updates into the wkv compute and schedule
    # across layers; combined with the decode loops' step-unroll this
    # measured +23% decode throughput vs rolled scans (the step body is
    # small, so compile time stays manageable)
    (x, _, heads_full), new_state = jax.lax.scan(
        layer_fn,
        (x, v_first0, heads_full),
        (vectors, xs_state, jnp.arange(cfg.n_layer)),
        unroll=True,
    )
    if heads_full is not None:
        new_state = dict(new_state, heads=heads_full)
    if not layer_major:
        new_state = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), new_state)

    if not compute_logits:
        return None, new_state
    x = layer_norm(x, params["ln_out_w"], params["ln_out_b"])
    return matmul(x, params["head"]), new_state


def _token_shift_batched(x_ln, carry_xx, lengths):
    """x_ln (B, T, E); carry_xx (B, E); returns (x_prev, new_carry) with the
    carry taken at each stream's last *valid* position. Carry read in the
    activation dtype, stored back f32 (state buffers are f32)."""
    x_prev = jnp.concatenate([carry_xx.astype(x_ln.dtype)[:, None, :], x_ln[:, :-1]], axis=1)
    idx = jnp.broadcast_to((lengths - 1)[:, None, None], (x_ln.shape[0], 1, x_ln.shape[-1]))
    new_xx = jnp.take_along_axis(x_ln, idx, axis=1)[:, 0].astype(jnp.float32)
    return x_prev, new_xx


def run_layers_batched(layers, cfg: ModelConfig, x, st_layers, lengths, valid,
                       v_first, base_layer=0, pallas=None, remat=False):
    """Run a stack of layers (leaves with a leading layer axis) over batched
    activations x (B, T, E), with layer-major state st_layers (Lsub, B, ...).

    Factored out of forward_seq so pipeline-parallel stages
    (parallel/pipeline.py) can run their LOCAL layer slice: base_layer is
    the global index of the first layer here (the v7 layer-0 v_first
    specialization keys on the GLOBAL index). Returns ((x, v_first),
    new_state layer-major)."""
    major = cfg.version_major
    from rwkv_tpu.ops import linear as linear_mod

    weights = {k: v for k, v in layers.items()
               if isinstance(v, linear_mod.Linear)}
    vectors = {k: v for k, v in layers.items()
               if not isinstance(v, linear_mod.Linear)}
    n_local = jax.tree.leaves(st_layers)[0].shape[0]

    def layer_fn(carry, xs):
        x, v_first = carry
        vecs, st, idx = xs
        lp = {**vecs, **{k: linear_mod.at_layer(v, idx - base_layer)
                         for k, v in weights.items()}}

        x_ln1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"])
        x_prev1, att_xx = _token_shift_batched(x_ln1, st["att_xx"], lengths)

        if major == 4:
            att_out, new4 = _att_v4(lp, x_ln1, x_prev1, st, valid)
            new_st = {"att_xx": att_xx, **new4}
        elif major == 5:
            att_out, heads = _att_v5(lp, x_ln1, x_prev1, st["heads"], valid, cfg, pallas)
            new_st = {"att_xx": att_xx, "heads": heads}
        elif major == 6:
            att_out, heads = _att_v6(lp, x_ln1, x_prev1, st["heads"], valid, cfg, pallas)
            new_st = {"att_xx": att_xx, "heads": heads}
        else:
            att_out, heads, v_first = _att_v7(
                lp, x_ln1, x_prev1, st["heads"], v_first, idx, valid, cfg, pallas
            )
            new_st = {"att_xx": att_xx, "heads": heads}
        x = x + att_out.astype(x.dtype)

        x_ln2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"])
        x_prev2, ffn_xx = _token_shift_batched(x_ln2, st["ffn_xx"], lengths)
        if major == 7:
            ffn_out = _ffn_v7(lp, x_ln2, x_prev2)
        elif major == 6:
            ffn_out = _ffn_v6(lp, x_ln2, x_prev2)
        else:
            ffn_out = _ffn_v4_v5(lp, x_ln2, x_prev2)
        x = x + ffn_out.astype(x.dtype)

        new_st["ffn_xx"] = ffn_xx
        return (x, v_first), new_st

    if remat:
        # rematerialize per-layer activations under autodiff: the backward
        # pass recomputes each layer instead of storing O(L) (B, T, E)
        # intermediates — the standard FLOPs-for-HBM trade for training
        layer_fn = jax.checkpoint(layer_fn)

    return jax.lax.scan(
        layer_fn,
        (x, v_first),
        (vectors, st_layers, base_layer + jnp.arange(n_local)),
    )


@partial(jax.jit, static_argnames=("cfg", "compute_logits", "all_logits", "pallas", "remat"))
def forward_seq(
    params,
    cfg: ModelConfig,
    tokens,
    state,
    lengths,
    compute_logits: bool = True,
    all_logits: bool = False,
    pallas: bool | None = None,
    remat: bool = False,
):
    """Natively batched sequence forward: tokens (B, T) int32, state leaves
    with a leading B axis, lengths (B,). Returns (logits (B, V) | (B, T, V) |
    None, new_state).

    Unlike vmap(forward), the batch is a real tensor dimension end-to-end:
    projections are (B*T, in) matmuls, the wkv recurrence folds (B, H) into
    one kernel call, and weights are indexed lazily (at_layer) so the Pallas
    kernels stream each layer once per call — vmap would re-stream weights
    per stream and cannot batch the fused chunk kernel at all."""
    major = cfg.version_major
    B, T = tokens.shape
    valid = jnp.arange(T)[None, :] < lengths[:, None]           # (B, T)

    x = params["emb"][tokens].astype(_act_dtype(params["emb"]))  # (B, T, E)
    x = layer_norm(x, params["ln0_w"], params["ln0_b"])
    v_first0 = jnp.zeros(x.shape, jnp.float32)

    st_layers = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state)

    (x, _), new_state = run_layers_batched(
        params["layers"], cfg, x, st_layers, lengths, valid, v_first0,
        base_layer=0, pallas=pallas, remat=remat,
    )
    new_state = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), new_state)

    if not compute_logits:
        return None, new_state

    if all_logits:
        x_out = layer_norm(x, params["ln_out_w"], params["ln_out_b"])
        return matmul(x_out, params["head"]), new_state

    idx = jnp.broadcast_to((lengths - 1)[:, None, None], (B, 1, x.shape[-1]))
    x_last = jnp.take_along_axis(x, idx, axis=1)[:, 0]          # (B, E)
    x_last = layer_norm(x_last, params["ln_out_w"], params["ln_out_b"])
    return matmul(x_last, params["head"]), new_state


def forward_batch(
    params, cfg: ModelConfig, tokens, state, lengths,
    compute_logits: bool = True, all_logits: bool = False, pallas: bool | None = None,
    remat: bool = False,
):
    """Batched forward over independent streams: tokens (B, T), state leaves
    with a leading B axis, lengths (B,). The batch axis is the data-parallel
    ('dp') mesh axis in sharded execution (parallel/shard.py)."""
    return forward_seq(params, cfg, tokens, state, lengths,
                       compute_logits=compute_logits, all_logits=all_logits,
                       pallas=pallas, remat=remat)
