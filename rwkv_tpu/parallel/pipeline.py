"""Pipeline parallelism: layer-stage sharding with a microbatched schedule.

The reference's closest concept is heterogeneous layer offload
(`n_gpu_layers`, rwkv_model_loading.inc:128-146) — layers split across two
devices with NO overlap. The TPU-native upgrade is a real GPipe-style
pipeline: the layer stack is sharded over a 'pp' mesh axis (each stage holds
L/P contiguous layers + the matching slice of the recurrent state), the
stream batch is cut into M microbatches, and stages work on different
microbatches concurrently, handing activations to the next stage with
`jax.lax.ppermute` each tick. A prefill of M microbatches completes in
M + P - 1 ticks (bubble fraction (P-1)/(M+P-1)).

Cross-stage couplings handled:
  - activations x AND the v7 value-residual v_first (rwkv_graph.inc:440-453)
    travel together through the pipeline registers;
  - the v7 layer-0 specialization keys on the GLOBAL layer index
    (models/forward.py::run_layers_batched's base_layer);
  - embedding+ln0 run on stage 0, ln_out+head on the last stage, psum'd out.

This is for models too deep/large for one chip's HBM; TP (parallel/shard.py)
remains the first-choice axis for <=7B (SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models.params import ModelConfig
from rwkv_tpu.runtime.errors import RWKVArgsError


def _layers_specs(layers: dict) -> dict:
    """PartitionSpec pytree sharding every stacked layer leaf on its leading
    (layer) axis over 'pp'."""
    def spec(leaf):
        return P(*(("pp",) + (None,) * (leaf.ndim - 1)))
    return jax.tree.map(spec, layers)


def shard_params_pp(mesh: Mesh, cfg: ModelConfig, params) -> dict:
    """Place params for pipeline execution: layer stacks split over 'pp',
    everything else replicated."""
    P_ = mesh.shape["pp"]
    if cfg.n_layer % P_:
        raise RWKVArgsError(f"n_layer ({cfg.n_layer}) not divisible by pp={P_}")
    out = {}
    lspecs = _layers_specs(params["layers"])
    for k, v in params.items():
        if k == "layers":
            out[k] = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), v, lspecs
            )
        else:
            out[k] = jax.tree.map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())), v
            )
    return out


def shard_state_pp(mesh: Mesh, cfg: ModelConfig, state_layer_major) -> dict:
    """State leaves layer-major (L, B, ...): layer axis over 'pp'."""
    return {
        k: jax.device_put(v, NamedSharding(mesh, P(*("pp",) + (None,) * (v.ndim - 1))))
        for k, v in state_layer_major.items()
    }


def make_pp_forward_seq(cfg: ModelConfig, mesh: Mesh, n_micro: int | None = None):
    """Build a jitted pipeline-parallel batched prefill:
        fn(params, tokens (B, T), state_layer_major (L, B, ...), lengths (B,))
        -> (last_logits (B, V), new_state_layer_major)
    Params/state must be placed with shard_params_pp / shard_state_pp.
    B must be divisible by n_micro (default = pp size)."""
    from jax.experimental.shard_map import shard_map

    P_ = mesh.shape["pp"]
    M = n_micro or P_
    Lp = cfg.n_layer // P_

    def _pp(layers, emb, ln0_w, ln0_b, ln_out_w, ln_out_b, head_lin,
            tokens, state, lengths):
        """Runs INSIDE shard_map: layers/state are the LOCAL (Lp, ...) slice;
        everything else replicated. tokens (B, T), lengths (B,)."""
        stage = jax.lax.axis_index("pp")
        B, T = tokens.shape
        mb = B // M
        E = cfg.n_embed

        toks_m = tokens.reshape(M, mb, T)
        lens_m = lengths.reshape(M, mb)
        state_m = jax.tree.map(
            lambda s: s.reshape(s.shape[0], M, mb, *s.shape[2:]), state
        )  # (Lp, M, mb, ...)

        def embed(j):
            t_j = jax.lax.dynamic_index_in_dim(toks_m, j, 0, keepdims=False)
            x = emb[t_j].astype(jnp.float32)
            return fwd.layer_norm(x, ln0_w, ln0_b)

        def tick(carry, t):
            reg_x, reg_vf, state_m, out_x = carry
            # microbatch this stage works on at tick t
            j = t - stage
            in_range = (j >= 0) & (j < M)
            j_safe = jnp.clip(j, 0, M - 1)

            # stage 0's input is a fresh embedding; others take the register
            x_in = jnp.where(stage == 0, embed(j_safe), reg_x)
            vf_in = jnp.where(stage == 0, jnp.zeros_like(reg_vf), reg_vf)

            lens_j = jax.lax.dynamic_index_in_dim(lens_m, j_safe, 0, keepdims=False)
            valid = jnp.arange(T)[None, :] < lens_j[:, None]
            st_j = jax.tree.map(
                lambda s: jax.lax.dynamic_index_in_dim(s, j_safe, 1, keepdims=False),
                state_m,
            )  # (Lp, mb, ...)

            (x_out, vf_out), st_new = fwd.run_layers_batched(
                layers, cfg, x_in, st_j, lens_j, valid, vf_in,
                base_layer=stage * Lp,
            )
            # write back this microbatch's state only when really processed
            state_m = jax.tree.map(
                lambda s, n: jax.lax.dynamic_update_index_in_dim(
                    s, jnp.where(in_range, n,
                                 jax.lax.dynamic_index_in_dim(s, j_safe, 1, keepdims=False)),
                    j_safe, 1),
                state_m, st_new,
            )
            # last stage captures the finished microbatch's activations
            is_last = stage == P_ - 1
            out_x = jnp.where(
                is_last & in_range,
                jax.lax.dynamic_update_index_in_dim(out_x, x_out, j_safe, 0),
                out_x,
            )
            # hand activations to the next stage
            perm = [(i, (i + 1) % P_) for i in range(P_)]
            reg_x = jax.lax.ppermute(x_out, "pp", perm)
            reg_vf = jax.lax.ppermute(vf_out, "pp", perm)
            return (reg_x, reg_vf, state_m, out_x), None

        reg0 = jnp.zeros((mb, T, E), jnp.float32)
        out0 = jnp.zeros((M, mb, T, E), jnp.float32)
        (reg_x, reg_vf, state_m, out_x), _ = jax.lax.scan(
            tick, (reg0, reg0, state_m, out0), jnp.arange(M + P_ - 1)
        )

        new_state = jax.tree.map(
            lambda s: s.reshape(s.shape[0], M * mb, *s.shape[3:]), state_m
        )
        # only the last stage holds real outputs; psum replicates them
        out_x = jnp.where(stage == P_ - 1, out_x, jnp.zeros_like(out_x))
        out_x = jax.lax.psum(out_x, "pp").reshape(B, T, E)

        idx = jnp.broadcast_to((lengths - 1)[:, None, None], (B, 1, E))
        x_last = jnp.take_along_axis(out_x, idx, axis=1)[:, 0]
        x_last = fwd.layer_norm(x_last, ln_out_w, ln_out_b)
        logits = fwd.matmul(x_last, head_lin)
        return logits, new_state

    def run(params, tokens, state, lengths):
        if tokens.shape[0] % M:
            from rwkv_tpu.runtime.errors import RWKVArgsError

            raise RWKVArgsError(
                f"batch size {tokens.shape[0]} must be divisible by "
                f"n_micro ({M}) for the pipeline microbatch schedule"
            )
        layers = params["layers"]
        lspecs = _layers_specs(layers)
        state_specs = {
            k: P(*("pp",) + (None,) * (v.ndim - 1)) for k, v in state.items()
        }
        rep = P()
        head_specs = jax.tree.map(lambda _: rep, params["head"])
        fn = shard_map(
            _pp, mesh=mesh,
            in_specs=(lspecs, rep, rep, rep, rep, rep, head_specs,
                      rep, state_specs, rep),
            out_specs=(rep, state_specs),
            check_rep=False,
        )
        return fn(layers, params["emb"], params["ln0_w"], params["ln0_b"],
                  params["ln_out_w"], params["ln_out_b"], params["head"],
                  tokens, state, lengths)

    return jax.jit(run)
