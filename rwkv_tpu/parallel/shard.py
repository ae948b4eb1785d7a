"""NamedSharding layouts for RWKV params and state.

TP sharding plan (SURVEY.md §5.8): the head dimension is the shard axis —
the per-head S×S wkv state never mixes heads, so the recurrence itself needs
no communication. Column-parallel projections into the heads (r/k/v/gate,
ffn key), row-parallel projections out (att output, ffn value, with XLA
inserting the reduce); E-sized per-channel vectors that are consumed inside
the head space are sharded head-aligned (E splits into contiguous heads).

Only params/state/IO get explicit shardings; intermediate shardings are left
to GSPMD propagation.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rwkv_tpu.models.params import ModelConfig
from rwkv_tpu.ops.linear import Linear

# layer-stacked Linear names -> 'col' (shard out dim) / 'row' (shard in dim)
# / 'rep' (replicate)
_LINEAR_PLAN = {
    "att_k": "col", "att_v": "col", "att_r": "col", "att_gate": "col",
    "att_o": "row",
    "ffn_k": "col", "ffn_v": "row", "ffn_r": "col",
    # low-rank adapters are tiny: replicate
    "tm_w1": "rep", "decay_w1": "rep", "decay_w2": "rep",
    "w1": "rep", "w2": "rep", "a1": "rep", "a2": "rep",
    "g1": "rep", "g2": "rep", "v1": "rep", "v2": "rep",
}

# layer-stacked vectors sharded head-aligned over their E / (H, S) axis
_HEAD_ALIGNED = {"time_decay", "time_first", "ln_x_w", "ln_x_b", "r_k"}


def _linear_spec(lin: Linear, mode: str, stacked: bool):
    lead = (None,) if stacked else ()
    if mode == "rep":
        return jax.tree.map(lambda _: P(), lin)
    if lin.kind == "quant":
        # q: (L, O, nb, 32); d/m: (L, O, nb)
        if mode == "col":
            q, d = P(*lead, "tp", None, None), P(*lead, "tp", None)
        else:
            q, d = P(*lead, None, "tp", None), P(*lead, None, "tp")
        return Linear(q=q, d=d, m=None if lin.m is None else d, kind=lin.kind, fmt=lin.fmt)
    if lin.kind in ("qfast", "q4fast", "q5fast", "q6fast", "s4fast", "w4a8g",
                    "q4bc", "bc4a8", "bc5a8"):
        # q: (L, in, O) int8 — or (L, in/2, O) packed uint8 for q4fast/q5fast/
        # q6fast (plus their (L, in*b/8, O) high-bit plane qh) — and d/m:
        # (L, nb, O), all contraction-major. Packed kinds under a mesh
        # evaluate through the jnp reference path (global semantics), so
        # sharding the packed-row axis stays correct: GSPMD reshards the
        # unpack/concat as needed.
        if mode == "col":
            q, d = P(*lead, None, "tp"), P(*lead, None, "tp")
        else:
            q = P(*lead, "tp", None)
            # bc4a8/bc5a8 coarse-group scales have a tiny group axis
            # (in/128 or in/256) that need not divide the mesh — replicate
            # them in row mode (GSPMD reshards the reference-path unpack)
            d = (P(*lead, None, None) if lin.kind in ("bc4a8", "bc5a8")
                 else P(*lead, "tp", None))
        return Linear(q=q, d=d, m=None if lin.m is None else d,
                      qh=None if lin.qh is None else q,
                      kind=lin.kind, fmt=lin.fmt)
    if lin.kind == "w8a8":
        # q: (L, in, O); d: (L, O) per-output-channel
        if mode == "col":
            q, d = P(*lead, None, "tp"), P(*lead, "tp")
        else:
            q, d = P(*lead, "tp", None), P(*lead, None)
        return Linear(q=q, d=d, m=None, kind=lin.kind, fmt=lin.fmt)
    # dense (L, in, out)
    spec = P(*lead, None, "tp") if mode == "col" else P(*lead, "tp", None)
    return Linear(w=spec, kind=lin.kind, fmt=lin.fmt)


def param_specs(cfg: ModelConfig, params) -> dict:
    """PartitionSpec pytree matching `params` (load_params output)."""
    specs = {
        "emb": P(),
        "ln0_w": P(), "ln0_b": P(), "ln_out_w": P(), "ln_out_b": P(),
        "head": _linear_spec(params["head"], "col", stacked=False),
    }
    lspecs = {}
    for name, val in params["layers"].items():
        if isinstance(val, Linear):
            lspecs[name] = _linear_spec(val, _LINEAR_PLAN.get(name, "rep"), stacked=True)
        elif name in _HEAD_ALIGNED:
            # (L, E) head-aligned or (L, H, S)
            lspecs[name] = P(None, "tp") if val.ndim == 2 else P(None, "tp", None)
        else:
            lspecs[name] = P()
    specs["layers"] = lspecs
    return specs


def state_specs(cfg: ModelConfig, batched: bool, layer_major: bool = False) -> dict:
    """State pytree specs: dp over the stream batch, tp over heads.
    layer_major=True is the serving layout (L, B, ...) (runtime/serve.py);
    otherwise batched state is (B, L, ...)."""
    # token-shift carries feed column-parallel matmuls, so they stay
    # replicated over tp; the per-channel (v4) / per-head (v5+) wkv state is
    # the big tensor and shards cleanly
    if not batched:
        lead = (None,)            # unbatched: (L, ...) leading layer dim
    elif layer_major:
        lead = (None, "dp")       # serving layout (L, B, ...)
    else:
        lead = ("dp", None)       # (B, L, ...)
    base = {
        "ffn_xx": P(*lead, None),
        "att_xx": P(*lead, None),
    }
    if cfg.version_major == 4:
        base.update(
            aa=P(*lead, "tp"), bb=P(*lead, "tp"), pp=P(*lead, "tp")
        )
    else:
        base["heads"] = P(*lead, "tp", None, None)
    return base


def shard_params(mesh: Mesh, cfg: ModelConfig, params):
    """device_put params with the TP plan."""
    specs = param_specs(cfg, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_state(mesh: Mesh, cfg: ModelConfig, state, batched: bool = True,
                layer_major: bool = False):
    specs = state_specs(cfg, batched, layer_major)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in state.items()}
