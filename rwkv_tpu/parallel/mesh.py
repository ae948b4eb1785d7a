"""Device mesh construction for multi-chip / multi-host execution.

The reference is single-process (SURVEY.md §2.4); this is the TPU-native
replacement: one global mesh with a data-parallel axis ('dp', independent
streams — the analogue of rwkv_clone_context multi-stream serving, carried
over DCN across hosts) and a tensor-parallel axis ('tp', weights + per-head
wkv state sharded over ICI).

The head dimension is the natural TP shard axis: the S×S×H wkv state never
mixes heads, so the recurrence runs with zero communication; only the
projections in/out of the heads need collectives, which XLA inserts from the
NamedShardings (all-gather of activations / reduce-scatter of the output
projection), overlapped with compute by the latency-hiding scheduler.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int | None = None, devices=None) -> Mesh:
    """Build a ('dp', 'tp') mesh. Defaults: all devices on tp for 1 host."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None and tp is None:
        dp, tp = 1, n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def multihost_initialize(**kw):
    """Multi-host entry: call once per process before make_mesh
    (jax.distributed.initialize; coordinator/process info from env or kw)."""
    jax.distributed.initialize(**kw)


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
