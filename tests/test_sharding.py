"""Sharded (dp x tp mesh) execution vs single-device, on the 8-virtual-device
CPU mesh (conftest sets xla_force_host_platform_device_count=8).

TP shards the head dimension (parallel/shard.py): the per-head SxS wkv state
never mixes heads, so the recurrence needs no collectives; XLA/GSPMD inserts
the all-gathers/reduces around the projections from the NamedShardings."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models import synth
from rwkv_tpu.parallel import mesh as M
from rwkv_tpu.parallel import shard as SH
from rwkv_tpu.parallel import train as TR
from rwkv_tpu.runtime import generate as G


def _mesh_or_skip(dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip(f"needs {dp*tp} devices")
    return M.make_mesh(dp=dp, tp=tp, devices=jax.devices()[: dp * tp])


def _setup(version="7.0", B=4, T=16, tp=4):
    cfg = synth.make_config(version, n_vocab=512, n_embed=64 * max(tp, 2), n_layer=2)
    params = jax.tree.map(jnp.asarray, synth.random_params(cfg, seed=7))
    state = G.batched_init_state(cfg, B)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.n_vocab, (B, T)), jnp.int32
    )
    lengths = jnp.full((B,), T, jnp.int32)
    return cfg, params, state, tokens, lengths


@pytest.mark.parametrize("version", ["5.2", "6.0", "7.0"])
def test_sharded_prefill_matches_single_device(version):
    mesh = _mesh_or_skip(2, 4)
    cfg, params, state, tokens, lengths = _setup(version)
    ref_logits, ref_state = G.prefill(params, cfg, tokens, state, lengths)

    sp = SH.shard_params(mesh, cfg, params)
    ss = SH.shard_state(mesh, cfg, state)
    st = jax.device_put(tokens, M.sharding(mesh, "dp", None))
    sl = jax.device_put(lengths, M.sharding(mesh, "dp"))
    with mesh:
        logits, new_state = G.prefill(sp, cfg, st, ss, sl)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(new_state), jax.tree.leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_sharded_decode_matches_single_device():
    mesh = _mesh_or_skip(2, 4)
    cfg, params, state, tokens, _ = _setup("7.0")
    tok0 = tokens[:, 0]
    ref_toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=6)

    sp = SH.shard_params(mesh, cfg, params)
    ss = SH.shard_state(mesh, cfg, state)
    st0 = jax.device_put(tok0, M.sharding(mesh, "dp"))
    with mesh:
        toks, _ = G.greedy_decode(sp, cfg, st0, ss, steps=6)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_sharded_speculative_decode_matches_single_device():
    """Speculative decoding (w8a8 self-draft) composed over the dp x tp mesh:
    both models' states shard, the round scan runs under GSPMD, and the
    emitted stream equals the single-device target greedy stream."""
    from rwkv_tpu.ops import linear as L
    from rwkv_tpu.runtime import speculative as S

    mesh = _mesh_or_skip(2, 4)
    cfg, params, state, tokens, _ = _setup("7.0")
    draft = L.quantize_params_device(params, mode="w8a8")
    tok0 = tokens[:, 0]
    ref_toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=12)

    sp = SH.shard_params(mesh, cfg, params)
    sd = SH.shard_params(mesh, cfg, draft)
    ss = SH.shard_state(mesh, cfg, state)
    ds = SH.shard_state(mesh, cfg, G.batched_init_state(cfg, tok0.shape[0]))
    st0 = jax.device_put(tok0, M.sharding(mesh, "dp"))
    with mesh:
        toks, cnts, _ = S.spec_rounds(sd, cfg, sp, cfg, st0, ds, ss,
                                      k=3, rounds=6)
    toks, cnts = np.asarray(toks), np.asarray(cnts)
    ref = np.asarray(ref_toks)
    for b in range(ref.shape[0]):
        flat = np.concatenate([toks[b, r, : cnts[b, r]] for r in range(6)])
        n = min(len(flat), 12)
        np.testing.assert_array_equal(flat[:n], ref[b, :n])


def test_sharded_w8a8_decode_matches_single_device():
    """Quantized (per-channel int8) weights under TP sharding: the w8a8
    matmul is plain XLA ops, so GSPMD partitions it like the dense path."""
    from rwkv_tpu.ops import linear as L

    mesh = _mesh_or_skip(2, 4)
    cfg, params, state, tokens, _ = _setup("7.0")
    qp = L.quantize_params_device(params, mode="w8a8")
    tok0 = tokens[:, 0]
    ref_toks, _ = G.greedy_decode(qp, cfg, tok0, state, steps=6)

    sp = SH.shard_params(mesh, cfg, qp)
    ss = SH.shard_state(mesh, cfg, state)
    st0 = jax.device_put(tok0, M.sharding(mesh, "dp"))
    with mesh:
        toks, _ = G.greedy_decode(sp, cfg, st0, ss, steps=6)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_sharded_w4a8bc_decode_matches_single_device():
    """The headline w4a8bc (bc4a8 row-pair packed) serving mode under TP
    sharding. Regression (round-4 advisor, medium): _linear_spec used to
    miss the bc4a8 kind, so the Linear fell to the dense branch and
    shard_params failed on pytree structure mismatch."""
    from rwkv_tpu.ops import linear as L

    mesh = _mesh_or_skip(2, 4)
    cfg, params, state, tokens, _ = _setup("7.0")
    qp = L.quantize_params_device(params, mode="w4a8bc")
    kinds = {v.kind for v in qp["layers"].values() if hasattr(v, "kind")}
    assert "bc4a8" in kinds, kinds
    tok0 = tokens[:, 0]
    ref_toks, _ = G.greedy_decode(qp, cfg, tok0, state, steps=6)

    sp = SH.shard_params(mesh, cfg, qp)
    ss = SH.shard_state(mesh, cfg, state)
    st0 = jax.device_put(tok0, M.sharding(mesh, "dp"))
    with mesh:
        toks, _ = G.greedy_decode(sp, cfg, st0, ss, steps=6)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_sharded_train_step_runs():
    mesh = _mesh_or_skip(2, 4)
    cfg, params, _, tokens, lengths = _setup("7.0")
    sp = SH.shard_params(mesh, cfg, params)
    st = jax.device_put(tokens, M.sharding(mesh, "dp", None))
    sl = jax.device_put(lengths, M.sharding(mesh, "dp"))
    with mesh:
        train_step, init_opt = TR.make_train_step(cfg)
        opt_state = init_opt(sp)
        params2, opt_state, loss = train_step(sp, opt_state, st, sl)
        loss.block_until_ready()
    assert np.isfinite(float(loss))


def test_tp_only_mesh_single_stream():
    """tp=8, dp=1 — one stream fully tensor-parallel."""
    mesh = _mesh_or_skip(1, 8)
    cfg, params, state, tokens, lengths = _setup("5.2", B=1, tp=8)
    ref_logits, _ = G.prefill(params, cfg, tokens, state, lengths)
    sp = SH.shard_params(mesh, cfg, params)
    ss = SH.shard_state(mesh, cfg, state)
    with mesh:
        logits, _ = G.prefill(sp, cfg,
                              jax.device_put(tokens, M.sharding(mesh, "dp", None)),
                              ss,
                              jax.device_put(lengths, M.sharding(mesh, "dp")))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)


def test_multiprocess_distributed_dryrun():
    """REAL multi-process execution (not virtual devices): 2 worker
    processes x 4 CPU devices each, jax.distributed.initialize + gloo
    collectives, global (dp=2, tp=4) mesh with dp spanning processes —
    sharded prefill logits and greedy decode must match single-process.
    This exercises the DCN-axis story of SURVEY.md §5.8 for real."""
    from rwkv_tpu.parallel.multiproc import run_multiprocess_dryrun

    run_multiprocess_dryrun(num_processes=2, local_devices=4)
