"""Pipeline parallelism: layer-stage sharded prefill vs single device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models import synth
from rwkv_tpu.parallel import pipeline as PP
from rwkv_tpu.runtime import generate as G


def _mesh_pp(p):
    if jax.device_count() < p:
        pytest.skip(f"needs {p} devices")
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:p]), ("pp",))


@pytest.mark.parametrize("version,n_micro", [("7.0", 4), ("7.0", 2), ("6.0", 4), ("4.0", 2)])
def test_pp_prefill_matches_single_device(version, n_micro):
    mesh = _mesh_pp(4)
    cfg = synth.make_config(version, n_vocab=512, n_embed=128, n_layer=8)
    params_host = synth.random_params(cfg)
    params = jax.tree.map(jnp.asarray, params_host)

    B, T = 4, 24
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (B, T)), jnp.int32)
    lengths = jnp.asarray([24, 17, 24, 5], jnp.int32)
    state_b = G.batched_init_state(cfg, B)

    ref_logits, ref_state = fwd.forward_seq(params, cfg, tokens, state_b, lengths)

    pparams = PP.shard_params_pp(mesh, cfg, params_host)
    state_lm = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state_b)
    pstate = PP.shard_state_pp(mesh, cfg, state_lm)
    run = PP.make_pp_forward_seq(cfg, mesh, n_micro=n_micro)
    logits, new_state = run(pparams, tokens, pstate, lengths)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)
    ref_lm = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), ref_state)
    for k in ref_lm:
        np.testing.assert_allclose(np.asarray(new_state[k]), np.asarray(ref_lm[k]),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_pp_rejects_indivisible_layers():
    mesh = _mesh_pp(4)
    cfg = synth.make_config("7.0", n_vocab=512, n_embed=128, n_layer=6)
    with pytest.raises(Exception):
        PP.shard_params_pp(mesh, cfg, synth.random_params(cfg))


def test_pp_single_token_step():
    """T=1 through the pipeline (decode-style) matches single-device."""
    mesh = _mesh_pp(4)
    cfg = synth.make_config("7.0", n_vocab=512, n_embed=128, n_layer=8)
    params_host = synth.random_params(cfg)
    params = jax.tree.map(jnp.asarray, params_host)
    B = 4
    tokens = jnp.asarray([[1], [2], [3], [4]], jnp.int32)
    lengths = jnp.ones((B,), jnp.int32)
    state_b = G.batched_init_state(cfg, B)
    ref_logits, _ = fwd.forward_seq(params, cfg, tokens, state_b, lengths)

    pparams = PP.shard_params_pp(mesh, cfg, params_host)
    state_lm = jax.tree.map(lambda s: jnp.swapaxes(s, 0, 1), state_b)
    pstate = PP.shard_state_pp(mesh, cfg, state_lm)
    run = PP.make_pp_forward_seq(cfg, mesh, n_micro=2)
    logits, _ = run(pparams, tokens, pstate, lengths)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=2e-4)
