"""Pallas WKV kernels vs the jnp reference scans (interpret mode on CPU;
the same comparisons run compiled on a real TPU in bench/verify flows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rwkv_tpu.ops import wkv as ref
from rwkv_tpu.ops import pallas_wkv as pk

RNG = np.random.default_rng(42)


def _rand(*shape):
    return jnp.asarray(RNG.standard_normal(shape).astype(np.float32) * 0.3)


def _decayish(*shape):
    # w in (0, 1) like exp(-exp(.)) / exp(-0.6*sigmoid)
    return jnp.asarray(np.exp(-np.exp(RNG.uniform(-2, 1, shape))).astype(np.float32))


@pytest.mark.parametrize("T,H,S", [(1, 4, 64), (16, 4, 64), (24, 2, 64), (8, 1, 64)])
def test_wkv7_matches_reference(T, H, S):
    r, k, v = _rand(T, H, S), _rand(T, H, S), _rand(T, H, S)
    w = _decayish(T, H, S)
    kk = _rand(T, H, S)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    a_gate = jax.nn.sigmoid(_rand(T, H, S))
    a, b = -kk, kk * a_gate
    state = _rand(H, S, S)
    valid = jnp.ones(T, bool)

    out_ref, st_ref = ref.wkv7(r, w, k, v, a, b, state, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv7_masked(r, w, k, v, a, b, state, valid)
    np.testing.assert_allclose(out_pl, out_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(st_pl, st_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("T,H,S", [(1, 4, 64), (16, 4, 64), (12, 8, 64)])
def test_wkv6_matches_reference(T, H, S):
    r, k, v = _rand(T, H, S), _rand(T, H, S), _rand(T, H, S)
    w = _decayish(T, H, S)
    tf = _rand(H, S)
    state = _rand(H, S, S)
    valid = jnp.ones(T, bool)

    out_ref, st_ref = ref.wkv56(r, k, v, tf, w, state, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv6_masked(r, k, v, tf, w, state, valid)
    np.testing.assert_allclose(out_pl, out_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(st_pl, st_ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("length", [1, 3, 7])
def test_wkv7_padding_mask(length):
    """Padded positions must leave the state exactly as it was at `length`."""
    T, H, S = 8, 2, 64
    r, k, v = _rand(T, H, S), _rand(T, H, S), _rand(T, H, S)
    w = _decayish(T, H, S)
    a, b = -_rand(T, H, S), _rand(T, H, S)
    state = _rand(H, S, S)
    valid = jnp.arange(T) < length

    out_ref, st_ref = ref.wkv7(r, w, k, v, a, b, state, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv7_masked(r, w, k, v, a, b, state, valid)
    np.testing.assert_allclose(st_pl, st_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out_pl[:length], out_ref[:length], atol=1e-5, rtol=1e-5)


def test_wkv6_padding_mask():
    T, H, S = 8, 2, 64
    length = 5
    r, k, v = _rand(T, H, S), _rand(T, H, S), _rand(T, H, S)
    w = _decayish(T, H, S)
    tf = _rand(H, S)
    state = _rand(H, S, S)
    valid = jnp.arange(T) < length

    out_ref, st_ref = ref.wkv56(r, k, v, tf, w, state, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv6_masked(r, k, v, tf, w, state, valid)
    np.testing.assert_allclose(st_pl, st_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out_pl[:length], out_ref[:length], atol=1e-5, rtol=1e-5)


def test_wkv7_vmap_batch():
    """vmap over a batch axis (the serving path) must match per-example."""
    B, T, H, S = 3, 4, 2, 64
    r, k, v = _rand(B, T, H, S), _rand(B, T, H, S), _rand(B, T, H, S)
    w = _decayish(B, T, H, S)
    a, b = -_rand(B, T, H, S), _rand(B, T, H, S)
    state = _rand(B, H, S, S)
    valid = jnp.ones((B, T), bool)

    with pltpu.force_tpu_interpret_mode():
        out_b, st_b = jax.vmap(pk.wkv7_masked)(r, w, k, v, a, b, state, valid)
        for i in range(B):
            out_i, st_i = pk.wkv7_masked(r[i], w[i], k[i], v[i], a[i], b[i], state[i], valid[i])
            np.testing.assert_allclose(out_b[i], out_i, atol=1e-6)
            np.testing.assert_allclose(st_b[i], st_i, atol=1e-6)


@pytest.mark.parametrize("chunk,head_block", [(32, 2), (64, 4)])
def test_wkv7_fused_chunk_batched(chunk, head_block):
    """Fused chunk-parallel kernel (WY formulation, log-decay interface)
    vs the sequential batched scan, with ragged per-stream lengths."""
    rng = np.random.default_rng(11)
    B, T, H, S = 2, 96, 4, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    a = jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = a * jnp.asarray(rng.uniform(0, 1, (B, T, H, 1)), jnp.float32)
    lw = -0.606531 * jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, T, H, S)), jnp.float32))
    w = jnp.exp(lw)
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 77, jnp.arange(T) < T])

    out_ref, st_ref = ref.wkv7_batched(r, w, k, v, -a, b, s0, valid)
    with pltpu.force_tpu_interpret_mode():
        out_pl, st_pl = pk.wkv7_chunked_pallas_batched(
            r, lw, k, v, -a, b, s0, valid, chunk=chunk, head_block=head_block
        )
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(m, np.asarray(out_pl), 0.0), np.where(m, np.asarray(out_ref), 0.0),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref), atol=2e-4, rtol=2e-4)


def test_chunked_batched_matches_scan():
    """XLA chunked batched fold (no vmap) vs the sequential batched scan."""
    from rwkv_tpu.ops import wkv_chunked as wc

    rng = np.random.default_rng(12)
    B, T, H, S = 3, 64, 2, 64
    r, k, v = (jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32) for _ in range(3))
    a = jnp.asarray(rng.uniform(-1, 1, (B, T, H, S)), jnp.float32)
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = a * jnp.asarray(rng.uniform(0, 1, (B, T, H, 1)), jnp.float32)
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(jnp.asarray(rng.standard_normal((B, T, H, S)), jnp.float32)))
    s0 = jnp.asarray(rng.standard_normal((B, H, S, S)) * 0.1, jnp.float32)
    valid = jnp.stack([jnp.arange(T) < 64, jnp.arange(T) < 31, jnp.arange(T) < 1])

    out_ref, st_ref = ref.wkv7_batched(r, w, k, v, -a, b, s0, valid)
    out_c, st_c = wc.wkv7_chunked_batched(r, w, k, v, -a, b, s0, valid, chunk=32)
    m = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.where(m, np.asarray(out_c), 0.0), np.where(m, np.asarray(out_ref), 0.0),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(st_c), np.asarray(st_ref), atol=2e-4, rtol=2e-4)

    # wkv6 batched fold
    tf = jnp.asarray(rng.uniform(0, 0.3, (H, S)), jnp.float32)
    out6_ref, st6_ref = ref.wkv56_batched(r, k, v, tf, w, s0, valid)
    out6, st6 = wc.wkv6_chunked_batched(r, k, v, tf, w, s0, valid, chunk=32)
    np.testing.assert_allclose(
        np.where(m, np.asarray(out6), 0.0), np.where(m, np.asarray(out6_ref), 0.0),
        atol=2e-4, rtol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(st6), np.asarray(st6_ref), atol=2e-4, rtol=2e-4)
