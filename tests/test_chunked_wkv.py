"""Chunk-parallel (MXU) wkv forms vs the sequential reference scans."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rwkv_tpu.ops import wkv as ref
from rwkv_tpu.ops.wkv_chunked import wkv6_chunked_masked, wkv7_chunked_masked

RNG = np.random.default_rng(11)


def _rand(*s):
    return jnp.asarray(RNG.standard_normal(s).astype(np.float32) * 0.3)


def _w7(*s):
    # RWKV-7 decay: exp(-0.6065 * sigmoid(.)) in [0.545, 1]
    return jnp.asarray(
        np.exp(-0.606531 / (1 + np.exp(-RNG.standard_normal(s)))).astype(np.float32)
    )


@pytest.mark.parametrize("T,length", [(32, 32), (64, 64), (96, 77), (8, 5), (1, 1)])
def test_wkv7_chunked_matches_scan(T, length):
    H, S = 4, 64
    r, k, v = _rand(T, H, S), _rand(T, H, S), _rand(T, H, S)
    w = _w7(T, H, S)
    kk = _rand(T, H, S)
    kk = kk / jnp.maximum(jnp.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    a, b = -kk, kk * jax.nn.sigmoid(_rand(T, H, S))
    st = _rand(H, S, S)
    valid = jnp.arange(T) < length

    o1, s1 = ref.wkv7(r, w, k, v, a, b, st, valid)
    o2, s2 = wkv7_chunked_masked(r, w, k, v, a, b, st, valid)
    n = min(length, T)
    np.testing.assert_allclose(o2[:n], o1[:n], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(s2, s1, atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("harsh", [False, True])
@pytest.mark.parametrize("T,length", [(32, 32), (64, 50), (96, 96)])
def test_wkv6_chunked_matches_scan(T, length, harsh):
    """harsh=True uses v6-style near-zero decays (w ~ exp(-e^3)) — the case
    that would overflow a naive factored-decay formulation."""
    H, S = 4, 64
    r, k, v = _rand(T, H, S), _rand(T, H, S), _rand(T, H, S)
    lo, hi = ((-2, 3) if harsh else (-3, 0.5))
    w = jnp.asarray(np.exp(-np.exp(RNG.uniform(lo, hi, (T, H, S)))).astype(np.float32))
    tf = _rand(H, S)
    st = _rand(H, S, S)
    valid = jnp.arange(T) < length

    o1, s1 = ref.wkv56(r, k, v, tf, w, st, valid)
    o2, s2 = wkv6_chunked_masked(r, k, v, tf, w, st, valid)
    assert not bool(jnp.isnan(o2).any() or jnp.isnan(s2).any())
    n = min(length, T)
    np.testing.assert_allclose(o2[:n], o1[:n], atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(s2, s1, atol=3e-5, rtol=1e-4)


def test_chunked_full_model_matches_scan_path():
    """End-to-end: forward with the chunked kernels (pallas=True routes
    T>=16 to chunked; these run fine on CPU since they're pure jnp) must
    match the jnp-scan forward on the tiny v7 golden model."""
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from tests.common import PROMPT, fixture

    cfg, prm = P.load_params(fixture("tiny-rwkv-7v0-834K-FP32.bin"), parity=True)
    toks = jnp.asarray((PROMPT * 11)[:32], jnp.int32)
    st = F.init_state(cfg)
    l1, s1 = F.forward(prm, cfg, toks, st, jnp.int32(32), pallas=False)
    l2, s2 = F.forward(prm, cfg, toks, st, jnp.int32(32), pallas=True)
    np.testing.assert_allclose(l2, l1, atol=5e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s2)):
        np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-4)


def test_chunked_full_model_v5_v6():
    from rwkv_tpu.models import forward as F
    from rwkv_tpu.models import params as P
    from tests.common import fixture

    for fixture_name in ("tiny-rwkv-5v2-730K-FP32.bin", "tiny-rwkv-6v0-3m-Q5_0.bin"):
        cfg, prm = P.load_params(fixture(fixture_name), parity=True)
        toks = jnp.asarray(list(range(32)), jnp.int32)
        st = F.init_state(cfg)
        l1, s1 = F.forward(prm, cfg, toks, st, jnp.int32(32), pallas=False)
        l2, s2 = F.forward(prm, cfg, toks, st, jnp.int32(32), pallas=True)
        np.testing.assert_allclose(l2, l1, atol=5e-3, rtol=1e-3)


def test_wkv4_chunked_matches_scan():
    """Chunk-parallel v4 (cumsum max-trick) vs the sequential scan, with
    large-magnitude keys (the regime the max trick exists for), a non-fresh
    carry, ragged batch lengths, and chunk-boundary continuation."""
    import jax.numpy as jnp
    import numpy as np
    from rwkv_tpu.ops import wkv as ref
    from rwkv_tpu.ops import wkv_chunked as wc

    rng = np.random.default_rng(21)
    B, T, E = 3, 100, 64
    k = jnp.asarray(rng.standard_normal((B, T, E)) * 5.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    u = jnp.asarray(rng.standard_normal(E) * 0.5, jnp.float32)
    d = jnp.asarray(-np.exp(rng.standard_normal(E) * 0.5), jnp.float32)
    valid = jnp.stack([jnp.arange(T) < n for n in (100, 37, 1)])

    # non-fresh carry: run the scan for a prefix first
    aa0 = jnp.zeros((B, E)); bb0 = jnp.zeros((B, E)); pp0 = jnp.full((B, E), -1e30)
    pre = jnp.asarray(rng.standard_normal((B, 7, E)) * 3.0, jnp.float32)
    prev = jnp.asarray(rng.standard_normal((B, 7, E)), jnp.float32)
    _, (aa, bb, pp) = ref.wkv4_batched(pre, prev, u, d, aa0, bb0, pp0,
                                       jnp.ones((B, 7), bool))

    out_ref, (ar, br, pr) = ref.wkv4_batched(k, v, u, d, aa, bb, pp, valid)
    for chunk in (16, 64, 128):
        out_c, (ac, bc, pc) = wc.wkv4_chunked_batched(k, v, u, d, aa, bb, pp, valid,
                                                      chunk=chunk)
        m = np.asarray(valid)[:, :, None]
        np.testing.assert_allclose(
            np.where(m, np.asarray(out_c), 0.0), np.where(m, np.asarray(out_ref), 0.0),
            atol=1e-4, rtol=1e-4,
        )
        # carries agree in TRUE value: (aa, bb) * e^pp (pp normalization differs)
        for (xc, xr) in ((ac, ar), (bc, br)):
            tc = np.asarray(xc) * np.exp(np.asarray(pc) - np.asarray(pr))
            np.testing.assert_allclose(tc, np.asarray(xr), atol=1e-4, rtol=1e-4)

    # single-stream wrapper
    out_s, _ = wc.wkv4_chunked(k[0], v[0], u, d, aa[0], bb[0], pp[0], valid[0])
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_ref[0]),
                               atol=1e-4, rtol=1e-4)


def test_wkv4_chunked_fresh_state_pp():
    """The -1e30 initial pp (reference rwkv_eval.inc:224-241) must flow
    through the chunk max without overflow/nan."""
    import jax.numpy as jnp
    import numpy as np
    from rwkv_tpu.ops import wkv as ref
    from rwkv_tpu.ops import wkv_chunked as wc

    rng = np.random.default_rng(22)
    T, E = 32, 16
    k = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    u = jnp.asarray(rng.standard_normal(E), jnp.float32)
    d = jnp.asarray(-np.exp(rng.standard_normal(E)), jnp.float32)
    aa = jnp.zeros(E); bb = jnp.zeros(E); pp = jnp.full((E,), -1e30)
    valid = jnp.ones(T, bool)
    out_ref, _ = ref.wkv4(k, v, u, d, aa, bb, pp, valid)
    out_c, _ = wc.wkv4_chunked(k, v, u, d, aa, bb, pp, valid, chunk=16)
    assert np.isfinite(np.asarray(out_c)).all()
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_ref),
                               atol=1e-4, rtol=1e-4)
