"""Runtime Context API tests, mirroring the reference's semantic-equivalence
C tests: test_eval_sequence_in_chunks.c, test_logit_calculation_skipping.c,
test_context_cloning.c.

The reference asserts exact memcmp equality between chunked and serial state;
under XLA the compiled reduction order can differ between the T=1 and T=k
programs, so we assert allclose with a tight tolerance instead (SURVEY.md §4).
"""

import numpy as np
import jax
import pytest

from rwkv_tpu.runtime.context import Context, system_info
from rwkv_tpu.runtime.errors import RWKVArgsError
from tests.common import PROMPT, expected_logits, fixture, logit_diff_sum

MODEL = "tiny-rwkv-5v2-730K-FP32.bin"

PROMPT_70 = [ord(c) for c in "This is a port of [BlinkDL/RWKV-LM](https://github.com/BlinkDL/RWKV-LM"][:70]


@pytest.fixture(scope="module")
def ctx():
    return Context(fixture(MODEL))


def _state_allclose(a, b, atol=2e-5):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=atol, rtol=1e-5)


def test_getters(ctx):
    assert ctx.n_vocab == 256
    assert ctx.n_embed == 64
    assert ctx.n_layer == 12
    # v5+: E*(2+head_size)*L  (rwkv.cpp:171-179)
    assert ctx.state_len == 64 * (2 + 8) * 12
    assert ctx.logits_len == 256


def test_serial_matches_oracle(ctx):
    expected = expected_logits("5v2-730K")
    state = None
    for tok in PROMPT:
        logits, state = ctx.eval(tok, state)
    assert abs(logit_diff_sum(logits, expected)) <= 0.001 * 1.05


@pytest.mark.parametrize("chunk_size", [1, 2, 8, 10])
def test_chunked_equals_serial(ctx, chunk_size):
    """test_eval_sequence_in_chunks.c:45-55 over the same 70-token prompt."""
    state = None
    for tok in PROMPT_70:
        logits_serial, state = ctx.eval(tok, state)
    logits_chunk, state_chunk = ctx.eval_sequence_in_chunks(PROMPT_70, chunk_size)
    _state_allclose(state, state_chunk)
    np.testing.assert_allclose(
        np.asarray(logits_serial), np.asarray(logits_chunk), atol=5e-4, rtol=1e-4
    )


def test_chunked_single_token(ctx):
    """test_eval_sequence_in_chunks.c main(): prompt of length 1."""
    logits_serial, state_serial = ctx.eval(ord("T"))
    logits_chunk, state_chunk = ctx.eval_sequence_in_chunks([ord("T")], 8)
    _state_allclose(state_serial, state_chunk)
    # tight tolerance, not memcmp: the device-scanned chunk path evaluates in
    # a C-wide padded block, so XLA reduction shapes differ from serial eval
    np.testing.assert_allclose(
        np.asarray(logits_serial), np.asarray(logits_chunk), atol=2e-5, rtol=1e-5
    )


def test_logit_skipping_same_state(ctx):
    """test_logit_calculation_skipping.c: logits=None path yields identical state."""
    _, state_with = ctx.eval(ord("T"))
    none_logits, state_without = ctx.eval(ord("T"), compute_logits=False)
    assert none_logits is None
    _state_allclose(state_with, state_without, atol=0)

    _, seq_with = ctx.eval_sequence(PROMPT_70)
    none2, seq_without = ctx.eval_sequence(PROMPT_70, compute_logits=False)
    assert none2 is None
    _state_allclose(seq_with, seq_without, atol=0)


def test_context_cloning(ctx):
    """test_context_cloning.c: a clone produces identical logits; the clone
    keeps working after the original is dropped (weights shared)."""
    original = Context(fixture(MODEL))
    logits_orig, _ = original.eval_sequence(PROMPT)
    clone = original.clone()
    assert clone._params is original._params  # shared, not copied
    del original
    logits_clone, _ = clone.eval_sequence(PROMPT)
    np.testing.assert_array_equal(np.asarray(logits_orig), np.asarray(logits_clone))


def test_state_buffer_roundtrip(ctx):
    """Flat-buffer export/import is byte-compatible and lossless."""
    _, state = ctx.eval_sequence(PROMPT)
    buf = ctx.state_to_buffer(state)
    assert buf.shape == (ctx.state_len,)
    state2 = ctx.state_from_buffer(buf)
    _state_allclose(state, state2, atol=0)
    # evaluating from the restored state gives identical logits
    l1, _ = ctx.eval(65, state)
    l2, _ = ctx.eval(65, state2)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_v4_init_state_pp():
    """v4 pp slots must initialize to -1e30 (rwkv_eval.inc:224-241)."""
    c4 = Context(fixture("tiny-rwkv-4v0-660K-FP32.bin"))
    buf = c4.init_state_buffer()
    e = c4.n_embed
    per_layer = buf.reshape(c4.n_layer, 5 * e)
    assert np.all(per_layer[:, 4 * e :] == -1e30)
    assert np.all(per_layer[:, : 4 * e] == 0)


def test_token_range_validation(ctx):
    with pytest.raises(RWKVArgsError):
        ctx.eval(256)
    with pytest.raises(RWKVArgsError):
        ctx.eval_sequence([1, 2, 9999])
    with pytest.raises(RWKVArgsError):
        ctx.eval_sequence([])
    with pytest.raises(RWKVArgsError):
        ctx.eval_sequence_in_chunks([1, 2], chunk_size=0)


def test_system_info():
    s = system_info()
    assert "platform=" in s and "jax=" in s


@pytest.mark.parametrize("mode", ["int8", "w8a8"])
def test_context_on_device_quantize(mode):
    """Context(quantize=...) — serving-time weight quantization of an FP32
    file; logits must track the dense fast path."""
    path = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    dense = Context(path, parity=False)
    quant = Context(path, quantize=mode)
    lg_d, _ = dense.eval_sequence(PROMPT)
    lg_q, _ = quant.eval_sequence(PROMPT)
    corr = np.corrcoef(np.asarray(lg_d), np.asarray(lg_q))[0, 1]
    assert corr > 0.999, (mode, corr)

    with pytest.raises(Exception):
        Context(path, parity=True, quantize=mode)


@pytest.mark.parametrize("model", ["4v0-660K-FP32", "7v0-834K-FP32"])
def test_chunked_matches_serial_other_versions(model):
    """Device-scanned chunked prefill == serial for the v4 (cumsum max-trick)
    and v7 (v_first reset per chunk) architectures."""
    from tests.common import fixture as fx

    c = Context(fx(f"tiny-rwkv-{model}.bin"))
    prompt = list(b'"in the beginning, the world was made of stress')
    lg_serial, st_serial = None, None
    st = None
    for t in prompt:
        lg_serial, st = c.eval(t, st)
    lg_chunk, st_chunk = c.eval_sequence_in_chunks(prompt, 8)
    np.testing.assert_allclose(np.asarray(lg_chunk), np.asarray(lg_serial),
                               atol=5e-4, rtol=5e-4)
    _state_allclose(st, st_chunk)
