"""Drop-in compat shim vs the reference rwkv_cpp_model usage patterns."""

import numpy as np

from rwkv_tpu.compat import RWKVModel
from tests.common import PROMPT, expected_logits, fixture, logit_diff_sum


def test_reference_usage_pattern():
    """The reference's canonical loop: preallocated buffers, state reuse
    (generate_completions.py / measure_pexplexity.py style)."""
    model = RWKVModel(None, fixture("tiny-rwkv-5v2-730K-FP32.bin"), 2)
    assert model.n_vocab == 256 and model.n_embed == 64 and model.n_layer == 12

    expected = expected_logits("5v2-730K")
    state = None
    logits = None
    for tok in PROMPT:
        logits, state = model.eval(tok, state, state, logits)
    assert abs(logit_diff_sum(logits, expected)) <= 0.001 * 1.05
    assert isinstance(state, np.ndarray) and state.dtype == np.float32

    # chunked prefill entry point
    logits2, state2 = model.eval_sequence_in_chunks(PROMPT, None, None, None, chunk_size=2)
    assert abs(logit_diff_sum(logits2, expected)) <= 0.001 * 1.05
    np.testing.assert_allclose(state2, state, atol=2e-5)
    model.free()


def test_state_buffer_is_reference_layout():
    model = RWKVModel(fixture("tiny-rwkv-4v0-660K-FP32.bin"))
    _, state = model.eval(34)
    # v4 layout: 5 vectors per layer, pp slots initialized at -1e30 then updated
    assert state.shape == (5 * 128 * 4,)
