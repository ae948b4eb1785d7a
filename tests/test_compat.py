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


def test_shared_library_function_surface(tmp_path):
    """The function-level shim mirrors the reference's RWKVSharedLibrary
    methods (rwkv_cpp_shared_library.py:26-373)."""
    import numpy as np
    from rwkv_tpu import compat
    from tests.common import PROMPT, fixture

    lib = compat.load_rwkv_shared_library()
    ctx = lib.rwkv_init_from_file(fixture("tiny-rwkv-5v2-730K-FP32.bin"), 2)
    n_vocab = lib.rwkv_get_n_vocab(ctx)
    assert n_vocab == 256
    assert lib.rwkv_get_n_embed(ctx) == 64
    assert lib.rwkv_get_n_layer(ctx) == 12
    assert lib.rwkv_gpu_offload_layers(ctx, 12) is True

    state = np.empty(lib.rwkv_get_state_len(ctx), np.float32)
    logits = np.empty(lib.rwkv_get_logits_len(ctx), np.float32)
    lib.rwkv_init_state(ctx, state)
    assert lib.rwkv_eval_sequence_in_chunks(ctx, PROMPT, 2, state, state, logits)
    logits_chunked = logits.copy()

    lib.rwkv_init_state(ctx, state)
    for tok in PROMPT:
        assert lib.rwkv_eval(ctx, tok, state, state, logits)
    np.testing.assert_allclose(logits, logits_chunked, atol=1e-4, rtol=1e-4)

    clone = lib.rwkv_clone_context(ctx, 2)
    lib.rwkv_free(ctx)
    lib.rwkv_init_state(clone, state)
    assert lib.rwkv_eval_sequence(clone, PROMPT, state, state, logits)
    np.testing.assert_allclose(logits, logits_chunked, atol=1e-4, rtol=1e-4)

    assert "Q5_1" in compat.QUANTIZED_FORMAT_NAMES
    assert isinstance(lib.rwkv_get_system_info_string(), str)

    # quantize through the function surface, reload, still works
    out = str(tmp_path / "q.bin")
    assert lib.rwkv_quantize_model_file(fixture("tiny-rwkv-5v2-730K-FP32.bin"), out, "Q5_1")
    ctx2 = lib.rwkv_init_from_file(out)
    lib.rwkv_init_state(clone, state)
    assert lib.rwkv_eval_sequence(ctx2, PROMPT, state, state, logits)
    assert np.isfinite(logits).all()


def test_shared_library_error_accessors():
    from rwkv_tpu import compat
    from tests.common import fixture

    lib = compat.load_rwkv_shared_library()
    ctx = lib.rwkv_init_from_file(fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    assert lib.rwkv_get_print_errors(ctx) is True
    lib.rwkv_set_print_errors(ctx, False)
    assert lib.rwkv_get_print_errors(ctx) is False
    assert lib.rwkv_get_last_error(ctx) == 0

    # a failing eval both raises the typed exception AND stashes the
    # reference's bit flags on the context (read-and-clear, rwkv.cpp:229-234)
    import pytest
    from rwkv_tpu.runtime import errors as E

    state = np.empty(lib.rwkv_get_state_len(ctx), np.float32)
    logits = np.empty(lib.rwkv_get_logits_len(ctx), np.float32)
    lib.rwkv_init_state(ctx, state)
    with pytest.raises(E.RWKVArgsError):
        lib.rwkv_eval(ctx, 10_000_000, state, state, logits)  # token out of range
    assert lib.rwkv_get_last_error(ctx) == E.ERROR_ARGS
    assert lib.rwkv_get_last_error(ctx) == 0  # cleared by the read

    # load failures land on the global (library-level) flag
    lib.rwkv_set_print_errors(None, False)
    with pytest.raises(E.RWKVError):
        lib.rwkv_init_from_file("/nonexistent/model.bin")
    assert lib.rwkv_get_last_error(None) & E.ERROR_FILE
    assert lib.rwkv_get_last_error(None) == 0
