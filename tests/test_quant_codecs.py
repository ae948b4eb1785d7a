"""Quant codec tests: bit-exactness vs the committed ggml fixtures + roundtrips."""

import numpy as np
import pytest

from rwkv_tpu.formats import container, quant
from tests.common import fixture

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("fmt", quant.QUANT_FORMATS)
def test_roundtrip_monotone(fmt):
    """Quantize -> dequantize -> re-quantize is a fixed point (codec sanity)."""
    x = RNG.standard_normal((8, 128)).astype(np.float32)
    raw = quant.quantize(fmt, x)
    deq = quant.dequantize(fmt, raw, x.shape)
    raw2 = quant.quantize(fmt, deq)
    deq2 = quant.dequantize(fmt, raw2, x.shape)
    # dequantized values reproduce themselves bit-for-bit
    assert np.array_equal(deq, deq2)
    # and are close to the source within the format's step size
    step = {"Q4_0": 1 / 8, "Q4_1": 1 / 15, "Q5_0": 1 / 16, "Q5_1": 1 / 31, "Q8_0": 1 / 127}[fmt]
    amax = np.abs(x).max()
    assert np.max(np.abs(deq - x)) <= amax * step * 1.01


@pytest.mark.parametrize("fmt", quant.QUANT_FORMATS)
def test_block_nbytes(fmt):
    x = RNG.standard_normal((4, 64)).astype(np.float32)
    raw = quant.quantize(fmt, x)
    assert len(raw) == quant.tensor_nbytes(fmt, x.size)


@pytest.mark.parametrize("version", ["4v0-660K", "5v1-730K", "5v2-730K", "7v0-834K"])
@pytest.mark.parametrize("fmt", ["Q5_0", "Q5_1"])
def test_bit_exact_vs_committed_fixtures(version, fmt):
    """Encoder must reproduce ggml_quantize_chunk byte-for-byte: quantizing the
    FP32 fixture must equal the committed Q5 file (the reference pins the
    on-disk format the same way, test_quantization_format_compatibility.c)."""
    _, t32 = container.read_model_file(fixture(f"tiny-rwkv-{version}-FP32.bin"))
    _, tq = container.read_model_file(fixture(f"tiny-rwkv-{version}-{fmt}.bin"))
    n_checked = 0
    for name, rec in tq.items():
        if rec.type_name != fmt:
            continue
        mine = quant.quantize(fmt, t32[name].to_float32())
        assert mine == rec.data, f"{name}: byte mismatch vs committed {fmt} fixture"
        n_checked += 1
    assert n_checked > 0


def test_q5_high_bit_packing():
    """Values that need the 5th bit must survive the qh round-trip."""
    x = np.linspace(-1.0, 1.0, 32, dtype=np.float32).reshape(1, 32)
    for fmt in ("Q5_0", "Q5_1"):
        q, d, m = quant.decode_blocks(fmt, quant.quantize(fmt, x))
        assert q.min() < 8 or fmt == "Q5_1"
        assert len(np.unique(q)) > 16  # 5 bits actually used
