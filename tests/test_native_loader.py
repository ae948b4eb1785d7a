"""Native (C++) loader/codec vs the pure-Python implementation."""

import numpy as np
import pytest

from rwkv_tpu.formats import container, native_loader, quant
from tests.common import fixture

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="librwkv_native.so not built"
)

RNG = np.random.default_rng(9)


@pytest.mark.parametrize("name", ["tiny-rwkv-5v2-730K-FP32.bin", "tiny-rwkv-7v0-834K-FP16.bin",
                                  "tiny-rwkv-6v0-3m-Q5_0.bin"])
def test_native_dequant_matches_python(name):
    path = fixture(name)
    nf = native_loader.NativeModelFile(path)
    header, tensors = container.read_model_file(path)
    assert nf.header == header
    assert set(nf.names) == set(tensors)
    for tname in list(tensors)[::3] + ["emb.weight"]:
        py = tensors[tname].to_float32()
        nat = nf.to_float32(tname)
        assert nat.shape == py.shape
        np.testing.assert_array_equal(nat, py)
    nf.close()


def test_native_codes_match_python():
    path = fixture("tiny-rwkv-5v2-730K-Q5_1.bin")
    nf = native_loader.NativeModelFile(path)
    _, tensors = container.read_model_file(path)
    for tname, rec in tensors.items():
        if rec.type_name != "Q5_1":
            continue
        q, d, m = quant.decode_blocks(rec.type_name, rec.data)
        out, inn = rec.numpy_shape
        qn, dn, mn = nf.to_codes(tname)
        np.testing.assert_array_equal(qn, q.reshape(out, inn))
        np.testing.assert_array_equal(dn, d.reshape(out, -1))
        np.testing.assert_array_equal(mn, m.reshape(out, -1))
        break
    nf.close()


@pytest.mark.parametrize("fmt", quant.QUANT_FORMATS)
def test_native_quantize_bit_exact(fmt):
    x = RNG.standard_normal((64, 128)).astype(np.float32)
    assert native_loader.quantize(fmt, x) == quant.quantize(fmt, x)


def test_native_quantize_matches_committed_fixture():
    """Native encoder must also reproduce ggml's committed Q5_0 bytes."""
    _, t32 = container.read_model_file(fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    _, tq = container.read_model_file(fixture("tiny-rwkv-5v2-730K-Q5_0.bin"))
    name = "blocks.0.att.key.weight"
    mine = native_loader.quantize("Q5_0", t32[name].to_float32())
    assert mine == tq[name].data


@pytest.mark.parametrize("fmt", ["Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K"])
def test_native_kquant_matches_python(fmt, tmp_path):
    """C++ K-quant decode (dequant + qmm codes) is bit-exact with the Python
    codec on a real quantized model file."""
    from rwkv_tpu.formats.quantize import quantize_model_file

    src = fixture("tiny-rwkv-5v2-730K-FP32.bin")
    out = str(tmp_path / f"{fmt}.bin")
    quantize_model_file(src, out, fmt)
    nf = native_loader.NativeModelFile(out)
    _, tensors = container.read_model_file(out)
    checked_k = False
    for tname in ["blocks.0.ffn.value.weight", "blocks.5.ffn.value.weight", "emb.weight"]:
        rec = tensors[tname]
        np.testing.assert_array_equal(nf.to_float32(tname), rec.to_float32())
        if rec.type_name.endswith("_K"):
            o, inn = rec.numpy_shape
            q, d, m, g = quant.decode_blocks_grouped(rec.type_name, rec.data)
            qn, dn, mn = nf.to_codes(tname)
            np.testing.assert_array_equal(qn, q.reshape(o, inn))
            np.testing.assert_array_equal(dn, d.reshape(o, inn // g))
            if m is not None:
                np.testing.assert_array_equal(mn, m.reshape(o, inn // g))
            checked_k = True
    assert checked_k, "no tensor actually used the K format"
    nf.close()


def test_native_bad_file(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(Exception):
        native_loader.NativeModelFile(str(p))
