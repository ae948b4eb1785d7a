"""File container tests: header validation, tensor records, write/read roundtrip."""

import struct

import numpy as np
import pytest

from rwkv_tpu.formats import container
from rwkv_tpu.runtime import errors
from tests.common import fixture


def test_read_header():
    h = container.read_model_header(fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    assert h.magic == container.FILE_MAGIC
    assert h.n_vocab == 256 and h.n_embed == 64 and h.n_layer == 12
    assert h.data_type_name == "FP32"


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(struct.pack("<IIIIII", 0xDEADBEEF, 101, 1, 1, 1, 0))
    with pytest.raises(errors.RWKVFileMagicError):
        container.read_model_header(str(p))


def test_bad_version(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(struct.pack("<IIIIII", container.FILE_MAGIC, 99, 1, 1, 1, 0))
    with pytest.raises(errors.RWKVFileVersionError):
        container.read_model_header(str(p))


def test_removed_format_rejected(tmp_path):
    p = tmp_path / "bad.bin"
    q4_1_o = container.TYPE_INDEX["Q4_1_O"]
    p.write_bytes(struct.pack("<IIIIII", container.FILE_MAGIC, 101, 1, 1, 1, q4_1_o))
    with pytest.raises(errors.RWKVDataTypeError):
        container.read_model_header(str(p))


def test_quantized_v100_rejected(tmp_path):
    """Quantized data in a version-100 file must be refused (old quant layout)."""
    p = tmp_path / "bad.bin"
    q5_0 = container.TYPE_INDEX["Q5_0"]
    p.write_bytes(struct.pack("<IIIIII", container.FILE_MAGIC, 100, 1, 1, 1, q5_0))
    with pytest.raises(errors.RWKVDataTypeError):
        container.read_model_header(str(p))


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    header = container.RWKVFileHeader(
        container.FILE_MAGIC, 101, 16, 8, 1, container.TYPE_INDEX["FP32"]
    )
    recs = [
        container.make_record("emb.weight", rng.standard_normal((16, 8)).astype(np.float32), "FP32"),
        container.make_record("blocks.0.ln0.weight", np.ones(8, np.float32), "FP32"),
        container.make_record("w16", rng.standard_normal((8, 32)).astype(np.float32), "FP16"),
        container.make_record("wq", rng.standard_normal((8, 32)).astype(np.float32), "Q5_1"),
    ]
    p = tmp_path / "model.bin"
    container.write_model_file(str(p), header, recs)
    h2, t2 = container.read_model_file(str(p))
    assert h2 == header
    assert set(t2) == {r.name for r in recs}
    for r in recs:
        assert t2[r.name].data == r.data
        assert t2[r.name].dims == r.dims
    # fp16 roundtrip decodes to what was encoded
    assert t2["w16"].to_array().dtype == np.float16


def test_records_match_reference_tensor_sizes():
    """Every record's payload length must equal the format's computed size."""
    _, tensors = container.read_model_file(fixture("tiny-rwkv-7v0-834K-FP16.bin"))
    from rwkv_tpu.formats import quant

    for name, rec in tensors.items():
        assert len(rec.data) == quant.tensor_nbytes(rec.type_name, rec.n_elements), name
