"""Reader/writer for the rwkv.cpp model file format.

Layout (reference docs/FILE_FORMAT.md; header struct rwkv_file_format.inc:102-109,
tensor records :152-221):

  file header: 6 x uint32 LE — magic 0x67676d66 ('ggmf'), version (100|101),
               n_vocab, n_embed, n_layer, data_type (rwkv_type enum index)
  tensor record, repeated to EOF:
               dim_count (1..3), key_length, data_type  — 3 x uint32
               size0 [, size1 [, size2]]                — dim_count x uint32
               name                                     — key_length bytes utf-8
               data                                     — row-major, dims are in
                                                          ggml order (size0 is the
                                                          contiguous row length)

numpy mapping: a record with ggml dims (size0, size1, size2) is returned as a
numpy array of shape (size2, size1, size0) — i.e. the original PyTorch shape
(the converter writes dims reversed, convert_pytorch_to_ggml.py:150-155).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from rwkv_tpu.formats import quant
from rwkv_tpu.runtime.errors import (
    RWKVDataTypeError,
    RWKVFileMagicError,
    RWKVFileOpenError,
    RWKVFileReadError,
    RWKVFileVersionError,
    RWKVShapeError,
)


def _open_read(path: str):
    """fopen gate: OS-level failures become the reference's FILE_OPEN error
    flag (rwkv_model_loading.inc:289-297) instead of a bare OSError."""
    try:
        return open(path, "rb")
    except OSError as e:
        raise RWKVFileOpenError(f"{path}: failed to open file ({e})") from e

FILE_MAGIC = 0x67676D66
FILE_VERSION_0 = 100
FILE_VERSION_1 = 101
FILE_VERSION_MIN = FILE_VERSION_0
FILE_VERSION_MAX = FILE_VERSION_1

# rwkv_type enum (rwkv_file_format.inc:5-24). Names marked None were removed
# formats (Q4_1_O/Q4_2/Q4_3) or are load-accepted K-quants we map by name.
TYPE_NAMES = [
    "FP32", "FP16", "Q4_0", "Q4_1", "Q4_1_O", "Q4_2", "Q4_3",
    "Q5_0", "Q5_1", "Q8_0", "Q8_1",
    "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K", "Q8_K",
]
TYPE_INDEX = {n: i for i, n in enumerate(TYPE_NAMES)}
REMOVED_TYPES = {"Q4_1_O", "Q4_2", "Q4_3"}
# formats this framework can decode (legacy 32-block + K-quant super-block;
# Q8_1 is activation-only in ggml and never appears in files)
DECODABLE_TYPES = {
    "FP32", "FP16", "Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0",
    "Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K", "Q8_K",
}
QUANTIZED_TYPES = set(quant.QUANT_FORMATS)
# valid targets for the quantizer (reference: rwkv.h:212-217 lists the legacy
# five; the Python binding adds Q4_K/Q5_K, rwkv_cpp_shared_library.py:8-16;
# we expose every encodable K-quant)
QUANT_TARGETS = tuple(quant.QUANT_FORMATS) + ("Q2_K", "Q3_K", "Q4_K", "Q5_K", "Q6_K")


def type_is_quantized(name: str) -> bool:
    return name not in ("FP32", "FP16")


@dataclass
class RWKVFileHeader:
    magic: int
    version: int
    n_vocab: int
    n_embed: int
    n_layer: int
    data_type: int

    @property
    def data_type_name(self) -> str:
        return TYPE_NAMES[self.data_type]

    def pack(self) -> bytes:
        return struct.pack(
            "<IIIIII", self.magic, self.version, self.n_vocab,
            self.n_embed, self.n_layer, self.data_type,
        )


@dataclass
class RWKVTensorRecord:
    name: str
    dims: tuple  # ggml order: (size0[, size1[, size2]])
    type_name: str
    data: bytes  # raw on-disk bytes

    @property
    def n_elements(self) -> int:
        n = 1
        for d in self.dims:
            n *= d
        return n

    @property
    def numpy_shape(self) -> tuple:
        """PyTorch-order shape (reversed ggml dims)."""
        return tuple(reversed(self.dims))

    def to_float32(self) -> np.ndarray:
        """Decode to a float32 numpy array of numpy_shape."""
        if self.type_name == "FP32":
            return np.frombuffer(self.data, dtype=np.float32).reshape(self.numpy_shape).copy()
        if self.type_name == "FP16":
            return np.frombuffer(self.data, dtype=np.float16).astype(np.float32).reshape(self.numpy_shape)
        return quant.dequantize(self.type_name, self.data, self.numpy_shape)

    def to_array(self) -> np.ndarray:
        """Decode keeping the storage dtype (fp16 stays fp16; quant dequantizes)."""
        if self.type_name == "FP32":
            return np.frombuffer(self.data, dtype=np.float32).reshape(self.numpy_shape).copy()
        if self.type_name == "FP16":
            return np.frombuffer(self.data, dtype=np.float16).reshape(self.numpy_shape).copy()
        return quant.dequantize(self.type_name, self.data, self.numpy_shape)


def _validate_header(header: RWKVFileHeader, path: str) -> None:
    if header.magic != FILE_MAGIC:
        raise RWKVFileMagicError(f"{path}: bad magic 0x{header.magic:08x}")
    if not (FILE_VERSION_MIN <= header.version <= FILE_VERSION_MAX):
        raise RWKVFileVersionError(f"{path}: unsupported file version {header.version}")
    if header.data_type >= len(TYPE_NAMES):
        raise RWKVDataTypeError(f"{path}: data type {header.data_type} out of range")
    name = header.data_type_name
    if name in REMOVED_TYPES:
        raise RWKVDataTypeError(
            f"{path}: models in {name} format cannot be loaded anymore because "
            f"the format was removed; requantize the model"
        )
    if type_is_quantized(name) and header.version != FILE_VERSION_1:
        raise RWKVDataTypeError(
            f"{path}: quantized model in {name} format was created with an old "
            f"version and can not be loaded anymore; requantize the model"
        )


def read_model_header(path: str) -> RWKVFileHeader:
    with _open_read(path) as f:
        raw = f.read(24)
    if len(raw) != 24:
        raise RWKVFileReadError(f"{path}: truncated header")
    header = RWKVFileHeader(*struct.unpack("<IIIIII", raw))
    _validate_header(header, path)
    return header


def _read_tensor_record(f, path: str) -> RWKVTensorRecord | None:
    head = f.read(12)
    if len(head) == 0:
        return None
    if len(head) != 12:
        raise RWKVFileReadError(f"{path}: truncated tensor header")
    dim_count, key_length, data_type = struct.unpack("<III", head)
    if dim_count not in (1, 2, 3):
        raise RWKVShapeError(f"{path}: tensor has invalid shape ({dim_count} dimensions)")
    if data_type >= len(TYPE_NAMES):
        raise RWKVDataTypeError(f"{path}: tensor data type {data_type} out of range")
    type_name = TYPE_NAMES[data_type]
    if type_name in REMOVED_TYPES:
        raise RWKVDataTypeError(f"{path}: tensor data type {type_name} is no longer supported")
    dims = struct.unpack(f"<{dim_count}I", f.read(4 * dim_count))
    name = f.read(key_length).decode("utf-8")
    n_elements = int(np.prod(dims))
    if type_name not in DECODABLE_TYPES:
        raise RWKVDataTypeError(
            f"{path}: parameter {name} uses {type_name}, which this build cannot decode"
        )
    nbytes = quant.tensor_nbytes(type_name, n_elements)
    data = f.read(nbytes)
    if len(data) != nbytes:
        raise RWKVFileReadError(f"{path}: failed to read data of parameter {name}")
    return RWKVTensorRecord(name=name, dims=dims, type_name=type_name, data=data)


def read_model_file(path: str):
    """Read header + all tensor records. Returns (header, dict name->record).

    Mirrors the two-pass reference loader (rwkv_model_loading.inc:288-401) in a
    single streaming pass — there is no backend buffer sizing to pre-compute here;
    device placement happens later via jax.device_put with shardings.
    """
    header = read_model_header(path)
    tensors: dict[str, RWKVTensorRecord] = {}
    with _open_read(path) as f:
        f.seek(24)
        while True:
            rec = _read_tensor_record(f, path)
            if rec is None:
                break
            tensors[rec.name] = rec
    return header, tensors


def iter_tensor_records(path: str):
    """Stream (header, record) pairs without holding the whole file (quantizer path)."""
    header = read_model_header(path)
    with _open_read(path) as f:
        f.seek(24)
        while True:
            rec = _read_tensor_record(f, path)
            if rec is None:
                return
            yield header, rec


def write_tensor_record(f, rec: RWKVTensorRecord) -> None:
    name_b = rec.name.encode("utf-8")
    f.write(struct.pack("<III", len(rec.dims), len(name_b), TYPE_INDEX[rec.type_name]))
    for d in rec.dims:
        f.write(struct.pack("<I", d))
    f.write(name_b)
    f.write(rec.data)


def write_model_file(path: str, header: RWKVFileHeader, records) -> None:
    with open(path, "wb") as f:
        f.write(header.pack())
        for rec in records:
            write_tensor_record(f, rec)


def make_record(name: str, arr: np.ndarray, type_name: str) -> RWKVTensorRecord:
    """Encode a float32/float16 numpy array (PyTorch-order shape) into a record."""
    dims = tuple(reversed(arr.shape))
    if type_name == "FP32":
        data = np.ascontiguousarray(arr, dtype=np.float32).tobytes()
    elif type_name == "FP16":
        data = np.ascontiguousarray(arr, dtype=np.float16).tobytes()
    else:
        data = quant.quantize(type_name, np.ascontiguousarray(arr, dtype=np.float32))
    return RWKVTensorRecord(name=name, dims=dims, type_name=type_name, data=data)
