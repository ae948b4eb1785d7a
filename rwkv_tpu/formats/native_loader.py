"""ctypes binding for the native (C++) model loader / quant codec.

librwkv_native.so mmaps the model file, parses tensor records and does
multithreaded (de)quantization — the TPU-native equivalent of the reference's
C++ IO/loading core (rwkv_file_format.inc / rwkv_model_loading.inc /
rwkv_quantize.inc). The compute graph itself is XLA's job; this is the host
data path.

Falls back gracefully: `available()` is False when the .so hasn't been built
(`make -C native/`), and every caller in the package guards on it.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from rwkv_tpu.formats import container
from rwkv_tpu.runtime.errors import RWKVFileError

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                 "native", "librwkv_native.so"),
    "librwkv_native.so",
]

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        lib.rn_open.restype = ctypes.c_void_p
        lib.rn_open.argtypes = [ctypes.c_char_p]
        lib.rn_close.argtypes = [ctypes.c_void_p]
        lib.rn_last_error.restype = ctypes.c_char_p
        lib.rn_header.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
        lib.rn_tensor_count.restype = ctypes.c_int64
        lib.rn_tensor_count.argtypes = [ctypes.c_void_p]
        lib.rn_tensor_name.restype = ctypes.c_char_p
        lib.rn_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rn_tensor_dtype.restype = ctypes.c_uint32
        lib.rn_tensor_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rn_tensor_dim_count.restype = ctypes.c_uint32
        lib.rn_tensor_dim_count.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rn_tensor_dims.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint32)]
        lib.rn_tensor_elements.restype = ctypes.c_int64
        lib.rn_tensor_elements.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.rn_tensor_f32.restype = ctypes.c_int
        lib.rn_tensor_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.rn_tensor_codes.restype = ctypes.c_int
        lib.rn_tensor_codes.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        lib.rn_quantize.restype = ctypes.c_int64
        lib.rn_quantize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        try:
            lib.rn_group_size.restype = ctypes.c_int
            lib.rn_group_size.argtypes = [ctypes.c_uint32]
        except AttributeError:
            pass  # older .so without K-quant support
        _lib = lib
        return lib
    _lib = False
    return False


def available() -> bool:
    return bool(_load_lib())


class NativeModelFile:
    """mmap'd model file with multithreaded tensor decode."""

    def __init__(self, path: str):
        lib = _load_lib()
        if not lib:
            raise RWKVFileError("librwkv_native.so not available (run `make -C native`)")
        self._lib = lib
        self._h = lib.rn_open(path.encode())
        if not self._h:
            raise RWKVFileError(
                f"{path}: {lib.rn_last_error().decode(errors='replace')}"
            )
        hdr = (ctypes.c_uint32 * 6)()
        lib.rn_header(self._h, hdr)
        self.header = container.RWKVFileHeader(*hdr)
        self.names = []
        self._index = {}
        for i in range(lib.rn_tensor_count(self._h)):
            name = lib.rn_tensor_name(self._h, i).decode()
            self.names.append(name)
            self._index[name] = i

    def close(self):
        if self._h:
            self._lib.rn_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _info(self, name):
        i = self._index[name]
        dims = (ctypes.c_uint32 * 3)()
        self._lib.rn_tensor_dims(self._h, i, dims)
        nd = self._lib.rn_tensor_dim_count(self._h, i)
        shape = tuple(reversed([dims[j] for j in range(nd)]))  # pytorch order
        return i, shape, self._lib.rn_tensor_dtype(self._h, i)

    def dtype_name(self, name: str) -> str:
        _, _, dt = self._info(name)
        return container.TYPE_NAMES[dt]

    def shape(self, name: str) -> tuple:
        _, shape, _ = self._info(name)
        return shape

    def to_float32(self, name: str, threads: int = 0) -> np.ndarray:
        i, shape, _ = self._info(name)
        out = np.empty(shape, dtype=np.float32)
        rc = self._lib.rn_tensor_f32(
            self._h, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), threads
        )
        if rc != 0:
            raise RWKVFileError(self._lib.rn_last_error().decode(errors="replace"))
        return out

    def to_codes(self, name: str, threads: int = 0):
        """Quantized tensor -> (q int8 (out, in), d f32 (out, nb), m|None)
        where nb = in // group (group 32, or 16 for Q2/Q3/Q6_K)."""
        i, shape, dt = self._info(name)
        tname = container.TYPE_NAMES[dt]
        if tname in ("FP32", "FP16"):
            raise RWKVFileError(f"{name} is not quantized")
        out, inn = shape
        group = self._lib.rn_group_size(dt) if hasattr(self._lib, "rn_group_size") else 32
        nb = inn // group
        q = np.empty((out, inn), dtype=np.int8)
        d = np.empty((out, nb), dtype=np.float32)
        with_min = tname in ("Q4_1", "Q5_1", "Q2_K", "Q4_K", "Q5_K")
        m = np.empty((out, nb), dtype=np.float32) if with_min else None
        rc = self._lib.rn_tensor_codes(
            self._h, i,
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if with_min else None,
            threads,
        )
        if rc != 0:
            raise RWKVFileError(self._lib.rn_last_error().decode(errors="replace"))
        return q, d, m


def quantize(fmt: str, x: np.ndarray, threads: int = 0) -> bytes:
    """Native multithreaded encoder; bit-exact with formats/quant.py."""
    lib = _load_lib()
    if not lib:
        raise RWKVFileError("librwkv_native.so not available")
    x = np.ascontiguousarray(x, dtype=np.float32)
    dtype = container.TYPE_INDEX[fmt]
    from rwkv_tpu.formats import quant as qc

    out = np.empty(qc.tensor_nbytes(fmt, x.size), dtype=np.uint8)
    n = lib.rn_quantize(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.size, dtype,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads,
    )
    if n < 0:
        raise RWKVFileError(lib.rn_last_error().decode(errors="replace"))
    return out.tobytes()
