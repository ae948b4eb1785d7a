"""Typed exception taxonomy mirroring the reference's rwkv_error_flags
(reference rwkv.h:38-62). The C library accumulates bit flags in a thread-local;
in Python the idiomatic equivalent is an exception hierarchy whose classes carry
the same flag values, so callers can still switch on `err.flags`.
"""

from __future__ import annotations


class RWKVError(Exception):
    """Base error. `flags` mirrors rwkv_error_flags bit values."""

    flags: int = 0


def _err(name: str, flags: int) -> type:
    return type(name, (RWKVError,), {"flags": flags})


# category flags (upper byte)
ERROR_ARGS = 1 << 8
ERROR_FILE = 2 << 8
ERROR_MODEL = 3 << 8
ERROR_MODEL_PARAMS = 4 << 8
ERROR_GRAPH = 5 << 8
ERROR_CTX = 6 << 8

RWKVArgsError = _err("RWKVArgsError", ERROR_ARGS)
RWKVFileError = _err("RWKVFileError", ERROR_FILE)
RWKVModelError = _err("RWKVModelError", ERROR_MODEL)
RWKVModelParamsError = _err("RWKVModelParamsError", ERROR_MODEL_PARAMS)
RWKVGraphError = _err("RWKVGraphError", ERROR_GRAPH)
RWKVCtxError = _err("RWKVCtxError", ERROR_CTX)

# detail flags (lower byte)
RWKVAllocError = _err("RWKVAllocError", 1)
RWKVFileOpenError = _err("RWKVFileOpenError", ERROR_FILE | 2)
RWKVFileStatError = _err("RWKVFileStatError", ERROR_FILE | 3)
RWKVFileReadError = _err("RWKVFileReadError", ERROR_FILE | 4)
RWKVFileWriteError = _err("RWKVFileWriteError", ERROR_FILE | 5)
RWKVFileMagicError = _err("RWKVFileMagicError", ERROR_FILE | 6)
RWKVFileVersionError = _err("RWKVFileVersionError", ERROR_FILE | 7)
RWKVDataTypeError = _err("RWKVDataTypeError", ERROR_FILE | 8)
RWKVUnsupportedError = _err("RWKVUnsupportedError", 9)
RWKVShapeError = _err("RWKVShapeError", 10)
RWKVDimensionError = _err("RWKVDimensionError", 11)
RWKVKeyError = _err("RWKVKeyError", 12)
RWKVDataError = _err("RWKVDataError", 13)
RWKVParamMissingError = _err("RWKVParamMissingError", ERROR_MODEL_PARAMS | 14)
