"""Sequence-length bucketing for the jit cache.

The reference rebuilds its ggml graph whenever the sequence length changes and
caches exactly one graph (rwkv_eval.inc:112-120). Under XLA the analogue would
recompile per length; instead we pad T up to a bucket so a handful of compiled
programs cover every length, and mask padded positions inside the wkv scans.
"""

from __future__ import annotations

# powers of two up to 64 then multiples of 64 (matches the reference's
# recommended chunk range [2..64], rwkv.h:153-155, while staying TPU-friendly)
_SMALL = (1, 2, 4, 8, 16, 32, 64)


def bucket_for(length: int) -> int:
    if length <= 0:
        raise ValueError("sequence length must be positive")
    for b in _SMALL:
        if length <= b:
            return b
    return ((length + 63) // 64) * 64
