"""Streaming file -> file model quantization (reference rwkv_quantize.inc:16-171).

Quantizes only 2-D FP32/FP16 tensors, excluding the embedding, head, and the v7
low-rank/bonus tensors (rwkv_tensor_needs_quant, rwkv_quantize.inc:1-13).
The output header version is forced to 101 (rwkv_quantize.inc:51-53).
Bit-exact with ggml_quantize_chunk (verified against the committed Q5 fixtures).
"""

from __future__ import annotations

import sys

import numpy as np

from rwkv_tpu.formats import container, quant
from rwkv_tpu.runtime.errors import RWKVArgsError, RWKVDataTypeError


def tensor_needs_quant(name: str) -> bool:
    if name in ("emb.weight", "head.weight"):
        return False
    for sub in ("att.v1", "att.v2", "att.g1", "att.g2",
                "att.a1", "att.a2", "att.w1", "att.w2", "att.r_k"):
        if sub in name:
            return False
    return True


# when a K-quant target can't apply to a tensor (row length not divisible by
# the 256-element super-block), fall back to the closest legacy format —
# ggml_quantize_chunk would refuse such tensors outright
K_FALLBACK = {"Q2_K": "Q4_0", "Q3_K": "Q4_0", "Q4_K": "Q4_1", "Q5_K": "Q5_1", "Q6_K": "Q8_0"}


def _target_for(rec, format_name: str) -> str:
    if format_name.endswith("_K"):
        from rwkv_tpu.formats.kquant import QK_K

        if rec.dims[0] % QK_K != 0:
            return K_FALLBACK[format_name]
    return format_name


def quantize_model_file(in_path: str, out_path: str, format_name: str, verbose: bool = False) -> None:
    if format_name not in container.QUANT_TARGETS:
        raise RWKVArgsError(f"Unsupported output data type ({format_name})")

    header = container.read_model_header(in_path)
    if header.data_type_name not in ("FP32", "FP16"):
        raise RWKVDataTypeError(
            f"Unsupported input data type ({header.data_type_name}); needs to be FP32 or FP16"
        )

    out_header = container.RWKVFileHeader(
        magic=header.magic,
        version=container.FILE_VERSION_1,
        n_vocab=header.n_vocab,
        n_embed=header.n_embed,
        n_layer=header.n_layer,
        data_type=container.TYPE_INDEX[format_name],
    )

    orig_total = 0
    new_total = 0
    with open(out_path, "wb") as out_f:
        out_f.write(out_header.pack())
        for _, rec in container.iter_tensor_records(in_path):
            orig_size = len(rec.data)
            if (
                rec.type_name in ("FP32", "FP16")
                and len(rec.dims) == 2
                and tensor_needs_quant(rec.name)
            ):
                f32 = rec.to_float32()
                target = _target_for(rec, format_name)
                if target != format_name:
                    # always loud: the file header still says `format_name`,
                    # but this tensor's record carries `target` (the format is
                    # per-tensor self-describing; see docs/FILE_FORMAT.md)
                    print(
                        f"rwkv_tpu quantize: {rec.name} rows ({rec.dims[0]}) not "
                        f"divisible by 256; writing {target} instead of {format_name}",
                        file=sys.stderr,
                    )
                data = quant.quantize(target, np.ascontiguousarray(f32))
                rec = container.RWKVTensorRecord(
                    name=rec.name, dims=rec.dims, type_name=target, data=data
                )
                if verbose:
                    print(f"{rec.name}: {rec.dims} -> {target} "
                          f"{orig_size/1e6:.2f}MB -> {len(rec.data)/1e6:.2f}MB")
            container.write_tensor_record(out_f, rec)
            orig_total += orig_size
            new_total += len(rec.data)
    if verbose:
        print(f"original size     = {orig_total / 1024 / 1024:8.2f} MB")
        print(f"quantized size    = {new_total / 1024 / 1024:8.2f} MB")
        print(f"compression ratio = {orig_total / new_total:8.2f}")
