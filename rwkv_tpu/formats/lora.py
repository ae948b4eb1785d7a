"""Merge a LoRA checkpoint (.pth, RWKV-LM-LoRA format) into a .bin model file.

Behavior contract from the reference (merge_lora_into_ggml.py): source model
must be FP32/FP16; full-parameter replacements in the LoRA state dict get the
converter-side transforms re-applied; lora_B @ lora_A * (alpha / r) is added
to matching `<name>.weight` parameters; merged tensors keep the source dtype.
"""

from __future__ import annotations

import numpy as np

from rwkv_tpu.formats import container
from rwkv_tpu.formats.convert import transform_tensor, _to_numpy
from rwkv_tpu.runtime.errors import RWKVArgsError, RWKVDataTypeError, RWKVShapeError

_ARCHES = ("v4", "v5.1", "v5.2", "v6.0", "v7.0")


def merge_lora_file(
    src_path: str, arch_version: str, lora_path: str, lora_alpha: int, dest_path: str
) -> None:
    import torch

    lora = {k: _to_numpy(v) for k, v in torch.load(lora_path, map_location="cpu").items()}
    merge_lora(src_path, arch_version, lora, lora_alpha, dest_path)


def merge_lora(
    src_path: str, arch_version: str, lora: dict, lora_alpha: int, dest_path: str
) -> None:
    if arch_version not in _ARCHES:
        raise RWKVArgsError(f"Invalid RWKV architecture version {arch_version}")
    arch = arch_version.replace("v6.0", "v6").replace("v7.0", "v7")

    header = container.read_model_header(src_path)
    if header.data_type_name not in ("FP32", "FP16"):
        raise RWKVDataTypeError("Only FP32 and FP16 models are supported")

    n_head = None
    if arch == "v6" and "blocks.0.att.time_faaaa" in lora:
        n_head = lora["blocks.0.att.time_faaaa"].shape[0]

    with open(dest_path, "wb") as out:
        out.write(header.pack())
        for _, rec in container.iter_tensor_records(src_path):
            param = rec.to_array()  # keeps fp16 storage dtype
            key = rec.name

            if key in lora:
                repl = transform_tensor(key, lora.pop(key), arch, n_head)
                if param.dtype == np.float16:
                    repl = repl.astype(np.float16)
                if repl.shape != param.shape:
                    raise RWKVShapeError(
                        f"Parameter {key} has shape {param.shape} in model file "
                        f"and shape {repl.shape} in LoRA file"
                    )
                param = repl

            base = key.replace(".weight", "")
            for suffix in (".weight", ""):
                a_key = base + ".lora_A" + suffix
                b_key = base + ".lora_B" + suffix
                if a_key in lora:
                    lora_a = lora.pop(a_key)
                    lora_b = lora.pop(b_key)
                    if lora_b.shape[1] != lora_a.shape[0]:
                        raise RWKVShapeError(
                            f"Invalid shape of LoRA matrices for {key}: "
                            f"{lora_a.shape}, {lora_b.shape}"
                        )
                    r = lora_b.shape[1]
                    merged = param.astype(np.float32) + (lora_b @ lora_a) * (lora_alpha / r)
                    param = merged.astype(param.dtype)
                    break

            ty = "FP16" if param.dtype == np.float16 else "FP32"
            container.write_tensor_record(out, container.make_record(key, param, ty))

    for key in lora:
        print(f"WARNING: Unused parameter in LoRA state dict {key}")
