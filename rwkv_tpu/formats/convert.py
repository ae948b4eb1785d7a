"""PyTorch checkpoint (.pth) -> rwkv.cpp-format .bin converter.

Behavior contract from the reference (convert_pytorch_to_ggml.py):
  - arch detection by state-dict key presence (:35-49)
  - v7: att.x_r/w/k/v/a/g concatenated into att.x_rwkvag (:51-66); low-rank
    pairs transposed (:91-98)
  - v6: time_faaaa unsqueezed; time_maa_w1/decay_w* transposed; time_maa_w2
    transposed(1,2); time_decay reshaped (n_head, -1, 1) (:100-108)
  - v5: time_decay = exp(-exp(.)) (+reshape); time_first = exp(.) (:110-121)
  - v4: time_decay = -exp(.) (:123-124)
  - FP16 policy keeps 1-D tensors and listed small tensors FP32 (:126-135)
  - header magic/version/counts; tensor dims written reversed (:68-159)

All tensor math here is numpy; torch is imported only to deserialize .pth.
"""

from __future__ import annotations

import numpy as np

from rwkv_tpu.formats import container

# substrings that stay FP32 even in FP16 output (convert:126-135)
_KEEP_FP32 = (
    ".time_", ".k_k", ".k_a", ".r_k", ".x_rwkvag", ".x_k", ".w0", ".a0", ".v0",
)


def detect_arch_from_state_dict(sd) -> str:
    if "blocks.0.att.k_k" in sd:
        return "v7"
    if "blocks.0.att.time_maa_x" in sd:
        return "v6"
    if "blocks.0.att.gate.weight" in sd:
        return "v5.2"
    if "blocks.0.att.ln_x.weight" in sd:
        return "v5.1"
    return "v4"


def get_layer_count(sd) -> int:
    n = 0
    while f"blocks.{n}.ln1.weight" in sd:
        n += 1
    assert n > 0
    return n


def transform_tensor(key: str, x: np.ndarray, arch: str, n_head: int | None) -> np.ndarray:
    """Converter-side precompute for one tensor (reference convert:85-124)."""
    x = np.asarray(x, dtype=np.float32)
    if ".time_" in key:
        x = np.squeeze(x)
    if arch == "v7":
        if any(s in key for s in (".w1", ".w2", ".a1", ".a2", ".v1", ".v2", ".g1", ".g2")):
            x = x.T
    elif arch == "v6":
        if ".time_faaaa" in key:
            x = x[..., None]
        if ".time_maa_w1" in key or ".time_decay_w" in key:
            x = x.T
        if ".time_maa_w2" in key:
            x = np.transpose(x, (0, 2, 1))
        if ".time_decay" in key and "_w" not in key:
            x = x.reshape(n_head, -1, 1)
    elif arch in ("v5.1", "v5.2"):
        if ".time_decay" in key:
            if arch == "v5.2":
                x = np.exp(-np.exp(x))[..., None]
            else:
                x = np.exp(-np.exp(x)).reshape(-1, 1, 1)
        if ".time_first" in key:
            x = np.exp(x).reshape(-1, 1, 1)
        if ".time_faaaa" in key:
            x = x[..., None]
    else:  # v4
        if ".time_decay" in key:
            x = -np.exp(x)
    return x


def keep_fp32(key: str, x: np.ndarray) -> bool:
    return x.ndim <= 1 or any(s in key for s in _KEEP_FP32)


def convert_state_dict(state_dict: dict, dest_path: str, data_type: str = "FP16") -> None:
    """state_dict: name -> numpy/torch tensor. Writes a .bin model file."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    arch = detect_arch_from_state_dict(sd)
    n_layer = get_layer_count(sd)
    emb = sd["emb.weight"]
    n_vocab, n_embed = emb.shape
    is_fp16 = data_type in ("FP16", "float16")

    if arch == "v7":
        # concat att.x_[r,w,k,v,a,g] -> att.x_rwkvag (convert:51-66)
        merged = {}
        for k in sd:
            if "att.x_" in k:
                layer = int(k.split(".")[1])
                name = f"blocks.{layer}.att.x_rwkvag"
                prev = merged.get(name)
                merged[name] = sd[k] if prev is None else np.concatenate([prev, sd[k]], axis=0)
            else:
                merged[k] = sd[k]
        sd = merged

    n_head = None
    if arch == "v6":
        n_head = sd["blocks.0.att.time_faaaa"].shape[0]

    header = container.RWKVFileHeader(
        magic=container.FILE_MAGIC,
        version=container.FILE_VERSION_1,
        n_vocab=n_vocab,
        n_embed=n_embed,
        n_layer=n_layer,
        data_type=container.TYPE_INDEX["FP16" if is_fp16 else "FP32"],
    )

    with open(dest_path, "wb") as f:
        f.write(header.pack())
        for key, raw in sd.items():
            x = transform_tensor(key, raw, arch, n_head)
            ty = "FP32" if (not is_fp16 or keep_fp32(key, x)) else "FP16"
            container.write_tensor_record(f, container.make_record(key, x, ty))


def convert_pth(src_path: str, dest_path: str, data_type: str = "FP16") -> None:
    import torch

    sd = torch.load(src_path, map_location="cpu", weights_only=True)
    convert_state_dict(sd, dest_path, data_type)


def _to_numpy(v) -> np.ndarray:
    if isinstance(v, np.ndarray):
        return v.astype(np.float32)
    return v.detach().to("cpu").float().numpy()


def rewrite_precision(src_path: str, dest_path: str, data_type: str) -> None:
    """Rewrite an FP32/FP16 .bin model at a different float precision
    (FP32 <-> FP16), preserving the converter's keep-FP32 policy for 1-D and
    listed small tensors (reference convert_pytorch_to_ggml.py:126-135).
    Used by the ppl sweep to produce the FP16 row from an FP32 source."""
    if data_type not in ("FP16", "FP32"):
        raise ValueError(f"rewrite_precision targets FP16/FP32, got {data_type}")
    header = container.read_model_header(src_path)
    if header.data_type_name not in ("FP16", "FP32"):
        raise ValueError("rewrite_precision needs an FP16/FP32 source model")
    out_header = container.RWKVFileHeader(
        magic=header.magic,
        version=header.version,
        n_vocab=header.n_vocab,
        n_embed=header.n_embed,
        n_layer=header.n_layer,
        data_type=container.TYPE_INDEX[data_type],
    )
    with open(dest_path, "wb") as f:
        f.write(out_header.pack())
        for _, rec in container.iter_tensor_records(src_path):
            x = rec.to_float32()
            ty = "FP32" if (data_type == "FP32" or keep_fp32(rec.name, x)) else "FP16"
            container.write_tensor_record(f, container.make_record(rec.name, x, ty))
