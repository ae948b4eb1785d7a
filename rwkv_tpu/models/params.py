"""Model parameter loading: rwkv.cpp .bin file -> config + jax-ready pytree.

Architecture auto-detection follows the reference exactly
(rwkv_model_loading.inc:319-340): presence of `blocks.0.att.ln_x.weight` -> v5,
`blocks.0.att.gate.weight` -> v5.2, `blocks.0.att.time_maa_x` -> v6,
`blocks.0.att.r_k` -> v7. Head count/size derivation: rwkv_model_loading.inc:403-409.

Per-layer tensors are stacked along a leading layer axis so the forward pass can
lax.scan over layers (one XLA while loop instead of n_layer unrolled blocks).

`parity=True` keeps the ggml numeric representations (f16 weights stay f16 and
round activations at matmuls; quantized weights use the integer block-dot path)
so the reference's golden logit oracles apply. `parity=False` is the fast TPU
path (dense f32/bf16, or packed quant for the fused Pallas kernels).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rwkv_tpu.formats import container
from rwkv_tpu.ops import linear as L
from rwkv_tpu.runtime.errors import RWKVParamMissingError, RWKVUnsupportedError


@dataclass(frozen=True)
class ModelConfig:
    version_major: int
    version_minor: int
    n_vocab: int
    n_embed: int
    n_layer: int
    head_count: int
    head_size: int
    data_type: str

    @property
    def version(self) -> str:
        return f"{self.version_major}.{self.version_minor}"

    @property
    def state_vectors_per_layer(self) -> int:
        # reference rwkv.cpp:171-179
        return 5 if self.version_major == 4 else 2 + self.head_size

    @property
    def state_len(self) -> int:
        return self.n_embed * self.state_vectors_per_layer * self.n_layer


def detect_arch(tensors: dict) -> tuple[int, int]:
    major, minor = 4, 0
    if "blocks.0.att.ln_x.weight" in tensors:
        major, minor = (5, 2) if "blocks.0.att.gate.weight" in tensors else (5, 1)
    if "blocks.0.att.time_maa_x" in tensors:
        major, minor = 6, 0
    if "blocks.0.att.r_k" in tensors:
        major, minor = 7, 0
    return major, minor


class _Source:
    """Uniform tensor access over either the pure-Python container reader or
    the native (C++) mmap loader (formats/native_loader.py)."""

    def __init__(self, path: str, native):
        self.nf = None
        if native is None:
            from rwkv_tpu.formats import native_loader

            native = native_loader.available()
        if native:
            from rwkv_tpu.formats import native_loader
            from rwkv_tpu.runtime.errors import RWKVFileError

            try:
                self.nf = native_loader.NativeModelFile(path)
            except RWKVFileError:
                # e.g. K-quant tensors the C++ decoder doesn't handle;
                # the Python reader decodes every supported format
                self.nf = None
        if self.nf is not None:
            self.header = self.nf.header
            self.names = set(self.nf.names)
            self.tensors = None
        else:
            self.header, self.tensors = container.read_model_file(path)
            self.names = set(self.tensors)

    def _rec(self, key):
        rec = self.tensors.get(key)
        if rec is None:
            raise RWKVParamMissingError(f"Model parameter {key} not found")
        return rec

    def _check(self, key):
        if key not in self.names:
            raise RWKVParamMissingError(f"Model parameter {key} not found")

    def shape(self, key):
        if self.nf:
            self._check(key)
            return self.nf.shape(key)
        return self._rec(key).numpy_shape

    def dtype_name(self, key):
        if self.nf:
            self._check(key)
            return self.nf.dtype_name(key)
        return self._rec(key).type_name

    def to_float32(self, key):
        if self.nf:
            self._check(key)
            return self.nf.to_float32(key)
        return self._rec(key).to_float32()

    def to_array(self, key):
        """Storage dtype (fp16 stays fp16)."""
        if self.nf:
            if self.dtype_name(key) == "FP16":
                # fp16->f32 is exact; keep f32 (parity-equivalent for gathers)
                return self.to_float32(key)
            return self.to_float32(key)
        return self._rec(key).to_array()

    def linear(self, key, parity) -> L.Linear:
        ty = self.dtype_name(key)
        if self.nf and not parity and ty not in ("FP32", "FP16"):
            q, d, m = self.nf.to_codes(key)  # row-major (out, in)/(out, nb)
            if L.i4_packable(ty):
                # bitcast serving layout — see linear.bc4_from_value_codes
                return L.bc4_from_value_codes(
                    q.T, d.T, None if m is None else m.T, ty)
            if L.i5_packable(ty):
                from rwkv_tpu.ops import qmm

                bias, hi = L.i5_spec(ty)
                nib, hib = qmm.pack_i5(q.T, bias=bias, hi_bits=hi)
                return L.Linear(
                    q=nib,
                    qh=hib,
                    d=np.ascontiguousarray(d.T),
                    m=None if m is None else np.ascontiguousarray(m.T),
                    kind="q5fast" if hi == 1 else "q6fast",
                    fmt=ty,
                )
            return L.Linear(
                q=np.ascontiguousarray(q.T),
                d=np.ascontiguousarray(d.T),
                m=None if m is None else np.ascontiguousarray(m.T),
                kind="qfast",
                fmt=ty,
            )
        if self.nf and ty in ("FP32", "FP16"):
            w = self.to_float32(key).T
            if not parity:
                w = w.astype(np.dtype(L.fast_dense_dtype(parity)))
            return L.Linear(w=np.ascontiguousarray(w), kind="dense")
        return L.from_record(self._rec(key), parity)


def _vec(src: _Source, key) -> np.ndarray:
    """1-D (or squeezable) f32 vector."""
    return np.ascontiguousarray(src.to_float32(key).reshape(-1))


def _lin(src: _Source, key, parity) -> L.Linear:
    return src.linear(key, parity)


def load_params(path: str, parity: bool = False, native: bool | None = None):
    """Returns (config, params) where params is a pytree of numpy arrays.

    params = {
      'emb': (V, E) storage dtype, 'ln0_w/b', 'ln_out_w/b': (E,),
      'head': Linear (E, V),
      'layers': { per-version keys, every array stacked with leading L }
    }

    native: use the C++ mmap loader when built (default: auto). Parity mode
    always uses the pure-Python reader (it needs the raw block bytes).
    """
    src = _Source(path, native=False if parity else native)
    tensors = src.names
    header = src.header
    major, minor = detect_arch(tensors)
    E, V, n_layer = header.n_embed, header.n_vocab, header.n_layer

    if major == 7:
        H = src.shape("blocks.0.att.r_k")[0]
    elif major >= 5:
        H = src.shape("blocks.0.att.time_decay")[0]
    else:
        H = 0
    S = E // H if H else 0

    cfg = ModelConfig(major, minor, V, E, n_layer, H, S, header.data_type_name)

    params = {
        "emb": src.to_array("emb.weight"),
        "ln0_w": _vec(src, "blocks.0.ln0.weight"),
        "ln0_b": _vec(src, "blocks.0.ln0.bias"),
        "ln_out_w": _vec(src, "ln_out.weight"),
        "ln_out_b": _vec(src, "ln_out.bias"),
        "head": _lin(src, "head.weight", parity),
    }
    if not parity and params["emb"].dtype != np.float32:
        params["emb"] = params["emb"].astype(np.float32)

    per_layer = []
    for i in range(n_layer):
        p = f"blocks.{i}."
        lay = {
            "ln1_w": _vec(src, p + "ln1.weight"),
            "ln1_b": _vec(src, p + "ln1.bias"),
            "ln2_w": _vec(src, p + "ln2.weight"),
            "ln2_b": _vec(src, p + "ln2.bias"),
            "att_k": _lin(src, p + "att.key.weight", parity),
            "att_v": _lin(src, p + "att.value.weight", parity),
            "att_r": _lin(src, p + "att.receptance.weight", parity),
            "att_o": _lin(src, p + "att.output.weight", parity),
            "ffn_k": _lin(src, p + "ffn.key.weight", parity),
            "ffn_v": _lin(src, p + "ffn.value.weight", parity),
        }
        if major == 4:
            lay.update(
                att_mix_k=_vec(src, p + "att.time_mix_k"),
                att_mix_v=_vec(src, p + "att.time_mix_v"),
                att_mix_r=_vec(src, p + "att.time_mix_r"),
                # converter precomputed: time_decay = -exp(td), convert:123-124
                time_first=_vec(src, p + "att.time_first"),
                time_decay=_vec(src, p + "att.time_decay"),
                ffn_mix_k=_vec(src, p + "ffn.time_mix_k"),
                ffn_mix_r=_vec(src, p + "ffn.time_mix_r"),
                ffn_r=_lin(src, p + "ffn.receptance.weight", parity),
            )
        elif major == 5:
            # converter precomputed: decay=exp(-exp(.)), first=exp(.) (v5.1)
            decay = src.to_float32(p + "att.time_decay").reshape(H, -1)
            decay = np.broadcast_to(decay, (H, S)).copy()
            if minor >= 2:
                first = src.to_float32(p + "att.time_faaaa").reshape(H, S)
            else:
                first = src.to_float32(p + "att.time_first").reshape(H, -1)
                first = np.broadcast_to(first, (H, S)).copy()
            lay.update(
                att_mix_k=_vec(src, p + "att.time_mix_k"),
                att_mix_v=_vec(src, p + "att.time_mix_v"),
                att_mix_r=_vec(src, p + "att.time_mix_r"),
                time_decay=decay,
                time_first=first,
                ln_x_w=_vec(src, p + "att.ln_x.weight"),
                ln_x_b=_vec(src, p + "att.ln_x.bias"),
                ffn_mix_k=_vec(src, p + "ffn.time_mix_k"),
                ffn_mix_r=_vec(src, p + "ffn.time_mix_r"),
                ffn_r=_lin(src, p + "ffn.receptance.weight", parity),
            )
            if minor >= 2:
                lay.update(
                    att_mix_g=_vec(src, p + "att.time_mix_g"),
                    att_gate=_lin(src, p + "att.gate.weight", parity),
                )
        elif major == 6:
            # tm_w2 stored (5, E, K) after the converter's transpose(1,2);
            # per-slice logical shape is (K -> E), so transpose back to (5, K, E)
            tm_w2 = src.to_float32(p + "att.time_maa_w2")
            tm_w2 = np.ascontiguousarray(tm_w2.transpose(0, 2, 1))
            lay.update(
                maa_x=_vec(src, p + "att.time_maa_x"),
                maa_w=_vec(src, p + "att.time_maa_w"),
                maa_k=_vec(src, p + "att.time_maa_k"),
                maa_v=_vec(src, p + "att.time_maa_v"),
                maa_r=_vec(src, p + "att.time_maa_r"),
                maa_g=_vec(src, p + "att.time_maa_g"),
                tm_w1=_lin(src, p + "att.time_maa_w1", parity),
                tm_w2=tm_w2,
                decay_base=_vec(src, p + "att.time_decay"),  # raw, (H,S) flat
                decay_w1=_lin(src, p + "att.time_decay_w1", parity),
                decay_w2=_lin(src, p + "att.time_decay_w2", parity),
                time_first=src.to_float32(p + "att.time_faaaa").reshape(H, S),
                att_gate=_lin(src, p + "att.gate.weight", parity),
                ln_x_w=_vec(src, p + "att.ln_x.weight"),
                ln_x_b=_vec(src, p + "att.ln_x.bias"),
                ffn_maa_k=_vec(src, p + "ffn.time_maa_k"),
                ffn_maa_r=_vec(src, p + "ffn.time_maa_r"),
                ffn_r=_lin(src, p + "ffn.receptance.weight", parity),
            )
        elif major == 7:
            lay.update(
                x_rwkvag=np.ascontiguousarray(
                    src.to_float32(p + "att.x_rwkvag").reshape(6, E)
                ),
                w0=_vec(src, p + "att.w0"),
                a0=_vec(src, p + "att.a0"),
                k_k=_vec(src, p + "att.k_k"),
                k_a=_vec(src, p + "att.k_a"),
                r_k=src.to_float32(p + "att.r_k").reshape(H, S),
                w1=_lin(src, p + "att.w1", parity),
                w2=_lin(src, p + "att.w2", parity),
                a1=_lin(src, p + "att.a1", parity),
                a2=_lin(src, p + "att.a2", parity),
                g1=_lin(src, p + "att.g1", parity),
                g2=_lin(src, p + "att.g2", parity),
                ln_x_w=_vec(src, p + "att.ln_x.weight"),
                ln_x_b=_vec(src, p + "att.ln_x.bias"),
                ffn_x_k=_vec(src, p + "ffn.x_k"),
            )
            if i == 0:
                # layer 0 has no v0/v1/v2 (rwkv_model_loading.inc:166-170);
                # stack zeros — forward masks them out via the layer index
                ref_v1 = _lin(src, "blocks.1.att.v1", parity) if n_layer > 1 else None
                ref_v2 = _lin(src, "blocks.1.att.v2", parity) if n_layer > 1 else None

                def zeros_like_lin(lin):
                    if lin is None:
                        return L.Linear(w=np.zeros((E, E), np.float32), kind="dense")
                    import jax

                    return jax.tree.map(np.zeros_like, lin)

                lay.update(
                    v0=np.zeros(E, np.float32),
                    v1=zeros_like_lin(ref_v1),
                    v2=zeros_like_lin(ref_v2),
                )
            else:
                lay.update(
                    v0=_vec(src, p + "att.v0"),
                    v1=_lin(src, p + "att.v1", parity),
                    v2=_lin(src, p + "att.v2", parity),
                )
        else:
            raise RWKVUnsupportedError(f"Unsupported model architecture version {major}")
        per_layer.append(lay)

    # stack along a leading layer axis
    stacked = {}
    for key in per_layer[0]:
        vals = [lay[key] for lay in per_layer]
        if isinstance(vals[0], L.Linear):
            stacked[key] = L.stack(vals)
        else:
            stacked[key] = np.stack(vals)
    params["layers"] = stacked

    return cfg, params
