"""Context: the user-facing inference runtime (API parity with rwkv.h).

A Context owns device-resident model params (shared across clones by
construction — params are immutable jax arrays, so `clone()` is the analogue of
rwkv_clone_context's refcounted weight sharing, rwkv.cpp:123-139) and a jit
cache keyed by (bucketed T, compute_logits).

The recurrent state is externalized exactly like the reference's FP32 buffer
(rwkv.h:106-108): `eval*` take and return state, either as the framework's
native pytree (fast, stays on device) or as a flat numpy buffer that is
byte-compatible with rwkv.cpp's layout (state_to_buffer/state_from_buffer).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.models import params as P
from rwkv_tpu.runtime.buckets import bucket_for
from rwkv_tpu.runtime.errors import RWKVArgsError


def system_info() -> str:
    """TPU-native replacement for rwkv_get_system_info_string (rwkv.cpp:239-258)."""
    dev = jax.devices()[0]
    return (
        f"platform={dev.platform} device={dev.device_kind} "
        f"n_devices={jax.device_count()} jax={jax.__version__}"
    )


class Context:
    def __init__(self, model_path: str, parity: bool | None = None,
                 quantize: str | None = None, _shared=None):
        """quantize: on-device serving quantization of an FP16/FP32 model —
        'int8' (per-32-block scales, fused dequant kernels), 'int4' (packed
        nibbles, per-32-block scales — half the weight traffic of int8),
        'int5' (nibbles + a 5th-bit plane, 0.625 B/elem — the Q5-class
        quality point), 'w8a8' (per-channel scales, native int8 MXU
        matmuls) or 'w4a8' (s4 codes + per-32 scales, grouped integer dots —
        int4's bus bytes with no in-kernel dequant pass). Weights are
        quantized once in HBM after loading; the model file is untouched.
        Implies fast (non-parity) numerics."""
        if _shared is not None:
            self.cfg, self._params, self._jit_cache, self.parity = _shared
        else:
            if quantize is not None and parity:
                raise RWKVArgsError("quantize is incompatible with parity mode")
            if parity is None:
                # parity (ggml-numerics) by default on CPU where the golden
                # tests run; fast mode on accelerators
                parity = jax.default_backend() == "cpu" and quantize is None
            self.parity = parity
            self.cfg, host_params = P.load_params(model_path, parity=parity)
            params = jax.device_put(host_params)
            if quantize is not None:
                from rwkv_tpu.ops.linear import quantize_params_device

                mode = {"int8": "block", "block": "block", "int4": "int4",
                        "int4bc": "int4bc", "int5": "int5", "w8a8": "w8a8",
                        "w4a8": "w4a8", "w4a8g64": "w4a8g64",
                        "w4a8g128": "w4a8g128", "w4a8g256": "w4a8g256",
                        "w4a8bc": "w4a8bc", "w4a8bc256": "w4a8bc256",
                        "w5a8bc": "w5a8bc",
                        "w5a8bc256": "w5a8bc256"}.get(quantize)
                if mode is None:
                    raise RWKVArgsError(f"unknown quantize mode {quantize!r}")
                params = quantize_params_device(params, mode=mode)
            self._params = params
            self._jit_cache = {}
        self.model_path = model_path

    # --- getters (rwkv.h:175-195) ---
    @property
    def n_vocab(self) -> int:
        return self.cfg.n_vocab

    @property
    def n_embed(self) -> int:
        return self.cfg.n_embed

    @property
    def n_layer(self) -> int:
        return self.cfg.n_layer

    @property
    def state_len(self) -> int:
        return self.cfg.state_len

    @property
    def logits_len(self) -> int:
        return self.cfg.n_vocab

    # --- state management (rwkv_init_state, rwkv_eval.inc:224-241) ---
    def init_state(self):
        return fwd.init_state(self.cfg)

    def init_state_buffer(self) -> np.ndarray:
        return np.asarray(fwd.state_to_buffer(self.cfg, self.init_state()))

    def state_to_buffer(self, state) -> np.ndarray:
        return np.asarray(fwd.state_to_buffer(self.cfg, state))

    def state_from_buffer(self, buf) -> dict:
        buf = np.asarray(buf, dtype=np.float32)
        if buf.size != self.state_len:
            raise RWKVArgsError(
                f"state buffer has {buf.size} elements, expected {self.state_len}"
            )
        return jax.tree.map(jnp.asarray, fwd.state_from_buffer(self.cfg, buf))

    # --- cloning (rwkv_clone_context, rwkv.cpp:123-139) ---
    def clone(self) -> "Context":
        return Context(
            self.model_path,
            _shared=(self.cfg, self._params, self._jit_cache, self.parity),
        )

    # --- eval ---
    def _check_tokens(self, tokens):
        arr = np.asarray(tokens, dtype=np.int64)
        if arr.size == 0:
            raise RWKVArgsError("Sequence length is 0")
        bad = (arr < 0) | (arr >= self.cfg.n_vocab)
        if bad.any():
            i = int(np.argmax(bad))
            raise RWKVArgsError(
                f"Token at index {i} ({arr.reshape(-1)[i]}) is out of range "
                f"(0 .. {self.cfg.n_vocab - 1})"
            )
        return arr.astype(np.int32)

    def _run(self, tokens_padded, state, length, compute_logits):
        return fwd.forward(
            self._params,
            self.cfg,
            tokens_padded,
            state,
            jnp.int32(length),
            compute_logits=compute_logits,
        )

    def eval(self, token: int, state=None, compute_logits: bool = True):
        """Serial (RNN) single-token step. Returns (logits, new_state)."""
        toks = self._check_tokens([token])
        if state is None:
            state = self.init_state()
        return self._run(jnp.asarray(toks), state, 1, compute_logits)

    def eval_sequence(self, tokens, state=None, compute_logits: bool = True):
        """Sequence (prefill) mode: logits are for the last token only
        (rwkv_graph.inc:851-854). Returns (logits, new_state)."""
        toks = self._check_tokens(tokens)
        if state is None:
            state = self.init_state()
        t = len(toks)
        bucket = bucket_for(t)
        padded = np.zeros(bucket, dtype=np.int32)
        padded[:t] = toks
        return self._run(jnp.asarray(padded), state, t, compute_logits)

    def eval_sequence_in_chunks(
        self, tokens, chunk_size: int = 16, state=None, compute_logits: bool = True
    ):
        """Chunked prefill (rwkv_eval_sequence_in_chunks, rwkv_eval.inc:158-221):
        logits computed only for the final chunk.

        TPU-native upgrade over the reference's host loop: chunks are scanned
        ON DEVICE (forward_chunks), in power-of-two blocks of chunks so the
        jit cache stays small (one program per block size) with zero padded
        chunks — a T=8k prompt at chunk 16 is <= 9 dispatches instead of 500."""
        toks = self._check_tokens(tokens)
        if chunk_size <= 0:
            raise RWKVArgsError("Chunk size is 0")
        if state is None:
            state = self.init_state()
        n = len(toks)
        n_chunks = (n + chunk_size - 1) // chunk_size
        padded = np.zeros(n_chunks * chunk_size, dtype=np.int32)
        padded[:n] = toks

        logits = None
        off = 0  # in chunks
        while off < n_chunks:
            # largest power-of-two block that still fits
            block = 1 << ((n_chunks - off).bit_length() - 1)
            block_toks = padded[off * chunk_size : (off + block) * chunk_size]
            is_last = off + block >= n_chunks
            logits, state = fwd.forward_chunks(
                self._params,
                self.cfg,
                jnp.asarray(block_toks.reshape(block, chunk_size)),
                state,
                jnp.int32(n - off * chunk_size),
                compute_logits=compute_logits and is_last,
            )
            off += block
        return logits, state


def init_from_file(model_path: str, **kw) -> Context:
    """Parity alias for rwkv_init_from_file (rwkv.cpp:71)."""
    return Context(model_path, **kw)
