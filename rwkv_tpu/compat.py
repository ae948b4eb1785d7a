"""Drop-in compatibility shim for rwkv.cpp's Python API.

Mirrors `rwkv_cpp_model.RWKVModel` (reference python/rwkv_cpp/rwkv_cpp_model.py)
so existing rwkv.cpp users can switch imports and keep their code: the eval
methods take/return numpy FP32 buffers with the reference's state layout, and
the constructor signature tolerates the reference's (library, path, ...) form.

    from rwkv_tpu.compat import RWKVModel
    model = RWKVModel(model_path)            # or RWKVModel(None, model_path)
    logits, state = model.eval(token, state)
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from rwkv_tpu.runtime.context import Context


class RWKVModel:
    def __init__(
        self,
        shared_library_or_path=None,
        model_path: Optional[str] = None,
        thread_count: int = 0,
        gpu_layer_count: int = 0,
        **kwargs,
    ):
        # reference signature: RWKVModel(shared_library, model_path, thread_count, ...)
        # our signature: RWKVModel(model_path)
        if model_path is None:
            model_path = shared_library_or_path
        if not isinstance(model_path, str):
            raise ValueError("model_path must be a string")
        del thread_count, gpu_layer_count  # XLA manages threads; TPU is the device
        self._ctx = Context(model_path, **kwargs)

    @property
    def n_vocab(self) -> int:
        return self._ctx.n_vocab

    @property
    def n_embed(self) -> int:
        return self._ctx.n_embed

    @property
    def n_layer(self) -> int:
        return self._ctx.n_layer

    def _state_in(self, state_in):
        if state_in is None:
            return None
        return self._ctx.state_from_buffer(np.asarray(state_in, dtype=np.float32))

    def _outputs(self, logits, state, state_out, logits_out):
        # returned buffers must be writable: callers pass them back as
        # state_out/logits_out on the next call (the reference's usage pattern)
        state_buf = np.array(self._ctx.state_to_buffer(state), copy=True)
        if state_out is not None:
            out = np.asarray(state_out)
            if out.flags.writeable:
                np.copyto(out, state_buf)
                state_buf = out
        logits_np = None if logits is None else np.array(logits, dtype=np.float32, copy=True)
        if logits_out is not None and logits_np is not None:
            out = np.asarray(logits_out)
            if out.flags.writeable:
                np.copyto(out, logits_np)
                logits_np = out
        return logits_np, state_buf

    def eval(self, token: int, state_in=None, state_out=None, logits_out=None, use_numpy=True):
        logits, state = self._ctx.eval(int(token), self._state_in(state_in))
        return self._outputs(logits, state, state_out, logits_out)

    def eval_sequence(self, tokens, state_in=None, state_out=None, logits_out=None, use_numpy=True):
        logits, state = self._ctx.eval_sequence(list(tokens), self._state_in(state_in))
        return self._outputs(logits, state, state_out, logits_out)

    def eval_sequence_in_chunks(
        self, tokens, state_in=None, state_out=None, logits_out=None,
        chunk_size: int = 16, use_numpy=True,
    ):
        logits, state = self._ctx.eval_sequence_in_chunks(
            list(tokens), chunk_size, self._state_in(state_in)
        )
        return self._outputs(logits, state, state_out, logits_out)

    def free(self):
        self._ctx = None
