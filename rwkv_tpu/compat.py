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

import sys
from typing import Optional

import numpy as np

from rwkv_tpu.runtime.context import Context
from rwkv_tpu.runtime.errors import RWKVError


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


# ---------------------------------------------------------------------------
# rwkv_cpp_shared_library surface (reference python/rwkv_cpp/
# rwkv_cpp_shared_library.py): the reference wraps every exported C function
# in a Python method on RWKVSharedLibrary. Here the "library" is this package,
# so the methods delegate to Context — existing code that drives the
# function-level API keeps working unchanged.
# ---------------------------------------------------------------------------

# reference rwkv_cpp_shared_library.py:8-16
QUANTIZED_FORMAT_NAMES = ("Q4_0", "Q4_1", "Q5_0", "Q5_1", "Q8_0", "Q4_K", "Q5_K")


class RWKVContext:
    """Opaque handle matching the reference's ctypes context wrapper."""

    def __init__(self, ctx: Context):
        self.ptr = ctx  # the reference stores a ctypes pointer in .ptr


class RWKVSharedLibrary:
    """Method-for-method equivalent of the reference's shared-library wrapper
    (rwkv_cpp_shared_library.py:26-373), minus the dlopen: the TPU runtime is
    this package. Failures raise typed RWKV*Error exceptions (the idiomatic
    Python form of the C API's return-false contract), AND the exception's
    bit flags are stashed per context / globally so rwkv_get_last_error
    behaves like the reference's read-and-clear accessor (rwkv.cpp:229-234):
    code ported from error-flag-driven C usage keeps working."""

    def _record(self, ctx, exc: RWKVError):
        """Accumulate the exception's rwkv_error_flags bits like the C
        library's thread-local accumulator (rwkv_error_handling.inc:1-16)."""
        target = ctx if ctx is not None else self
        target.__dict__["last_error"] = target.__dict__.get("last_error", 0) | exc.flags
        if self.rwkv_get_print_errors(ctx):
            print(f"rwkv_tpu: {exc}", file=sys.stderr)

    def rwkv_init_from_file(self, model_file_path: str, thread_count: int = 0,
                            gpu_layer_count: int = 0) -> RWKVContext:
        del thread_count, gpu_layer_count  # XLA threads; TPU is the device
        try:
            return RWKVContext(Context(model_file_path))
        except RWKVError as e:
            self._record(None, e)  # load failures have no context yet (global flag)
            raise

    # --- error accessors (rwkv.h:76-84) ---
    def rwkv_set_print_errors(self, ctx, print_errors: bool) -> None:
        (ctx if ctx is not None else self).__dict__["print_errors"] = bool(print_errors)

    def rwkv_get_print_errors(self, ctx) -> bool:
        return (ctx if ctx is not None else self).__dict__.get("print_errors", True)

    def rwkv_get_last_error(self, ctx) -> int:
        """Read-and-clear, per context or global when ctx is None
        (rwkv.cpp:229-234)."""
        target = ctx if ctx is not None else self
        flags = target.__dict__.get("last_error", 0)
        target.__dict__["last_error"] = 0
        return flags

    def rwkv_clone_context(self, ctx: RWKVContext, thread_count: int = 0) -> RWKVContext:
        del thread_count
        return RWKVContext(ctx.ptr.clone())

    def rwkv_gpu_offload_layers(self, ctx: RWKVContext, layer_count: int) -> bool:
        # everything already runs on the accelerator; mirrors the reference's
        # "returns True if at least one layer was offloaded" contract
        return True

    def _guarded(self, ctx, fn):
        try:
            return fn()
        except RWKVError as e:
            self._record(ctx, e)
            raise

    def _eval_out(self, ctx, logits, state, state_out, logits_out):
        state_buf = np.asarray(ctx.ptr.state_to_buffer(state))
        if state_out is not None:
            np.copyto(np.asarray(state_out), state_buf)
        if logits_out is not None and logits is not None:
            np.copyto(np.asarray(logits_out), np.asarray(logits, dtype=np.float32))
        return True

    def rwkv_eval(self, ctx: RWKVContext, token: int, state_in, state_out, logits_out) -> bool:
        def run():
            st = None if state_in is None else ctx.ptr.state_from_buffer(
                np.asarray(state_in, dtype=np.float32))
            logits, state = ctx.ptr.eval(int(token), st)
            return self._eval_out(ctx, logits, state, state_out, logits_out)
        return self._guarded(ctx, run)

    def rwkv_eval_sequence(self, ctx: RWKVContext, tokens, state_in, state_out, logits_out) -> bool:
        def run():
            st = None if state_in is None else ctx.ptr.state_from_buffer(
                np.asarray(state_in, dtype=np.float32))
            logits, state = ctx.ptr.eval_sequence(list(tokens), st)
            return self._eval_out(ctx, logits, state, state_out, logits_out)
        return self._guarded(ctx, run)

    def rwkv_eval_sequence_in_chunks(self, ctx: RWKVContext, tokens, chunk_size: int,
                                     state_in, state_out, logits_out) -> bool:
        def run():
            st = None if state_in is None else ctx.ptr.state_from_buffer(
                np.asarray(state_in, dtype=np.float32))
            logits, state = ctx.ptr.eval_sequence_in_chunks(list(tokens), chunk_size, st)
            return self._eval_out(ctx, logits, state, state_out, logits_out)
        return self._guarded(ctx, run)

    def rwkv_get_n_vocab(self, ctx: RWKVContext) -> int:
        return ctx.ptr.n_vocab

    def rwkv_get_n_embed(self, ctx: RWKVContext) -> int:
        return ctx.ptr.n_embed

    def rwkv_get_n_layer(self, ctx: RWKVContext) -> int:
        return ctx.ptr.n_layer

    def rwkv_get_state_len(self, ctx: RWKVContext) -> int:
        return ctx.ptr.state_len

    def rwkv_get_logits_len(self, ctx: RWKVContext) -> int:
        return ctx.ptr.logits_len

    def rwkv_init_state(self, ctx: RWKVContext, state) -> None:
        np.copyto(np.asarray(state), np.asarray(ctx.ptr.init_state_buffer()))

    def rwkv_free(self, ctx: RWKVContext) -> None:
        ctx.ptr = None

    def rwkv_quantize_model_file(self, in_path: str, out_path: str, format_name: str) -> bool:
        from rwkv_tpu.formats.quantize import quantize_model_file

        def run():
            quantize_model_file(in_path, out_path, format_name)
            return True
        return self._guarded(None, run)

    def rwkv_get_system_info_string(self) -> str:
        from rwkv_tpu.runtime.context import system_info

        return system_info()


def load_rwkv_shared_library() -> RWKVSharedLibrary:
    """Drop-in for rwkv_cpp_shared_library.load_rwkv_shared_library
    (rwkv_cpp_shared_library.py:375-427): no .so discovery needed — the
    runtime is this package."""
    return RWKVSharedLibrary()
