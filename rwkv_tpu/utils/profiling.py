"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference has no tracing framework — only script-level per-token timing
(measure_pexplexity.py:69-109) and a -pg build flag. The TPU-native
equivalents:

  - `trace(dir)`: jax.profiler context — captures XLA per-kernel timelines
    viewable in TensorBoard/Perfetto (replaces gprof).
  - `TokenRateMeter`: the script-level tokens/s + ms/token reporting contract.
  - `device_barrier(x)`: an *honest* completion barrier. On some transports
    (the axon relay) jax.block_until_ready can return before execution
    finishes; fetching a value cannot.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_barrier(x):
    """Block until `x` is really computed (device_get beats block_until_ready
    on relayed transports); returns the fetched value."""
    return jax.device_get(x)


class TokenRateMeter:
    """Tokens/s and ms/token accounting with the reference scripts' semantics."""

    def __init__(self):
        self.t0 = time.time()
        self.tokens = 0

    def add(self, n: int = 1):
        self.tokens += n

    @property
    def seconds(self) -> float:
        return time.time() - self.t0

    @property
    def tokens_per_s(self) -> float:
        return self.tokens / max(self.seconds, 1e-9)

    @property
    def ms_per_token(self) -> float:
        return 1000.0 * self.seconds / max(self.tokens, 1)

    def report(self) -> str:
        return f"{self.tokens} tokens, {self.tokens_per_s:.1f} tok/s, {self.ms_per_token:.2f} ms/token"
