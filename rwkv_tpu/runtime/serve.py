"""Continuous batching of independent generation streams.

The reference's multi-stream story is rwkv_clone_context — shared weights,
one eval in flight per context (rwkv.h:93-99, SURVEY.md §2.4). The TPU-native
upgrade is slot-based continuous batching: a fixed batch of stream slots
decodes in lockstep under one jit; streams join (prefill into a free slot) and
leave (EOS / budget) without stopping the others. Per-stream recurrent state
is one row of the batched state pytree — O(1) memory per stream, RWKV's
whole point.

Sampling runs host-side per stream (temperature / top-p / logit bias per
request, utils/sampling.py); greedy streams can instead ride the fully
on-device decode loop (runtime/generate.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
from rwkv_tpu.runtime.buckets import bucket_for
from rwkv_tpu.runtime.errors import RWKVArgsError
from rwkv_tpu.utils.sampling import sample_logits


@dataclass
class StreamConfig:
    temperature: float = 1.0
    top_p: float = 0.8
    logit_bias: Optional[dict] = None
    max_new_tokens: int = 256
    stop_token: Optional[int] = 0  # END_OF_TEXT in RWKV vocabularies
    # reference chat semantics (chat_with_bot.py:245-247): each generated
    # token subtracts presence + count*frequency from its future logits
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0


@dataclass
class _Stream:
    sid: int
    slot: int
    config: StreamConfig
    generated: list = field(default_factory=list)
    done: bool = False
    token_counts: dict = field(default_factory=dict)


class Server:
    """Slot-based continuous batching over one model."""

    def __init__(self, ctx, max_streams: int = 8, seed: int = 0):
        self.ctx = ctx
        self.cfg = ctx.cfg
        self.B = max_streams
        # state kept layer-major (L, B, ...) — forward_step consumes that
        # layout directly, avoiding two full-state transposes per decode step
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], self.B) + x.shape[1:]).copy(),
            fwd.init_state(self.cfg),
        )
        self._last_tok = np.zeros(self.B, np.int32)
        self._free = list(range(max_streams))
        self._streams: Dict[int, _Stream] = {}
        self._by_slot: Dict[int, _Stream] = {}
        self._next_sid = 0
        self._rng = np.random.default_rng(seed)

    # -- stream lifecycle ---------------------------------------------------

    def add(self, prompt_tokens, config: StreamConfig | None = None) -> int:
        """Prefill a prompt into a free slot; returns the stream id."""
        if not self._free:
            raise RWKVArgsError("no free stream slots")
        toks = np.asarray(prompt_tokens, np.int32)
        if toks.size == 0:
            raise RWKVArgsError("Sequence length is 0")
        slot = self._free.pop()
        config = config or StreamConfig()

        # per-slot prefill on a fresh state, then scatter into the batch
        slot_state = fwd.init_state(self.cfg)
        t = len(toks)
        bucket = bucket_for(t)
        padded = np.zeros(bucket, np.int32)
        padded[:t] = toks
        logits, slot_state = fwd.forward(
            self.ctx._params, self.cfg, jnp.asarray(padded), slot_state, jnp.int32(t)
        )
        self._state = jax.tree.map(
            lambda b, s: b.at[:, slot].set(s), self._state, slot_state
        )
        sid = self._next_sid
        self._next_sid += 1
        stream = _Stream(sid=sid, slot=slot, config=config)
        self._streams[sid] = stream
        self._by_slot[slot] = stream
        # sample the first generated token from the prefill logits
        self._emit(stream, np.asarray(logits))
        return sid

    def _emit(self, stream: _Stream, logits: np.ndarray):
        c = stream.config
        if stream.token_counts and (c.presence_penalty or c.frequency_penalty):
            logits = np.array(logits, copy=True)
            for t, n in stream.token_counts.items():
                logits[t] -= c.presence_penalty + n * c.frequency_penalty
        tok = sample_logits(logits, c.temperature, c.top_p, c.logit_bias, rng=self._rng)
        stream.token_counts[tok] = stream.token_counts.get(tok, 0) + 1
        stream.generated.append(tok)
        self._last_tok[stream.slot] = tok
        if (c.stop_token is not None and tok == c.stop_token) or len(
            stream.generated
        ) >= c.max_new_tokens:
            self._finish(stream)

    def _finish(self, stream: _Stream):
        stream.done = True
        self._free.append(stream.slot)
        del self._by_slot[stream.slot]

    # -- decode -------------------------------------------------------------

    def step(self) -> Dict[int, int]:
        """One lockstep decode step for every active stream. Returns the
        tokens emitted this step keyed by stream id."""
        if not self._by_slot:
            return {}
        logits, new_state = fwd.forward_step(
            self.ctx._params, self.cfg, jnp.asarray(self._last_tok), self._state,
            layer_major=True,
        )
        # only active slots advance their state (B is axis 1, layer-major)
        active = np.zeros(self.B, bool)
        for s in self._by_slot.values():
            active[s.slot] = True
        mask = jnp.asarray(active)
        self._state = jax.tree.map(
            lambda n, o: jnp.where(
                mask.reshape((1, self.B) + (1,) * (n.ndim - 2)), n, o
            ),
            new_state,
            self._state,
        )
        logits_np = np.asarray(logits)
        out = {}
        for stream in list(self._by_slot.values()):
            before_done = stream.done
            self._emit(stream, logits_np[stream.slot])
            if not before_done:
                out[stream.sid] = stream.generated[-1]
        return out

    def run_until_done(self, max_steps: int = 4096) -> Dict[int, list]:
        for _ in range(max_steps):
            if not self._by_slot:
                break
            self.step()
        return {sid: s.generated for sid, s in self._streams.items()}

    def result(self, sid: int) -> list:
        return self._streams[sid].generated

    def is_done(self, sid: int) -> bool:
        return self._streams[sid].done

    @property
    def active_streams(self) -> int:
        return len(self._by_slot)
