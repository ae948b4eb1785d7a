"""Continuous batching of independent generation streams.

The reference's multi-stream story is rwkv_clone_context — shared weights,
one eval in flight per context (rwkv.h:93-99, SURVEY.md §2.4). The TPU-native
upgrade is slot-based continuous batching: a fixed batch of stream slots
decodes in lockstep under one jit; streams join (prefill into a free slot) and
leave (EOS / budget) without stopping the others. Per-stream recurrent state
is one row of the batched state pytree — O(1) memory per stream, RWKV's
whole point.

Sampling runs ON DEVICE by default (`on_device=True`): per-slot temperature /
top-p / presence+frequency penalties / logit bias are vectorized into one
jitted step (`serve_step`), so the host only receives the sampled token ids —
no per-stream numpy sampling in the hot path (at B=128 the host loop would
dominate). `on_device=False` falls back to host-side utils/sampling.py
per stream (bit-compatible with the reference's sampling.py).

Sharded serving: pass a Mesh (parallel/mesh.make_mesh) — weights are
TP-sharded over heads, the slot batch is DP-sharded, and the jitted step runs
under GSPMD with XLA-inserted collectives. Per-stream results equal the
single-device server (tests/test_serve.py, dryrun_multichip).

Windowed serving (`step_window(n)`): n decode+sample steps in ONE dispatch,
with stop/max bookkeeping applied after the window — measured 3x serving
throughput on the axon-relay chip (608 -> 1833 tok/s, B=32 sampled streams
with penalties) at a join-latency cost of <= n steps. Token-for-token equal
to the per-step path, including sampled (temperature > 0) streams: the
window derives step i's PRNG key as fold_in(base_key, step_no + i), exactly
what per-step serving uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from rwkv_tpu.models import forward as fwd
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
    # deferred-join prefill progress (None once active): [chunk_blocks
    # (n_blocks, NB, C) int32, total_len, next_block, slot_state]
    pending: list | None = None


def device_sample(logits, temps, top_ps, key, top_k: int):
    """Vectorized on-device sampling: per-row temperature + top-p nucleus
    evaluated inside a top-k logit window. Semantics match the host
    reference (utils/sampling.py): the nucleus keeps tokens until the
    cumulative prob exceeds top_p (inclusive), then samples ∝ p^(1/T) over
    the kept set; temperature 0 is argmax. On CPU the window is exact
    top_k, so results match the full-vocab host path whenever the nucleus
    holds < top_k tokens (statistically verified in
    tests/test_serve.py::test_device_sampling_distribution_fidelity). On
    TPU the window comes from jax.lax.approx_max_k: the argmax always
    survives (greedy stays exact) but deep-tail window MEMBERSHIP is
    approximate (recall ~0.95 by default) — users needing host-parity
    sampling on TPU should sample on host from the returned logits."""
    k = min(top_k, logits.shape[-1])
    if jax.default_backend() == "tpu" and k < logits.shape[-1]:
        # exact top_k lowers as a FULL-VOCAB sort on TPU (measured 1.6
        # ms/step at B=32 V=65536 — a third of the whole serving step);
        # approx_max_k is the TPU-native reduction. The true argmax always
        # survives its bin-max reduction (greedy stays exact); only deep
        # tail MEMBERSHIP of the 512-token window is approximate, and the
        # window is itself a truncation heuristic. A k-wide sort restores
        # the descending order the nucleus cumsum needs.
        vals, idx = jax.lax.approx_max_k(logits, k)
        order = jnp.argsort(-vals, axis=-1)
        vals = jnp.take_along_axis(vals, order, axis=-1)
        idx = jnp.take_along_axis(idx, order, axis=-1)
    else:
        vals, idx = jax.lax.top_k(logits, k)  # sorted desc
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_ps[:, None]          # nucleus, inclusive
    logp = jnp.where(keep, vals, -jnp.inf) / jnp.maximum(temps[:, None], 1e-6)
    choice = jax.random.categorical(key, logp, axis=-1)              # (B,)
    sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
    greedy = idx[:, 0]                               # argmax incl. bias/penalty
    return jnp.where(temps > 0, sampled, greedy).astype(jnp.int32)


def _serve_step_core(params, cfg, last_tok, state, counts, active,
                     temps, top_ps, presence, freq, bias, key, top_k):
    logits, new_state = fwd.forward_step(params, cfg, last_tok, state,
                                         layer_major=True)
    logits = logits + bias
    # presence/frequency penalties from the on-device counts
    logits = logits - presence[:, None] * (counts > 0) - freq[:, None] * counts

    tok = device_sample(logits, temps, top_ps, key, top_k)

    B = last_tok.shape[0]
    # (a dense one-hot add instead of this scatter measured NEUTRAL at
    # B=32 V=65536 — the scatter is not a bottleneck)
    counts = counts.at[jnp.arange(B), tok].add(active.astype(jnp.int32))
    # Freeze inactive slots' SMALL state leaves only. The (L, B, H, S, S)
    # heads leaf is ~97% of state bytes and a full where-select costs three
    # extra passes over it per step (measured 1.8 ms/step at B=32, a fifth
    # of the serving step). An inactive slot is a FREE slot: nothing reads
    # its state before the next join overwrites it (slot reuse happens at
    # window boundaries; park() only touches live streams), so its heads
    # may evolve harmlessly. The small leaves (token-shift carries, v4's
    # exp-max accumulators) stay frozen — cheap, and v4's pp grows
    # unboundedly if left running.
    def _sel(n, o):
        if n.ndim >= 4:  # the heads leaf (L, B, H, S, S) / (L, B, S, S)
            return n
        return jnp.where(active.reshape((1, B) + (1,) * (n.ndim - 2)), n, o)

    state = jax.tree.map(_sel, new_state, state)
    return tok, state, counts


@partial(jax.jit, static_argnames=("cfg", "top_k"))
def serve_step(params, cfg, last_tok, state, counts, active,
               temps, top_ps, presence, freq, bias, key, top_k: int = 512):
    """One lockstep decode+sample step for every slot, entirely on device.

    last_tok (B,) int32; state layer-major (L, B, ...); counts (B, V) int32
    per-slot generated-token counts; active (B,) bool; temps/top_ps/presence/
    freq (B,) f32 per-slot sampling configs; bias (B, V) f32 logit bias.
    Returns (tok (B,), new_state, new_counts). Inactive slots keep their
    state and counts frozen and emit a dummy token."""
    return _serve_step_core(params, cfg, last_tok, state, counts, active,
                            temps, top_ps, presence, freq, bias, key, top_k)


def _cast_heads(state, dtype):
    """Cast the (large) wkv heads state leaf, leaving the small f32
    token-shift vectors (and v4's exp-max accumulators) untouched."""
    if "heads" not in state:
        return state
    return dict(state, heads=state["heads"].astype(dtype))


@partial(jax.jit, static_argnames=("cfg", "top_k", "steps", "state_bf16",
                                   "unroll"))
def serve_window(params, cfg, last_tok, state, counts, active,
                 temps, top_ps, presence, freq, bias, key, step0, steps: int,
                 top_k: int = 512, state_bf16: bool = False,
                 unroll: int = 1):
    """`steps` lockstep decode+sample steps in ONE dispatch (lax.scan over
    the serve_step body). Returns (toks (steps, B), state, counts).

    `key` is the server's BASE key and `step0` the global step counter: step
    i uses fold_in(key, step0 + i) — the exact key the per-step path
    (Server._step_device) would use, so sampled streams (any temperature)
    are token-for-token identical to per-step serving.

    state_bf16=True carries the wkv heads state in bf16 BETWEEN the window's
    steps (f32 compute inside each step; the server's state contract stays
    f32 at the window boundary) — the (L, B, H, S, S) state read+write is
    the dominant HBM term at large slot counts (see runtime/generate.py).

    The host applies stop-token / max_new_tokens bookkeeping AFTER the
    window: a stream that stops mid-window keeps decoding to the window end
    and its surplus tokens are discarded — correct because slot reuse only
    happens at window boundaries (a re-joined slot's state and counts are
    overwritten by the prefill). One dispatch per window removes the
    per-step host round trip that dominates small-step serving."""
    def body(carry, k):
        tok, st, cnt = carry
        tok, st, cnt = _serve_step_core(params, cfg, tok, st, cnt, active,
                                        temps, top_ps, presence, freq, bias,
                                        k, top_k)
        return (tok, st, cnt), tok

    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        step0 + jnp.arange(steps, dtype=jnp.int32))
    if state_bf16:
        state = _cast_heads(state, jnp.bfloat16)
    # `unroll` mirrors the raw decode loop's step-window unroll (generate.py,
    # +23% there) but measured only +1.6% here at B=32 (the sampled window's
    # cross-step dependency chain runs through sampling, not just the state)
    # at a 25x compile-time cost — so the default stays 1 (scratch/
    # serve_ab_r5.py, round 5: 4,479 vs 4,550 tok/s, 21 s vs 554 s compile).
    (tok, state, counts), toks = jax.lax.scan(
        body, (last_tok, state, counts), keys,
        unroll=max(1, min(unroll, steps)))
    if state_bf16:
        state = _cast_heads(state, jnp.float32)
    return toks, state, counts


class Server:
    """Slot-based continuous batching over one model."""

    def __init__(self, ctx, max_streams: int = 8, seed: int = 0,
                 on_device: bool = True, mesh=None, top_k: int = 512,
                 join_chunk: int = 64, join_block: int = 4,
                 state_bf16: bool = False):
        """top_k: on-device sampling evaluates the nucleus inside the top-k
        logit window (exact whenever the top-p nucleus holds fewer than k
        tokens — true for any practical top_p; at top_p ~ 1.0 with a high
        temperature the tail beyond k is unreachable on device, unlike the
        full-vocab host path — raise top_k or use on_device=False there).

        join_chunk/join_block: joins prefill through fixed-shape
        (join_block, join_chunk)-token forward_chunks dispatches (the
        reference's chunked-prefill semantics, rwkv_eval.inc:158-221) — one
        XLA compile covers EVERY prompt length, and deferred joins
        (add(..., defer=True)) advance one block per step/step_window call,
        bounding the stall other streams see to one block per window.

        state_bf16: carry the wkv heads state in bf16 between the steps of
        each step_window dispatch (f32 at every window boundary, so joins,
        state export, and the per-step path are unaffected) — a large-batch
        HBM-traffic lever; quality drift is pinned by
        tests/test_forward_step.py's teacher-forced bf16-carry test."""
        self.ctx = ctx
        self.cfg = ctx.cfg
        self.B = max_streams
        self.on_device = on_device
        self.mesh = mesh
        self._params = ctx._params
        if mesh is not None:
            from rwkv_tpu.parallel import shard as SH

            if max_streams % mesh.shape.get("dp", 1):
                raise RWKVArgsError(
                    f"max_streams ({max_streams}) must be divisible by the "
                    f"dp mesh axis ({mesh.shape.get('dp', 1)})"
                )
            self._params = SH.shard_params(mesh, self.cfg, ctx._params)
        # state kept layer-major (L, B, ...) — forward_step consumes that
        # layout directly, avoiding two full-state transposes per decode step
        self._state = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], self.B) + x.shape[1:]).copy(),
            fwd.init_state(self.cfg),
        )
        self._counts = jnp.zeros((self.B, self.cfg.n_vocab), jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from rwkv_tpu.parallel import shard as SH

            self._state = SH.shard_state(mesh, self.cfg, self._state,
                                         batched=True, layer_major=True)
            self._counts = jax.device_put(
                self._counts, NamedSharding(mesh, P("dp", None)))
        self._last_tok = np.zeros(self.B, np.int32)
        self._free = list(range(max_streams))
        self._streams: Dict[int, _Stream] = {}
        self._by_slot: Dict[int, _Stream] = {}
        self._next_sid = 0
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)
        self._step_no = 0
        self._cfg_arrays = None  # rebuilt lazily on stream join/leave
        self._zero_bias = None   # cached (B, V) zeros for bias-free configs
        self.top_k = top_k
        self.join_chunk = join_chunk
        self.join_block = join_block
        self.state_bf16 = state_bf16

    # -- stream lifecycle ---------------------------------------------------

    def add(self, prompt_tokens, config: StreamConfig | None = None,
            defer: bool = False) -> int:
        """Prefill a prompt into a free slot; returns the stream id.

        The prompt runs through fixed-shape chunked-prefill blocks
        (forward_chunks over (join_block, join_chunk) token tiles — the
        reference's rwkv_eval_sequence_in_chunks semantics, device-scanned):
        one compiled graph serves every prompt length, so a join never pays
        a fresh XLA compile for a new length bucket.

        defer=True returns immediately; the prefill then advances ONE block
        per step()/step_window() call, so concurrently decoding streams
        stall at most one block per window (continuous batching with bounded
        join interference). The stream starts emitting once its prefill
        completes."""
        if not self._free:
            raise RWKVArgsError("no free stream slots")
        toks = np.asarray(prompt_tokens, np.int32)
        if toks.size == 0:
            raise RWKVArgsError("Sequence length is 0")
        slot = self._free.pop()
        config = config or StreamConfig()

        C, NB = self.join_chunk, self.join_block
        t = len(toks)
        block_tokens = C * NB
        n_blocks = max(1, -(-t // block_tokens))
        padded = np.zeros(n_blocks * block_tokens, np.int32)
        padded[:t] = toks
        blocks = padded.reshape(n_blocks, NB, C)

        sid = self._next_sid
        self._next_sid += 1
        stream = _Stream(sid=sid, slot=slot, config=config,
                         pending=[blocks, t, 0, fwd.init_state(self.cfg)])
        self._streams[sid] = stream
        self._by_slot[slot] = stream
        self._cfg_arrays = None
        if not defer:
            while stream.pending is not None:
                self._advance_join(stream)
        return sid

    def _advance_join(self, stream: _Stream):
        """Run one fixed-shape prefill block of a pending join; on the final
        block, scatter the stream's state into the batch, seed counts, and
        emit the first token (host-side sampling from the prefill logits —
        once per join, not per step)."""
        blocks, total, i, slot_state = stream.pending
        C, NB = self.join_chunk, self.join_block
        remaining = total - i * NB * C
        last = remaining <= NB * C
        logits, slot_state = fwd.forward_chunks(
            self._params, self.cfg, jnp.asarray(blocks[i]), slot_state,
            jnp.int32(min(remaining, NB * C)), compute_logits=last,
        )
        if not last:
            stream.pending = [blocks, total, i + 1, slot_state]
            return
        stream.pending = None
        slot = stream.slot
        self._state = jax.tree.map(
            lambda b, s: b.at[:, slot].set(s), self._state, slot_state
        )
        self._counts = self._counts.at[slot].set(0)
        self._cfg_arrays = None  # stream becomes active for the decode mask
        self._emit(stream, np.asarray(logits))
        # mirror the first token into the on-device penalty counts so
        # serve_step's presence/frequency penalties see it too
        for tk, n in stream.token_counts.items():
            self._counts = self._counts.at[slot, tk].set(n)

    def _advance_pending(self):
        """One block of progress for every pending join (called before each
        decode step/window)."""
        for stream in list(self._by_slot.values()):
            if stream.pending is not None:
                self._advance_join(stream)

    def _emit(self, stream: _Stream, logits: np.ndarray):
        c = stream.config
        if stream.token_counts and (c.presence_penalty or c.frequency_penalty):
            logits = np.array(logits, copy=True)
            for t, n in stream.token_counts.items():
                logits[t] -= c.presence_penalty + n * c.frequency_penalty
        tok = sample_logits(logits, c.temperature, c.top_p, c.logit_bias, rng=self._rng)
        self._record(stream, tok)

    def _record(self, stream: _Stream, tok: int):
        c = stream.config
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
        self._cfg_arrays = None

    # -- session park/resume --------------------------------------------------

    def park(self, sid: int) -> dict:
        """Suspend an active stream and free its slot: the conversation's
        ENTIRE context is its O(1) recurrent-state row (RWKV's whole point),
        so parking is one device->host state-row copy — no tokens to keep, no
        KV cache to spill. The returned session dict (host numpy, picklable)
        rejoins instantly via resume() with ZERO re-prefill; an idle chat can
        be evicted for an active one and continued later bit-exactly (greedy;
        pinned by tests/test_serve.py).

        The parked stream id stays queryable via result(); resume() returns
        a fresh id that continues the generation (max_new_tokens keeps
        counting the full history)."""
        if sid not in self._streams:
            raise RWKVArgsError(f"unknown stream id {sid}")
        stream = self._streams[sid]
        if stream.done:
            raise RWKVArgsError(f"stream {sid} already finished")
        if stream.pending is not None:
            raise RWKVArgsError(
                f"stream {sid} is still prefilling (deferred join); park "
                f"after the join completes")
        slot = stream.slot
        session = {
            "state": jax.tree.map(lambda x: np.asarray(x[:, slot]), self._state),
            "last_tok": int(self._last_tok[slot]),
            "config": stream.config,
            "generated": list(stream.generated),
            "token_counts": dict(stream.token_counts),
        }
        stream.done = True  # parked: this id no longer generates
        self._free.append(slot)
        del self._by_slot[slot]
        self._cfg_arrays = None
        return session

    def resume(self, session: dict) -> int:
        """Rejoin a parked session into a free slot: one host->device
        state-row write, zero prefill. Returns the new stream id."""
        if not self._free:
            raise RWKVArgsError("no free slot to resume into")
        slot = self._free.pop()
        sid = self._next_sid
        self._next_sid += 1
        stream = _Stream(sid=sid, slot=slot, config=session["config"],
                         generated=list(session["generated"]),
                         token_counts=dict(session["token_counts"]))
        self._state = jax.tree.map(
            lambda b, s: b.at[:, slot].set(jnp.asarray(s)),
            self._state, session["state"],
        )
        row = np.zeros((self.cfg.n_vocab,), np.int32)
        for t, n in stream.token_counts.items():
            row[t] = n
        self._counts = self._counts.at[slot].set(jnp.asarray(row))
        self._last_tok[slot] = session["last_tok"]
        self._streams[sid] = stream
        self._by_slot[slot] = stream
        self._cfg_arrays = None
        return sid

    # -- decode -------------------------------------------------------------

    def _slot_config_arrays(self):
        """(active, temps, top_ps, presence, freq, bias) dense per-slot
        arrays; rebuilt only when streams join/leave. The (B, V) bias matrix
        is only materialized/uploaded when some stream actually configures a
        logit_bias — otherwise a cached device zeros array is reused (at
        B=128 V=65k a fresh upload per join would cost 32 MB)."""
        if self._cfg_arrays is not None:
            return self._cfg_arrays
        B, V = self.B, self.cfg.n_vocab
        active = np.zeros(B, bool)
        temps = np.ones(B, np.float32)
        top_ps = np.ones(B, np.float32)
        presence = np.zeros(B, np.float32)
        freq = np.zeros(B, np.float32)
        any_bias = any(s.config.logit_bias for s in self._by_slot.values()
                       if s.pending is None)
        bias = np.zeros((B, V), np.float32) if any_bias else None
        for s in self._by_slot.values():
            if s.pending is not None:
                continue  # joining: excluded from the decode mask until ready
            c = s.config
            active[s.slot] = True
            temps[s.slot] = c.temperature
            top_ps[s.slot] = c.top_p if c.top_p > 0 else 1.0
            presence[s.slot] = c.presence_penalty
            freq[s.slot] = c.frequency_penalty
            if c.logit_bias:
                for t, b in c.logit_bias.items():
                    bias[s.slot, t] = b
        if bias is None:
            if self._zero_bias is None:
                self._zero_bias = jnp.zeros((B, V), jnp.float32)
            bias_dev = self._zero_bias
        else:
            bias_dev = jnp.asarray(bias)
        self._cfg_arrays = tuple(jnp.asarray(a) for a in
                                 (active, temps, top_ps, presence, freq)) + (bias_dev,)
        return self._cfg_arrays

    def _active(self):
        return [s for s in self._by_slot.values() if s.pending is None]

    def step(self) -> Dict[int, int]:
        """One lockstep decode step for every active stream (deferred joins
        advance one prefill block first). Returns the tokens emitted this
        step keyed by stream id."""
        self._advance_pending()
        if not self._active():
            return {}
        if self.on_device:
            return self._step_device()
        return self._step_host()

    def _step_device(self):
        active, temps, top_ps, presence, freq, bias = self._slot_config_arrays()
        key = jax.random.fold_in(self._key, self._step_no)
        self._step_no += 1
        tok, self._state, self._counts = serve_step(
            self._params, self.cfg, jnp.asarray(self._last_tok), self._state,
            self._counts, active, temps, top_ps, presence, freq, bias, key,
            top_k=self.top_k,
        )
        tok_np = np.asarray(tok)
        out = {}
        for stream in list(self._active()):
            before_done = stream.done
            self._record(stream, int(tok_np[stream.slot]))
            if not before_done:
                out[stream.sid] = stream.generated[-1]
        return out

    def step_window(self, steps: int = 16):
        """Run `steps` lockstep decode steps in ONE device dispatch
        (serve_window) and apply stop/max bookkeeping afterwards. Streams
        cannot join mid-window (join latency <= `steps` decode steps);
        streams that finish mid-window have their surplus tokens discarded.
        Returns {sid: [tokens emitted this window]}. Requires on_device.
        Deferred joins advance one prefill block per window (bounded
        interference) and activate at the next window boundary."""
        self._advance_pending()
        if not self._active():
            return {}
        if not self.on_device:
            raise RWKVArgsError("step_window requires on_device sampling")
        active, temps, top_ps, presence, freq, bias = self._slot_config_arrays()
        step0 = jnp.int32(self._step_no)
        self._step_no += steps
        toks, self._state, self._counts = serve_window(
            self._params, self.cfg, jnp.asarray(self._last_tok), self._state,
            self._counts, active, temps, top_ps, presence, freq, bias,
            self._key, step0, steps=steps, top_k=self.top_k,
            state_bf16=self.state_bf16,
        )
        toks_np = np.asarray(toks)                   # (steps, B)
        out = {}
        for stream in list(self._active()):
            emitted = []
            for t in range(steps):
                if stream.done:
                    break  # surplus tokens beyond the stop are discarded
                tok = int(toks_np[t, stream.slot])
                self._record(stream, tok)
                emitted.append(tok)
            if emitted:
                out[stream.sid] = emitted
        return out

    def _step_host(self):
        logits, new_state = fwd.forward_step(
            self._params, self.cfg, jnp.asarray(self._last_tok), self._state,
            layer_major=True,
        )
        # only active slots advance their state (B is axis 1, layer-major);
        # pending joins keep their slot frozen until their prefill lands
        active = np.zeros(self.B, bool)
        for s in self._by_slot.values():
            if s.pending is None:
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
        for stream in list(self._active()):
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
