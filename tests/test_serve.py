"""Continuous batching: stream isolation, join/leave, greedy equivalence."""

import numpy as np
import pytest

from rwkv_tpu.runtime.context import Context
from rwkv_tpu.runtime.serve import Server, StreamConfig
from tests.common import fixture

GREEDY = StreamConfig(temperature=0.0, top_p=1.0, max_new_tokens=12, stop_token=None)


@pytest.fixture(scope="module")
def ctx():
    return Context(fixture("tiny-rwkv-5v2-730K-FP32.bin"))


def _solo_reference(ctx, prompt, n):
    """Greedy single-stream reference via the plain Context API."""
    logits, state = ctx.eval_sequence(prompt)
    out = []
    for _ in range(n):
        tok = int(np.argmax(np.asarray(logits)))
        out.append(tok)
        logits, state = ctx.eval(tok, state)
    return out


def test_streams_isolated_and_match_solo(ctx):
    """3 concurrent greedy streams must produce exactly what each produces
    alone — batching must not leak state across slots."""
    prompts = [list(b'"in the'), list(b"Once upon"), list(b"The quick brown fox")]
    solo = [_solo_reference(ctx, p, 12) for p in prompts]

    srv = Server(ctx, max_streams=4)
    sids = [srv.add(p, GREEDY) for p in prompts]
    srv.run_until_done()
    for sid, expect in zip(sids, solo):
        assert srv.result(sid) == expect, f"stream {sid} diverged from solo run"


def test_streams_join_mid_flight(ctx):
    """A stream added after others have decoded must still match its solo run."""
    solo_a = _solo_reference(ctx, list(b'"in the'), 12)
    solo_b = _solo_reference(ctx, list(b"Once upon"), 12)

    srv = Server(ctx, max_streams=4)
    sid_a = srv.add(list(b'"in the'), GREEDY)
    for _ in range(5):
        srv.step()
    sid_b = srv.add(list(b"Once upon"), GREEDY)  # joins mid-flight
    srv.run_until_done()
    assert srv.result(sid_a) == solo_a
    assert srv.result(sid_b) == solo_b


def test_slot_reuse_after_finish(ctx):
    srv = Server(ctx, max_streams=2)
    a = srv.add([34, 105], StreamConfig(temperature=0.0, max_new_tokens=3, stop_token=None))
    b = srv.add([66], StreamConfig(temperature=0.0, max_new_tokens=3, stop_token=None))
    with pytest.raises(Exception):
        srv.add([1])  # no free slots
    srv.run_until_done()
    assert srv.is_done(a) and srv.is_done(b)
    c = srv.add([34, 105], StreamConfig(temperature=0.0, max_new_tokens=3, stop_token=None))
    srv.run_until_done()
    assert len(srv.result(c)) == 3
    # same prompt + greedy -> same result as the earlier stream
    assert srv.result(c) == srv.result(a)


def test_stop_token_ends_stream(ctx):
    # bias sampling so token 0 (END_OF_TEXT) is emitted immediately
    cfg = StreamConfig(temperature=0.0, logit_bias={0: 1e9}, max_new_tokens=50, stop_token=0)
    srv = Server(ctx, max_streams=2)
    sid = srv.add([34, 105], cfg)
    assert srv.is_done(sid)
    assert srv.result(sid)[-1] == 0
    assert srv.active_streams == 0


def test_presence_frequency_penalties():
    """A strong presence penalty must prevent greedy repetition loops
    (reference semantics, chat_with_bot.py:245-247)."""
    from rwkv_tpu.runtime.context import Context
    from rwkv_tpu.runtime.serve import Server, StreamConfig
    from tests.common import fixture

    ctx = Context(fixture("tiny-rwkv-5v2-730K-FP32.bin"))
    prompt = list(b'"in the')

    srv = Server(ctx, max_streams=1, seed=0)
    sid = srv.add(prompt, StreamConfig(temperature=0.0, max_new_tokens=30, stop_token=None))
    plain = srv.run_until_done()[sid]

    srv2 = Server(ctx, max_streams=1, seed=0)
    sid2 = srv2.add(prompt, StreamConfig(
        temperature=0.0, max_new_tokens=30, stop_token=None,
        presence_penalty=5.0, frequency_penalty=5.0,
    ))
    penalized = srv2.run_until_done()[sid2]

    assert penalized != plain
    # with a crushing penalty no token can repeat more than a couple times
    counts = {}
    for t in penalized:
        counts[t] = counts.get(t, 0) + 1
    assert max(counts.values()) <= 3, counts


def test_host_and_device_sampling_agree_greedy(ctx):
    """on_device=False (reference-style host sampling) and the on-device
    sampled step must produce identical greedy streams."""
    prompts = [list(b'"in the'), list(b"Once upon")]
    dev = Server(ctx, max_streams=2, on_device=True)
    host = Server(ctx, max_streams=2, on_device=False)
    sids_d = [dev.add(p, GREEDY) for p in prompts]
    sids_h = [host.add(p, GREEDY) for p in prompts]
    dev.run_until_done()
    host.run_until_done()
    for sd, sh in zip(sids_d, sids_h):
        assert dev.result(sd) == host.result(sh)


def test_sampled_stream_valid(ctx):
    """Sampled (temperature>0) streams emit in-vocab tokens and respect
    max_new_tokens; two different seeds diverge."""
    cfg = StreamConfig(temperature=1.0, top_p=0.9, max_new_tokens=20, stop_token=None)
    outs = []
    for seed in (1, 2):
        srv = Server(ctx, max_streams=1, seed=seed)
        sid = srv.add(list(b'"in the'), cfg)
        srv.run_until_done()
        toks = srv.result(sid)
        assert len(toks) == 20
        assert all(0 <= t < ctx.n_vocab for t in toks)
        outs.append(toks)
    assert outs[0] != outs[1]


def test_sharded_server_matches_single_device(ctx):
    """Server over a (dp=2, tp=4) mesh: tp-sharded weights, dp-sharded slots,
    on-device sampling — per-stream results equal the single-device server
    (SURVEY.md §5.8's promised multi-stream upgrade)."""
    import jax
    from rwkv_tpu.parallel import mesh as M

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = M.make_mesh(dp=2, tp=4, devices=jax.devices()[:8])

    prompts = [list(b'"in the'), list(b"Once upon"), list(b"The quick")]
    ref_srv = Server(ctx, max_streams=4)
    ref_sids = [ref_srv.add(p, GREEDY) for p in prompts]
    ref_srv.run_until_done()

    srv = Server(ctx, max_streams=4, mesh=mesh)
    sids = [srv.add(p, GREEDY) for p in prompts]
    # join/leave cycle: let them run, then add a late stream
    for _ in range(4):
        srv.step()
    late = srv.add(list(b"zzz"), GREEDY)
    late_ref = ref_srv.add(list(b"zzz"), GREEDY)
    ref_srv.run_until_done()
    srv.run_until_done()
    for s, r in zip(sids + [late], ref_sids + [late_ref]):
        assert srv.result(s) == ref_srv.result(r), (s, r)


def test_sharded_server_rejects_bad_batch(ctx):
    import jax
    from rwkv_tpu.parallel import mesh as M

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = M.make_mesh(dp=2, tp=4, devices=jax.devices()[:8])
    with pytest.raises(Exception):
        Server(ctx, max_streams=3, mesh=mesh)  # 3 % dp(2) != 0


def test_host_and_device_penalties_agree(ctx):
    """Greedy + crushing penalties must be identical between host and device
    sampling — including the penalty on the FIRST (host-sampled) token,
    which must be mirrored into the on-device counts."""
    cfg = StreamConfig(temperature=0.0, max_new_tokens=24, stop_token=None,
                       presence_penalty=4.0, frequency_penalty=2.0)
    outs = []
    for on_device in (True, False):
        srv = Server(ctx, max_streams=1, seed=0, on_device=on_device)
        sid = srv.add(list(b'"in the'), cfg)
        srv.run_until_done()
        outs.append(srv.result(sid))
    assert outs[0] == outs[1]


def test_server_v4_model():
    """The generic server machinery must handle v4's 5-vector state pytree
    (aa/bb/pp carry the -1e30 max-trick slots) through device sampling."""
    v4 = Context(fixture("tiny-rwkv-4v0-660K-FP32.bin"))
    srv = Server(v4, max_streams=2)
    a = srv.add(list(b'"in the'), GREEDY)
    b = srv.add(list(b"Once"), GREEDY)
    srv.run_until_done()
    assert len(srv.result(a)) == 12 and len(srv.result(b)) == 12
    solo = _solo_reference(v4, list(b'"in the'), 12)
    assert srv.result(a) == solo


@pytest.mark.parametrize("temperature", [0.0, 1.2])
def test_step_window_matches_stepwise(ctx, temperature):
    """Windowed serving (N steps per dispatch) must produce exactly the
    per-step device path's tokens — greedy AND sampled (the window derives
    fold_in(base_key, step_no + i) per step, the per-step path's exact key
    schedule) — including penalties and stop handling."""
    cfg = StreamConfig(temperature=temperature, top_p=0.9, max_new_tokens=14,
                       stop_token=None, presence_penalty=1.0,
                       frequency_penalty=0.5)
    ref = Server(ctx, max_streams=2, seed=0)
    a1 = ref.add(list(b'"in the'), cfg)
    b1 = ref.add(list(b"Once"), cfg)
    ref.run_until_done()

    srv = Server(ctx, max_streams=2, seed=0)
    a2 = srv.add(list(b'"in the'), cfg)
    b2 = srv.add(list(b"Once"), cfg)
    while srv.active_streams:
        srv.step_window(4)
    assert srv.result(a2) == ref.result(a1)
    assert srv.result(b2) == ref.result(b1)


def test_step_window_state_bf16(ctx):
    """Server(state_bf16=True) carries the wkv heads state in bf16 between a
    window's steps (serve.py::serve_window): greedy streams on the trained
    tiny model must match the f32 path over a short horizon (bf16 rounding
    of a near-fresh state cannot flip the argmax — drift over long horizons
    is pinned separately by test_forward_step.py's teacher-forced test), and
    the server's state contract must stay f32 at the window boundary."""
    import jax.numpy as jnp

    cfg = StreamConfig(temperature=0.0, top_p=1.0, max_new_tokens=8,
                       stop_token=None)
    ref = Server(ctx, max_streams=2, seed=0)
    a1 = ref.add(list(b'"in the'), cfg)
    b1 = ref.add(list(b"Once"), cfg)
    while ref.active_streams:
        ref.step_window(4)

    srv = Server(ctx, max_streams=2, seed=0, state_bf16=True)
    a2 = srv.add(list(b'"in the'), cfg)
    b2 = srv.add(list(b"Once"), cfg)
    while srv.active_streams:
        srv.step_window(4)
    assert srv._state["heads"].dtype == jnp.float32
    assert srv.result(a2) == ref.result(a1)
    assert srv.result(b2) == ref.result(b1)


def test_step_window_stop_token_truncates(ctx):
    """A stream stopping mid-window discards its surplus tokens; the slot is
    reusable at the window boundary."""
    cfg = StreamConfig(temperature=0.0, logit_bias={7: 1e9}, max_new_tokens=50,
                       stop_token=7)
    srv = Server(ctx, max_streams=1, seed=0)
    sid = srv.add([34, 105], cfg)
    if not srv.is_done(sid):
        srv.step_window(8)
    assert srv.is_done(sid)
    assert srv.result(sid)[-1] == 7
    assert len(srv.result(sid)) <= 2
    # slot reusable after the window
    sid2 = srv.add([34], StreamConfig(temperature=0.0, max_new_tokens=3, stop_token=None))
    srv.run_until_done()
    assert len(srv.result(sid2)) == 3


def test_deferred_join_matches_sync_join(ctx):
    """add(defer=True) must produce the same greedy tokens as a synchronous
    add once its chunked prefill completes (same forward_chunks blocks)."""
    prompt = (list(b'"in the beginning of the story there was a very long '
                   b'introduction that kept going') * 8)[:600]
    ref = Server(ctx, max_streams=1, seed=0)
    r = ref.add(prompt, GREEDY)
    ref.run_until_done()

    srv = Server(ctx, max_streams=2, seed=0)
    a = srv.add(list(b'"in the'), GREEDY)
    d = srv.add(prompt, GREEDY, defer=True)
    assert srv._streams[d].pending is not None
    # pending stream emits nothing until its prefill blocks complete
    for _ in range(20):
        srv.step()
        if srv._streams[d].done and srv._streams[a].done:
            break
    assert srv.result(d) == ref.result(r)


def test_deferred_join_does_not_disturb_running_streams(ctx):
    """A deferred join must not change the tokens of concurrently decoding
    streams (its slot stays masked out until the prefill lands)."""
    solo = Server(ctx, max_streams=2, seed=0)
    s = solo.add(list(b'"in the'), GREEDY)
    solo.run_until_done()

    srv = Server(ctx, max_streams=2, seed=0)
    a = srv.add(list(b'"in the'), GREEDY)
    srv.step()
    srv.add(list(b"Once upon a time there was") * 10, GREEDY, defer=True)
    while not srv._streams[a].done:
        srv.step()
    assert srv.result(a) == solo.result(s)


def test_park_resume_session(ctx):
    """Park an active conversation (O(1) state row to host), reuse its slot
    for another stream, resume with zero re-prefill — the stitched output
    must equal an uninterrupted solo run, INCLUDING the presence-penalty
    counts carried through the park."""
    cfg = StreamConfig(temperature=0.0, max_new_tokens=16, stop_token=None,
                       presence_penalty=0.7, frequency_penalty=0.3)
    ref = Server(ctx, max_streams=1, seed=0)
    r = ref.add(list(b'"in the'), cfg)
    ref.run_until_done()
    expect = ref.result(r)

    srv = Server(ctx, max_streams=1, seed=0)
    a = srv.add(list(b'"in the'), cfg)
    for _ in range(6):
        srv.step()
    session = srv.park(a)
    assert srv.active_streams == 0 and len(srv._free) == 1
    prefix = srv.result(a)

    b = srv.add(list(b"Once"), StreamConfig(temperature=0.0, max_new_tokens=5,
                                            stop_token=None))
    srv.run_until_done()
    assert len(srv.result(b)) == 5

    a2 = srv.resume(session)
    srv.run_until_done()
    assert srv.result(a2)[: len(prefix)] == prefix
    assert srv.result(a2) == expect  # resumed stream carries full history

    import pytest as _pytest
    with _pytest.raises(Exception):
        srv.park(a)  # parked id cannot be parked again


@pytest.mark.parametrize("temperature,top_p,top_k", [
    (1.0, 0.8, 512),
    (1.5, 0.95, 512),   # high-temp near-full nucleus (the round-2 caveat)
    (0.7, 1.0, 512),    # nucleus disabled entirely
    (1.0, 0.8, 16),     # window much smaller than vocab
])
@pytest.mark.slow
def test_device_sampling_distribution_fidelity(ctx, temperature, top_p, top_k):
    """Statistical fidelity of on-device top-k-windowed nucleus sampling vs
    the host reference's EXACT distribution (utils/sampling.py semantics):
    chi-square over 16k draws on real tiny-model logits. Quantifies the
    'nucleus inside a top-k window' caveat instead of asserting greedy only."""
    import jax
    import jax.numpy as jnp
    from rwkv_tpu.runtime.serve import device_sample
    from rwkv_tpu.utils.sampling import softmax

    logits_np = np.asarray(ctx.eval_sequence(list(b'"in the'))[0])
    V = logits_np.size

    # host EXACT distribution (mirrors sample_probs step for step)
    p = softmax(logits_np)
    if top_p < 1.0:
        sp = np.sort(p)[::-1]
        cutoff = float(sp[np.argmax(np.cumsum(sp) > top_p)])
        p = np.where(p < cutoff, 0.0, p)
    p = np.power(p, 1.0 / temperature)
    host_p = p / p.sum()
    if top_k < V:
        # the caveat being quantified: mass outside the device's top-k window
        order = np.argsort(logits_np)[::-1]
        outside = host_p[order[top_k:]].sum()
        assert outside < 1e-3, f"top-k window clips {outside:.4f} of the mass"

    B, calls = 512, 32
    lg = jnp.asarray(np.tile(logits_np, (B, 1)))
    temps = jnp.full((B,), temperature, jnp.float32)
    tps = jnp.full((B,), top_p, jnp.float32)
    draws = []
    fn = jax.jit(lambda k: device_sample(lg, temps, tps, k, top_k))
    for i in range(calls):
        draws.append(np.asarray(fn(jax.random.PRNGKey(1000 + i))))
    counts = np.bincount(np.concatenate(draws), minlength=V).astype(np.float64)
    N = counts.sum()

    # chi-square over tokens with expected count >= 5, tail pooled
    exp = host_p * N
    big = exp >= 5
    stat = float((((counts[big] - exp[big]) ** 2) / exp[big]).sum())
    tail_exp, tail_obs = exp[~big].sum(), counts[~big].sum()
    dof = int(big.sum()) - 1
    if tail_exp >= 5:
        stat += (tail_obs - tail_exp) ** 2 / tail_exp
        dof += 1
    # ~4-sigma chi-square bound: extremely unlikely under the null,
    # robust against flaky CI while catching any systematic skew
    assert stat < dof + 6 * np.sqrt(2 * dof) + 10, (stat, dof)
