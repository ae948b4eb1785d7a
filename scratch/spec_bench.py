"""Speculative decoding on-chip A/B: self-speculation (int4+w4a8-head draft
of the same synthetic 1.5B bf16 target) vs plain greedy decode.

Usage: spec_bench.py [B] [k] [target_mode: bf16|int8|lookup]
(lookup = draft-free n-gram speculation; history seeded with the model's
own 64-token greedy prefix, target stays bf16.)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.runtime import generate as G
from rwkv_tpu.runtime import speculative as S

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
k = int(sys.argv[2]) if len(sys.argv) > 2 else 7
tmode = sys.argv[3] if len(sys.argv) > 3 else "bf16"

import os
if os.environ.get("RWKV_SPEC_TINY"):   # CPU smoke of the full flow
    cfg = synth.make_config("7.0", n_vocab=512, n_embed=256, n_layer=2)
else:
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
t0 = time.time()
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", flush=True)

draft = None
if tmode == "int8":
    target = L.quantize_params_device(params, merge_rkv=True)
    jax.block_until_ready(jax.tree.leaves(target))
else:
    target = params
if tmode != "lookup":
    draft = L.quantize_params_device(params, mode="int4", merge_rkv=True,
                                     head="w4a8")
    jax.block_until_ready(jax.tree.leaves(draft))

tok0 = jnp.zeros((B,), jnp.int32)
steps, reps = 64, 3

# plain greedy target baseline
st = G.batched_init_state(cfg, B)
t0 = time.time()
toks, _ = G.greedy_decode(target, cfg, tok0, st, steps=steps)
_ = jax.device_get(toks)
print(f"greedy compile+warm {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(reps):
    toks, _ = G.greedy_decode(target, cfg, tok0, st, steps=steps)
_ = jax.device_get(toks)
dt = (time.time() - t0) / reps
base_tps = B * steps / dt
print(f"plain greedy {tmode}: {base_tps:.1f} tok/s ({1000*dt/steps:.2f} ms/tok)",
      flush=True)

# speculative: rounds sized to emit ~steps tokens per dispatch at high accept
rounds = max(2, steps // (k + 1))
dst = G.batched_init_state(cfg, B)
tst = G.batched_init_state(cfg, B)

if tmode == "lookup":
    # seed the ring buffer with the model's own greedy prefix (the realistic
    # state: generation extends a context the model itself produced)
    hist, hstate = G.greedy_decode(target, cfg, tok0, tst, steps=steps)
    hist = jax.device_get(hist)
    tok1 = jnp.asarray(hist[:, -1])
    history = jnp.asarray(hist[:, :-1])
    hlen = jnp.full((B,), history.shape[1], jnp.int32)
    # greedy_decode's returned state has consumed everything BEFORE the last
    # emitted token — exactly the spec contract (tokens0 = next input).
    t0 = time.time()
    toks, cnts, carry = S.spec_rounds_lookup(target, cfg, tok1, hstate,
                                             history, hlen, k=k, rounds=rounds)
    _ = jax.device_get(cnts)
    print(f"lookup compile+warm {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    tot = 0
    for _ in range(reps):
        toks, cnts, carry = S.spec_rounds_lookup(target, cfg, tok1, hstate,
                                                 history, hlen, k=k,
                                                 rounds=rounds)
        tot += int(jax.device_get(cnts).sum())
    dt = (time.time() - t0) / reps
    spec_tps = tot / reps / dt
    cnts = jax.device_get(cnts)
    accept = (cnts.mean() - 1.0) / k
    print(f"lookup-spec k={k} B={B} target=bf16: {spec_tps:.1f} tok/s "
          f"({tot//reps} tok in {dt:.3f}s/dispatch, {rounds} rounds), "
          f"accept={accept:.2f}, speedup x{spec_tps/base_tps:.2f}", flush=True)
    raise SystemExit(0)

t0 = time.time()
toks, cnts, carry = S.spec_rounds(draft, cfg, target, cfg, tok0, dst, tst,
                                  k=k, rounds=rounds)
_ = jax.device_get(cnts)
print(f"spec compile+warm {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
tot = 0
for _ in range(reps):
    toks, cnts, carry = S.spec_rounds(draft, cfg, target, cfg, tok0, dst, tst,
                                      k=k, rounds=rounds)
    tot += int(jax.device_get(cnts).sum())
dt = (time.time() - t0) / reps
spec_tps = tot / reps / dt
cnts = jax.device_get(cnts)
accept = (cnts.mean() - 1.0) / k
print(f"spec k={k} B={B} draft=int4/w4a8-head target={tmode}: "
      f"{spec_tps:.1f} tok/s ({tot//reps} tok in {dt:.3f}s/dispatch, "
      f"{rounds} rounds), accept={accept:.2f}, speedup x{spec_tps/base_tps:.2f}",
      flush=True)
