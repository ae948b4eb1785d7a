"""WRONG-MATH perf probes for the bc4a8 kernel at 7B decode: monkeypatch
the kernel interior to remove one cost at a time, keeping DMA + dot shape
identical. Outputs are garbage; only the ms/step matters.

Variants:
  full     — production interior (baseline)
  nodeq    — NO astype: two grouped dots of the xt halves against the raw
             bytes bitcast to i8 (same bytes DMA'd, same total MXU
             contraction 2*ITp, zero unpack VPU work)
  noscale  — production astype + dots, but acc += sum(z) without the
             per-group f32 scale multiply (d still DMA'd)
Usage: python scratch/bc4a8_probe2.py VARIANT [1p5|7b] [B]
"""
import sys
import time

import numpy as np

variant = sys.argv[1]
size = sys.argv[2] if len(sys.argv) > 2 else "7b"
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.ops import linear as L
from rwkv_tpu.ops import qmm
from rwkv_tpu.runtime import generate as G


def accum_nodeq(qb, xt, d, acc_ref, *, group):
    it, tt = xt.shape
    ot = qb.shape[-1]
    nb2 = qb.shape[0] // group            # groups per half
    w = pltpu.bitcast(qb, jnp.int8)       # (ITp, OT) raw bytes as s8
    xth = xt.reshape(2, it // 2, tt)
    dn = (((1,), (1,)), ((0,), (0,)))
    z = jax.lax.dot_general(
        xth[0].reshape(nb2, group, tt), w.reshape(nb2, group, ot),
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    z = z + jax.lax.dot_general(
        xth[1].reshape(nb2, group, tt), w.reshape(nb2, group, ot),
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    d2 = d.reshape(2, nb2, ot)
    acc_ref[...] += jnp.sum(z.astype(jnp.float32) * d2[0][:, None, :], axis=0)


def accum_halfdot(qb, xt, d, acc_ref, *, group):
    """Half the MXU contraction (one half-dot), same weight DMA, no astype:
    separates MXU-bound from DMA-bound."""
    it, tt = xt.shape
    ot = qb.shape[-1]
    nb2 = qb.shape[0] // group
    w = pltpu.bitcast(qb, jnp.int8)
    xth = xt.reshape(2, it // 2, tt)
    z = jax.lax.dot_general(
        xth[0].reshape(nb2, group, tt), w.reshape(nb2, group, ot),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    d2 = d.reshape(2, nb2, ot)
    acc_ref[...] += jnp.sum(z.astype(jnp.float32) * d2[0][:, None, :], axis=0)


def accum_noscale(qb, xt, d, acc_ref, *, group):
    it, tt = xt.shape
    ot = qb.shape[-1]
    nb = it // group
    w = pltpu.bitcast(qb, jnp.int4).astype(jnp.int8)
    z = jax.lax.dot_general(
        xt.reshape(nb, group, tt), w.reshape(nb, group, ot),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    acc_ref[...] += jnp.sum(z, axis=0).astype(jnp.float32)


if variant == "nodeq":
    qmm._bc4a8_accum = accum_nodeq
elif variant == "noscale":
    qmm._bc4a8_accum = accum_noscale
elif variant == "halfdot":
    qmm._bc4a8_accum = accum_halfdot

if size == "7b":
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=4096, n_layer=32)
else:
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)

t0 = time.time()
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"),
                                    quantize="w4a8bc")
if size == "7b":
    params = dict(params)
    params["head"] = L.quantize_dense_bc4_device(params["head"])
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", file=sys.stderr)

qmm.apply_tuned_decode_tiles(cfg.n_embed)
jax.clear_caches()

steps = 48
state = G.batched_init_state(cfg, B)
tok0 = jnp.zeros((B,), jnp.int32)
t0 = time.time()
toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                          state_bf16=True)
_ = jax.device_get(toks)
print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)
reps = 3
t0 = time.time()
for _ in range(reps):
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps,
                              state_bf16=True)
_ = jax.device_get(toks)
dt = (time.time() - t0) / reps
print(f"RESULT PROBE={variant} {size} B={B}: {B*steps/dt:.1f} tok/s "
      f"({1000*dt/steps:.3f} ms/step)")
