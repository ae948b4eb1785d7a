"""int4 decode experiments, one mode per process. Usage:
  python scratch/exp_i4.py MODE [SIZE] [BATCH]
SIZE: 1p5 (default) | 7b; BATCH default 8.
Env RWKV_EXP_SBF16=1 carries the wkv heads state in bf16 between decode
steps (state_bf16=True — the large-batch state-traffic lever).
Modes:
  micro       — correctness of s4 kernel + i16 unpack on chip (fast)
  base        — int4 decode, current defaults (merged rkv like bench.py)
  nomerge     — int4 decode without merged rkv
  i16         — base with I4_UNPACK=i16
  s4          — q4fast converted to native-s4 Linears (merged)
  w8a8head    — base + w8a8-quantized head (no dequant pass, half traffic)
  w4a8head    — base + w4a8 grouped-integer-dot head (quarter traffic)
  w4a8g       — w4a8 grouped integer-dot blocks, unmerged
  w4a8gm      — w4a8 grouped integer-dot blocks, merged rkv
  w4a8best    — w4a8 merged blocks + w4a8 head (candidate speed-of-light)
  int8        — int8 qfast baseline (merged)
"""
import sys, time
import numpy as np

mode = sys.argv[1]
size = sys.argv[2] if len(sys.argv) > 2 else "1p5"
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rwkv_tpu.ops import qmm
from rwkv_tpu.ops import linear as L

if mode == "micro":
    IN, OUT, T = 1024, 512, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, IN)).astype(np.float32)
    codes = rng.integers(0, 16, size=(2, IN, OUT), dtype=np.int8)  # L=2
    d = (rng.standard_normal((2, IN // 32, OUT)).astype(np.float32) * 0.01)
    packed = qmm.pack_i4(codes)   # (2, IN/2, OUT)
    ref = qmm.qmm_i4_reference(x, packed[1], d[1], bias=8)
    ref = np.asarray(jax.device_get(ref))

    qmm.I4_UNPACK = "i16"
    try:
        y = jax.device_get(qmm.qmm_i4_stacked(x, jnp.asarray(packed), jnp.asarray(d), None, 1))
        print("i16 unpack: max|diff| =", np.abs(y - ref).max())
    except Exception as e:
        print("i16 unpack FAILED:", type(e).__name__, str(e)[-300:])
    qmm.I4_UNPACK = "i32"

    s4 = jnp.asarray(codes.astype(np.int32) - 8, dtype=jnp.int4)
    try:
        y = jax.device_get(qmm.qmm_s4_stacked(x, s4, jnp.asarray(d), 1))
        print("s4 kernel: max|diff| =", np.abs(y - ref).max())
    except Exception as e:
        print("s4 kernel FAILED:", type(e).__name__, str(e)[-300:])
    sys.exit(0)

if mode == "micro4w":
    # validates the w4a8 grouped integer-dot kernels lower under Mosaic:
    # s8 x s4 batched dots (contraction over the group dim), int32 partial
    # sums, per-block rescale — single, stacked and multi variants
    IN, OUT, T, N = 1024, 512, 8, 3
    rng = np.random.default_rng(0)
    codes = rng.integers(-8, 8, size=(2, IN, N * OUT)).astype(np.int8)
    d = (rng.standard_normal((2, IN // 32, N * OUT)).astype(np.float32) * 0.01)
    packed = jnp.asarray(qmm.pack_i4(codes, bias=8))  # (2, IN/2, N*OUT) uint8
    dj = jnp.asarray(d)
    xs = rng.standard_normal((N, T, IN)).astype(np.float32)
    refs = [np.asarray(jax.device_get(
        qmm.qmm_w4a8_reference(xs[i], packed[1], dj[1])))
        for i in range(N)]
    try:
        xt, da = qmm.quantize_acts_s8(jnp.asarray(xs[0]))
        y = np.asarray(jax.device_get(
            qmm.qmm_w4a8_stacked(xt, packed, dj, 1))) * np.asarray(jax.device_get(da))
        print("w4a8 stacked: max|diff| =", np.abs(y - refs[0]).max())
    except Exception as e:
        print("w4a8 stacked FAILED:", type(e).__name__, str(e)[-300:])
    try:
        qa = [qmm.quantize_acts_s8(jnp.asarray(xs[i])) for i in range(N)]
        y = np.asarray(jax.device_get(qmm.qmm_w4a8_stacked_multi(
            jnp.stack([t_ for t_, _ in qa]), packed, dj, 1, N)))
        err = max(np.abs(y[:, i * (N * OUT) // N:(i + 1) * (N * OUT) // N]
                         * np.asarray(jax.device_get(qa[i][1]))
                         - refs[i][:, i * (N * OUT) // N:(i + 1) * (N * OUT) // N]).max()
                  for i in range(N))
        print("w4a8 multi: max|diff| =", err)
    except Exception as e:
        print("w4a8 multi FAILED:", type(e).__name__, str(e)[-300:])
    sys.exit(0)

if mode == "micro5":
    # validates the packed 5-bit kernel's iota-shift high-bit expansion
    # lowers under Mosaic (the one untested primitive in the q5fast path)
    IN, OUT, T = 1024, 512, 8
    rng = np.random.default_rng(0)
    x = rng.standard_normal((T, IN)).astype(np.float32)
    codes5 = rng.integers(0, 32, size=(2, IN, OUT)).astype(np.int16)
    d = (rng.standard_normal((2, IN // 32, OUT)).astype(np.float32) * 0.01)
    nib, hib = qmm.pack_i5(codes5, bias=0, hi_bits=1)
    ref = np.asarray(jax.device_get(
        qmm.qmm_i5_reference(x, jnp.asarray(nib[1]), jnp.asarray(hib[1]),
                             jnp.asarray(d[1]), bias=16)))
    for name, fn in (
        ("qmm_i5", lambda: qmm.qmm_i5(x, jnp.asarray(nib[1]), jnp.asarray(hib[1]),
                                      jnp.asarray(d[1]), bias=16)),
        ("qmm_i5_stacked", lambda: qmm.qmm_i5_stacked(
            x, jnp.asarray(nib), jnp.asarray(hib), jnp.asarray(d), None, 1, bias=16)),
    ):
        try:
            y = np.asarray(jax.device_get(fn()))
            print(f"{name}: max|diff| =", np.abs(y - ref).max())
        except Exception as e:
            print(f"{name} FAILED:", type(e).__name__, str(e)[-300:])
    sys.exit(0)

from rwkv_tpu.models import synth
from rwkv_tpu.runtime import generate as G

if size == "7b":
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=4096, n_layer=32)
else:
    cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)

t0 = time.time()
quant = {"int8": "int8", "int5": "int5", "w4a8g": "w4a8",
         "w4a8best": "w4a8", "w4a8g64": "w4a8g64", "w4a8g128": "w4a8g128",
         "w4a8g256": "w4a8g256", "bc4": "int4bc", "w4a8bc": "w4a8bc",
         "w4a8bc256": "w4a8bc256", "w4a8bcha": "w4a8bc"}.get(
             "w4a8bcha" if mode == "w4a8bcha" else mode.rstrip("mh"), "int4")
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"), quantize=quant)
jax.block_until_ready(jax.tree.leaves(params))
print(f"params built {time.time()-t0:.1f}s", file=sys.stderr)


def merge_rkv(params):
    layers = dict(params["layers"])
    names = ["att_r", "att_k", "att_v"]
    if isinstance(layers.get("att_gate"), L.Linear):
        names.append("att_gate")
    parts = [layers[k] for k in names]
    key = "att_rkvg" if len(names) == 4 else "att_rkv"
    layers[key] = L.merge_qfast(parts)
    for k in names:
        del layers[k]
    out = dict(params)
    out["layers"] = layers
    return out


if mode == "i16":
    qmm.I4_UNPACK = "i16"
if mode not in ("nomerge", "w4a8g", "int5"):
    # "int5" = unmerged per-projection kernels; "int5m" = fused-rkv merge
    # through qmm_i5_stacked_multi; likewise w4a8g vs w4a8gm
    params = merge_rkv(params)
if mode in ("w8a8head", "w4a8head", "w4a8best"):
    params = dict(params)
    qh = {"w8a8head": L.quantize_dense_w8a8_device,
          "w4a8head": L.quantize_dense_w4a8_device,
          "w4a8best": L.quantize_dense_w4a8_device}[mode]
    params["head"] = qh(params["head"])
if mode in ("bc4h", "w4a8bch"):
    params = dict(params)
    params["head"] = L.quantize_dense_bc4_device(params["head"])
if mode == "w4a8bcha":  # w4a8bc blocks + grouped-int (bc4a8) head
    params = dict(params)
    params["head"] = L.quantize_dense_bc4a8_device(params["head"])
if mode.startswith("w4a8g") and mode.endswith("h"):
    # w4a8gNh: coarse-group blocks + same-mode head
    import functools
    g = int(mode[5:-1])
    params = dict(params)
    params["head"] = L.quantize_dense_w4a8_device(params["head"], group=g)
if mode == "s4":
    @jax.jit
    def to_s4(qp):
        return (qmm.unpack_i4(qp) - 8).astype(jnp.int4)
    layers = dict(params["layers"])
    for k, v in list(layers.items()):
        if isinstance(v, L.Linear) and v.kind == "q4fast":
            layers[k] = L.Linear(q=to_s4(v.q), d=v.d, m=None, kind="s4fast", fmt="INT4")
    params = dict(params); params["layers"] = layers
jax.block_until_ready(jax.tree.leaves(params))

import os
B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
sbf16 = os.environ.get("RWKV_EXP_SBF16") == "1"
if os.environ.get("RWKV_EXP_MINBH"):
    from rwkv_tpu.models import forward as fwd_mod
    fwd_mod.STEP_KERNEL_MIN_BH = int(os.environ["RWKV_EXP_MINBH"])
    print(f"STEP_KERNEL_MIN_BH = {fwd_mod.STEP_KERNEL_MIN_BH}", file=sys.stderr)
if os.environ.get("RWKV_EXP_HB"):
    from rwkv_tpu.ops import pallas_wkv
    hb = int(os.environ["RWKV_EXP_HB"])
    pallas_wkv.wkv7_step_batched.__defaults__ = (hb,)
    pallas_wkv.wkv56_step_batched.__defaults__ = (hb,)
    print(f"step-kernel head_block = {hb}", file=sys.stderr)
if os.environ.get("RWKV_EXP_TILES"):
    ot, it = map(int, os.environ["RWKV_EXP_TILES"].split(","))
    qmm.DECODE_TILES_I4 = (ot, it)
    print(f"DECODE_TILES_I4 = {(ot, it)}", file=sys.stderr)
steps, reps = 64, 3
state = G.batched_init_state(cfg, B)
tok0 = jnp.zeros((B,), jnp.int32)
t0 = time.time()
toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps, state_bf16=sbf16)
_ = jax.device_get(toks)
print(f"compile+warmup {time.time()-t0:.1f}s", file=sys.stderr)
t0 = time.time()
for _ in range(reps):
    toks, _ = G.greedy_decode(params, cfg, tok0, state, steps=steps, state_bf16=sbf16)
_ = jax.device_get(toks)
dt = (time.time() - t0) / reps
tag = f"{mode}{'+sbf16' if sbf16 else ''}"
print(f"RESULT {tag} {size} B={B}: {B*steps/dt:.1f} tok/s ({1000*dt/steps:.3f} ms/step)")
