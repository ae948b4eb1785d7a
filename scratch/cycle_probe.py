"""Does the synthetic 1.5B greedy stream cycle? (lookup-spec viability)"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import synth
from rwkv_tpu.runtime import generate as G

cfg = synth.make_config("7.0", n_vocab=65536, n_embed=2048, n_layer=24)
params = synth.random_params_device(cfg, dtype=np.dtype("bfloat16"))
jax.block_until_ready(jax.tree.leaves(params))
state = G.batched_init_state(cfg, 1)
toks, _ = G.greedy_decode(params, cfg, jnp.zeros((1,), jnp.int32), state, steps=256)
t = np.asarray(jax.device_get(toks))[0]
print("first 64:", t[:64].tolist())
# detect a cycle in the tail
tail = t[128:]
for period in range(1, 64):
    if np.array_equal(tail[period:], tail[:-period][:len(tail)-period]) and \
       np.array_equal(tail[:-period], tail[period:]):
        pass
found = None
for period in range(1, 96):
    if len(tail) > 2 * period and np.array_equal(tail[-period:], tail[-2*period:-period]):
        found = period
        break
print("cycle period in tail:", found)
uniq = len(set(t[128:].tolist()))
print("unique tokens in tail 128:", uniq)
