import os
import sys

# sitecustomize resets JAX_PLATFORMS=axon in every interpreter; override
# before jax import (same trick as conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from rwkv_tpu.models import forward as F, params as P
from rwkv_tpu.ops.linear import quantize_params_device
from tests.common import PROMPT, fixture

cfg, prm = P.load_params(fixture("tiny-rwkv-5v2-730K-FP32.bin"), parity=False)
st = F.init_state(cfg)
ld, _ = F.forward(prm, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
print("dense done", flush=True)
for mode in ("int4", "int5", "block"):
    qp = quantize_params_device(prm, mode=mode)
    lq, _ = F.forward(qp, cfg, jnp.asarray(PROMPT, jnp.int32), st, jnp.int32(3))
    c = np.corrcoef(np.asarray(ld), np.asarray(lq))[0, 1]
    rms = np.sqrt(np.mean((np.asarray(ld) - np.asarray(lq)) ** 2))
    print(mode, "corr", round(c, 5), "rms", round(float(rms), 4), flush=True)
