"""Root conftest: force tests onto an 8-device virtual CPU mesh.

Must run before any test imports jax. The container's sitecustomize registers
the axon TPU plugin in every interpreter and sets JAX_PLATFORMS=axon; tests
must not grab the (single, exclusive) TPU chip, and sharding tests need 8
virtual devices, so we override both knobs here.

TPU mode: RWKV_TPU_TESTS=1 leaves the platform alone so the suite runs on
the REAL chip — the golden-logit oracle matrix then validates the actual
Mosaic/XLA-lowered kernels, mirroring the reference running its oracles on
its real backend (test_tiny_rwkv.c:20-36). Tests needing >=8 devices skip
automatically. Expect minutes of compile time on first run:

    RWKV_TPU_TESTS=1 python -m pytest tests/test_tiny_rwkv.py tests/test_pallas_kernels.py -q
"""

import os

if os.environ.get("RWKV_TPU_TESTS") == "1":
    import jax  # noqa: F401  (axon platform from the environment)
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
