"""Root conftest: force tests onto an 8-device virtual CPU mesh.

Must run before any test imports jax. The container's sitecustomize registers
the axon TPU plugin in every interpreter and sets JAX_PLATFORMS=axon; tests
must not grab the (single, exclusive) TPU chip, and sharding tests need 8
virtual devices, so we override both knobs here.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
