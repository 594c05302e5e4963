"""Test configuration: force the XLA CPU backend with 8 virtual devices so
sharding/mesh tests run anywhere without touching the (single, shared) TPU
chip (SURVEY.md §4: multi-host strategy is simulated with
--xla_force_host_platform_device_count).

Note: the axon TPU plugin ignores ``JAX_PLATFORMS``; ``JAX_PLATFORM_NAME``
plus ``jax.config.update`` is what actually pins the CPU backend here.
"""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
