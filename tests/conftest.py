"""Test harness: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware (multi-chip is validated the same way the
driver's dryrun does).

Note: this image's sitecustomize imports jax at interpreter start, so the
env var alone is not enough — the config update below actually flips the
already-imported jax onto CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
