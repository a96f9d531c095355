"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/halo logic is
exercised on host CPU devices instead (SURVEY.md §4). The environment's
sitecustomize registers an `axon` TPU backend and sets jax_platforms — the
config update below (before any backend is instantiated) overrides it back to
CPU for the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
