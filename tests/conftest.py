"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` so the full pjit/shard_map
path is exercised without real multi-chip hardware (SURVEY.md §4).
"""
import os

# Force-override: the session environment pins JAX_PLATFORMS to the real
# TPU tunnel, which would route every tiny test op through it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
