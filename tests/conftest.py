"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding tests run on CPU with
``--xla_force_host_platform_device_count=8`` so the full pjit/shard_map
path is exercised without real multi-chip hardware (SURVEY.md §4).
"""
import os

# Force-override: the session environment pins JAX_PLATFORMS to the real
# TPU tunnel (the axon sitecustomize hook registers the backend at
# interpreter startup and re-pins the platform, so the env var alone is
# ignored) — which would route every tiny test op through the remote chip
# at ~1 s/dispatch. The config-level update wins over the hook.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after XLA_FLAGS setup)

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", False)
# persistent compile cache: the risk-pipeline step program is large and
# CPU-compiles slowly; cache across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/crowdnav_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
