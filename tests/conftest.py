"""Test harness: force an 8-device virtual CPU platform.

Multi-device sharding paths are exercised on CPU without TPU hardware — the
standard JAX answer to "test multi-chip without a slice".

Note: this container's sitecustomize registers an 'axon' TPU platform and
overrides the ``jax_platforms`` config at interpreter startup, so setting
JAX_PLATFORMS in the environment is not enough — we must update the jax
config directly (before any backend initialisation, which is lazy).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# never attempt the ModelNet40 auto-download from tests (zero-egress box)
os.environ.setdefault("VCRNET_OFFLINE", "1")
# CLI-path tests run on CPU; the fail-fast TPU probe would waste 60 s per
# invocation probing a tunnel the tests never use
os.environ.setdefault("VCRNET_SKIP_TPU_PROBE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite's cost is XLA compiles (grad-of-
# shard_map programs run minutes each on this 1-CPU box), not execution.
# Caching makes routine re-runs take seconds instead of ~30 min; the cache
# key includes jax/jaxlib versions and XLA flags, so stale hits are not a
# risk across container upgrades.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
