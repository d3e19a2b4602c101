"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax import.

This is the standard JAX trick for exercising multi-device sharding logic
without a TPU slice (SURVEY §4, implication 3): tests of pjit/shard_map
paths run against 8 fake CPU devices; the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

# 8 virtual CPU devices for the sharding tests (SURVEY §4, implication 3).
# Most tests run on the default backend (a TPU when present — much faster
# compiles — CPU otherwise); mesh/sharding tests pin jax.devices("cpu")
# explicitly so they exercise an 8-device mesh either way.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# sitecustomize pins the axon TPU plugin regardless of JAX_PLATFORMS, so an
# env var is not enough when the TPU (or its compile service) is down; this
# knob forces a true-CPU run (slow first compiles, but hermetic).
if os.environ.get("PYBULLETGYM_TPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the engine unrolls per-model structure at
# trace time, so test compiles are expensive but fully repeatable — cache
# them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/pybulletgym_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices(n: int = 8):
    devs = jax.devices("cpu")
    assert len(devs) >= n, "XLA_FLAGS must provide 8 virtual CPU devices"
    return devs[:n]


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
