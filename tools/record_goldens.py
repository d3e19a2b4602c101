"""Record golden rollout fixtures for regression testing.

Usage: python tools/record_goldens.py [env_id ...]

Writes tests/goldens/<env_id>.npz with (obs, reward, terminated) for a
fixed-seed, fixed-action rollout on CPU. These anchor engine behavior
across refactors/optimizations; the same harness accepts PyBullet-recorded
fixtures when the reference becomes available (SURVEY §4 blocker
mitigation — goldens are data files that drop in).
"""

import os
import sys

if "--cpu" in sys.argv and (
    "xla_force_host_platform_device_count"
    not in os.environ.get("XLA_FLAGS", "")
):
    # match tests/conftest.py's XLA environment: the persistent jit cache
    # keys on it, so recording with any other XLA_FLAGS would make golden
    # replays recompile from scratch inside pytest chunks (30+ min per
    # arm/humanoid env on the 1-core CPU)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

if "--cpu" in sys.argv:
    # CPU-platform golden set (VERDICT r1 #6): exact replay is platform-
    # specific, so CPU CI needs its own fixtures next to the TPU ones
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/pybulletgym_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pybulletgym_tpu as pg  # noqa: E402
from pybulletgym_tpu.api.registry import registry  # noqa: E402

B = 2
N_STEPS = 20
SEED = 1234
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def actions_for(env, rng):
    return rng.uniform(-1, 1, (N_STEPS, B, env.action_size)).astype(np.float32)


def record(env_id):
    env = pg.make_batched(env_id, B, backend="xla")
    s = env.reset(seed=SEED)
    rng = np.random.default_rng(SEED)
    acts = actions_for(env, rng)
    obs, rew, term = [], [], []
    for a in acts:
        s = env.step(s, a)
        obs.append(np.asarray(s.obs))
        rew.append(np.asarray(s.reward))
        term.append(np.asarray(s.terminated))
    suffix = ".npz" if jax.default_backend() != "cpu" else ".cpu.npz"
    path = os.path.join(OUT, env_id + suffix)
    np.savez_compressed(
        path,
        obs=np.stack(obs), reward=np.stack(rew), terminated=np.stack(term),
        seed=SEED, n_steps=N_STEPS, batch=B,
        source="pybulletgym_tpu",  # becomes "pybullet" for reference goldens
        platform=jax.default_backend(),  # exact replay is platform-specific
    )
    print(f"recorded {path}")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    ids = sys.argv[1:] or sorted(registry)
    for env_id in ids:
        record(env_id)
