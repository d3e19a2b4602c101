"""Replay shipped frozen policies with the EXACT tests/test_frozen_policy.py
rollout (8 envs, seed 123) and print the mean return — used to set honest
MIN_RETURN floors [ref: SURVEY §3.5 — the reference demos are its
regression anchors]."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/pybulletgym_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pybulletgym_tpu as pg
from pybulletgym_tpu.envs.base import make_env
from test_frozen_policy import _policy  # same MLP loader, incl. squash/norm


def eval_env(env_id: str) -> float:
    path = os.path.join(
        os.path.dirname(__file__), "..", "examples", "weights", env_id + ".npz"
    )
    act = _policy(path)
    B = 8
    env = pg.make_batched(env_id, B, backend="xla", jit=False)
    task = env.task
    _, step_fn = make_env(task)

    def rollout(state):
        def body(s, _):
            a = act(s.obs.T)
            s2 = step_fn(s, a.T)
            return s2, (s2.reward, s2.done)

        _, (rews, dones) = jax.lax.scan(
            body, state, None, length=task.max_episode_steps
        )
        alive = jnp.cumprod(1.0 - dones.astype(jnp.float32), axis=0)
        prev_alive = jnp.concatenate([jnp.ones((1, B)), alive[:-1]], axis=0)
        return jnp.sum(rews * prev_alive, axis=0)

    returns = np.asarray(jax.jit(rollout)(env.reset(seed=123)))
    return float(returns.mean()), returns


if __name__ == "__main__":
    for env_id in sys.argv[1:]:
        mean, rets = eval_env(env_id)
        print(f"{env_id}: mean {mean:+.1f}  min {rets.min():+.1f} "
              f"max {rets.max():+.1f}", flush=True)
