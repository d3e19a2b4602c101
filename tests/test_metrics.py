"""EpisodeStats: on-device episode aggregation across auto-resets."""

import jax
import jax.numpy as jnp
import numpy as np

import pybulletgym_tpu as pg
from pybulletgym_tpu.envs.base import make_env
from pybulletgym_tpu.utils.metrics import EpisodeStats


def test_counts_episodes_and_returns():
    stats = EpisodeStats.init(2)
    # env0: episode of length 3 return 6; env1: episode of length 2 return 2
    steps = [
        (jnp.array([1.0, 1.0]), jnp.array([False, False])),
        (jnp.array([2.0, 1.0]), jnp.array([False, True])),
        (jnp.array([3.0, 5.0]), jnp.array([True, False])),
    ]
    for r, d in steps:
        stats = stats.update(r, d)
    assert int(stats.n_episodes) == 2
    np.testing.assert_allclose(float(stats.sum_returns), 6.0 + 2.0)
    np.testing.assert_allclose(float(stats.sum_lengths), 3.0 + 2.0)
    # env1's new episode is in-flight with return 5
    np.testing.assert_allclose(np.asarray(stats.running_return), [0.0, 5.0])


def test_inside_jitted_rollout():
    B = 8
    env = pg.make_batched("InvertedPendulumPyBulletEnv-v0", B, backend="xla",
                          jit=False)
    env.task.max_episode_steps = 25
    try:
        _, step_fn = make_env(env.task)

        def rollout(s, stats):
            def body(carry, _):
                s, stats = carry
                a = jnp.zeros((1, B), jnp.float32)
                s2 = step_fn(s, a)
                return (s2, stats.update(s2.reward, s2.done)), None

            (s, stats), _ = jax.lax.scan(body, (s, stats), None, length=100)
            return stats

        stats = jax.jit(rollout)(env.reset(seed=0), EpisodeStats.init(B))
        assert int(stats.n_episodes) >= B * 3  # 100 steps / 25-step horizon
        assert float(stats.mean_length()) <= 25.0
    finally:
        env.task.max_episode_steps = 1000
