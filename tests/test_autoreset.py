"""Auto-reset + episode bookkeeping (on-device replacement for the
reference's manual reset() [ref: env_bases.py · BaseBulletEnv.reset])."""

import numpy as np

import pybulletgym_tpu as pg

B = 8


def test_truncation_at_max_episode_steps():
    env = pg.make_batched("InvertedPendulumSwingupPyBulletEnv-v0", B, backend="xla")
    env.task.max_episode_steps = 10  # shrink horizon for the test
    try:
        reset_fn, step_fn = __import__(
            "pybulletgym_tpu.envs.base", fromlist=["make_env"]
        ).make_env(env.task)
        import jax.numpy as jnp

        s = env.reset(seed=0)
        a = np.zeros((env.action_size, B), np.float32)
        for i in range(10):
            s = step_fn(s, a)
        assert np.all(np.asarray(s.truncated))
        assert np.all(np.asarray(s.step_count) == 10)
        # next step auto-resets: step_count back to 1, epoch bumped
        s2 = step_fn(s, a)
        assert np.all(np.asarray(s2.step_count) == 1)
        assert np.all(np.asarray(s2.epoch) == np.asarray(s.epoch) + 1)
        assert not np.any(np.asarray(s2.truncated))
    finally:
        env.task.max_episode_steps = 1000


def test_termination_resets_state():
    env = pg.make_batched("HopperPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=1)
    a = np.zeros((B, env.action_size), np.float32)
    for _ in range(300):
        s = env.step(s, a)
    # all envs have died (test_walker_contracts) and been resurrected; the
    # current population must contain recently-reset (low step count) envs
    assert np.asarray(s.epoch).max() >= 1
    assert np.all(np.isfinite(np.asarray(s.obs)))


def test_reset_after_done_uses_new_rng_stream():
    env = pg.make_batched("HopperPyBulletEnv-v0", 2, backend="xla")
    s = env.reset(seed=0)
    # force both envs done, then step: auto-reset draws come from epoch+1
    s = s._replace(terminated=np.array([True, True]))
    a = np.zeros((2, env.action_size), np.float32)
    s2 = env.step(s, a)
    q_new = np.asarray(s2.q)
    s0 = env.reset(seed=0)
    q_old = np.asarray(s0.q)
    assert not np.allclose(q_new, q_old), "re-reset must re-randomize joints"
