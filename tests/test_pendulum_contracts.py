"""Pendulum env numerical contracts (SURVEY §2.7)
[ref: …/envs/pendulum/inverted_pendulum_env.py · step,
      inverted_double_pendulum_env.py · step]."""

import numpy as np

import pybulletgym_tpu as pg

B = 8


def _rollout(env_id, n, action=0.0, seed=0):
    env = pg.make_batched(env_id, B, backend="xla")
    s = env.reset(seed=seed)
    states = [s]
    a = np.full((B, env.action_size), action, np.float32)
    for _ in range(n):
        s = env.step(s, a)
        states.append(s)
    return env, states


def test_inverted_pendulum_reward_and_done():
    env, states = _rollout("InvertedPendulumPyBulletEnv-v0", 20)
    for s in states[1:]:
        r = np.asarray(s.reward)
        term = np.asarray(s.terminated)
        # reward 1.0/step while |theta| <= 0.2, done exactly when exceeded
        obs = np.asarray(s.obs)  # rows: x, vx, cos, sin, theta_dot
        theta = np.arctan2(obs[3], obs[2])
        np.testing.assert_allclose(r, 1.0)
        np.testing.assert_array_equal(term, np.abs(theta) > 0.2)


def test_swingup_reward_is_cos_theta_and_never_terminates():
    env, states = _rollout("InvertedPendulumSwingupPyBulletEnv-v0", 20)
    for s in states[1:]:
        obs = np.asarray(s.obs)
        theta_cos = obs[2]
        np.testing.assert_allclose(np.asarray(s.reward), theta_cos, atol=1e-5)
        assert not np.any(np.asarray(s.terminated))
    # starts hanging: cos(theta) ~ -1 at reset
    assert np.all(np.asarray(states[0].obs)[2] < -0.9)


def test_double_pendulum_reward_formula():
    env, states = _rollout("InvertedDoublePendulumPyBulletEnv-v0", 10)
    for s in states[1:]:
        comps = {k: np.asarray(v) for k, v in s.rewards.items()}
        r = np.asarray(s.reward)
        np.testing.assert_allclose(
            r, comps["alive"] + comps["dist_penalty"] + comps["vel_penalty"],
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(comps["alive"], 10.0)
        # near-upright start: reward close to 10
        assert np.all(r > 8.0)


def test_reset_joint_perturbation_bounds():
    """Reset stochasticity is uniform(-0.1, 0.1) on joint angles
    [ref: robots/pendula — robot_specific_reset]."""
    env = pg.make_batched("InvertedPendulumPyBulletEnv-v0", 256, backend="xla")
    s = env.reset(seed=3)
    obs = np.asarray(s.obs)
    theta = np.arctan2(obs[3], obs[2])
    assert np.all(np.abs(theta) <= 0.1 + 1e-6)
    assert theta.std() > 0.02  # actually random, not constant
    v = np.asarray(s.v)
    np.testing.assert_allclose(v, 0.0)
