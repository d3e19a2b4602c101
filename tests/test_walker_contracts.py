"""Walker env contract tests (SURVEY §2.6/§2.7)
[ref: robots/locomotors/walker_base.py · WalkerBase.calc_state/apply_action,
      envs/locomotion/walker_base_env.py · WalkerBaseBulletEnv.step]."""

import numpy as np
import pytest

import pybulletgym_tpu as pg

B = 8


def test_obs_layout_hopper():
    """obs = [z-z0, sin(att), cos(att), 0.3vx, 0.3vy, 0.3vz, roll, pitch,
    (rel_pos, 0.1*vel)*n, feet] clipped to [-5, 5]."""
    env = pg.make_batched("HopperPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=0)
    obs = np.asarray(s.obs)  # (15, B)
    assert obs.shape[0] == 15
    # at reset: zero velocity => rows 3,4,5 (0.3*v) all zero
    np.testing.assert_allclose(obs[3:6], 0.0, atol=1e-6)
    # z - initial_z ~ 0 at reset (tiny joint perturbation only)
    assert np.all(np.abs(obs[0]) < 0.1)
    # walk target (1000, 0) dead ahead: sin(att)~0, cos(att)~1
    np.testing.assert_allclose(obs[1], 0.0, atol=0.05)
    np.testing.assert_allclose(obs[2], 1.0, atol=0.05)
    # joint velocities (rows 9, 11, 13) are zero at reset
    np.testing.assert_allclose(obs[9::2][: 3], 0.0, atol=1e-6)
    assert np.all(np.abs(obs) <= 5.0)


def test_reset_joint_perturbation_uniform():
    """Each actuated joint reset to qpos0 + uniform(-0.1, 0.1)
    [ref: WalkerBase.robot_specific_reset]."""
    env = pg.make_batched("HopperPyBulletEnv-v0", 256, backend="xla")
    task = env.task
    s = env.reset(seed=11)
    q = np.asarray(s.q)
    for i, qa in enumerate(task.act_qadr):
        d = q[qa] - task.model.qpos0[qa]
        assert np.all(np.abs(d) <= 0.1 + 1e-6)
        assert d.std() > 0.02
        # independent streams per joint
        if i > 0:
            d0 = q[task.act_qadr[0]] - task.model.qpos0[task.act_qadr[0]]
            assert abs(np.corrcoef(d, d0)[0, 1]) < 0.2


def test_reward_decomposition_sums():
    """reward = alive + progress + electricity + joints_at_limit +
    feet_collision [ref: walker_base_env.py · step — self.rewards]."""
    env = pg.make_batched("Walker2DPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=2)
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = rng.uniform(-1, 1, (B, env.action_size)).astype(np.float32)
        s = env.step(s, a)
        comps = {k: np.asarray(v) for k, v in s.rewards.items()}
        assert set(comps) == {
            "alive", "progress", "electricity", "joints_at_limit", "feet_collision"
        }
        np.testing.assert_allclose(
            np.asarray(s.reward), sum(comps.values()), rtol=1e-4, atol=1e-4
        )


def test_electricity_cost_formula():
    """electricity = -2*mean|a*jspeed| - 0.1*mean(a^2) (SURVEY §2.7)."""
    env = pg.make_batched("HopperPyBulletEnv-v0", B, backend="xla")
    task = env.task
    s = env.reset(seed=5)
    a = np.full((B, 3), 0.5, np.float32)
    s2 = env.step(s, a)
    obs = np.asarray(s2.obs)
    jspeed = obs[9:15:2]  # 0.1-scaled joint velocities, rows 9/11/13
    expect = (
        -2.0 * np.mean(np.abs(0.5 * jspeed), axis=0)
        - 0.1 * np.mean(np.full((3, B), 0.25), axis=0)
    )
    np.testing.assert_allclose(
        np.asarray(s2.rewards["electricity"]), expect, rtol=1e-4, atol=1e-4
    )


def test_alive_termination_hopper():
    """Hopper terminates when z < 0.8 or |pitch| >= 1.0; zero-torque hopper
    must fall and terminate within the first 200 steps."""
    env = pg.make_batched("HopperPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=1)
    a = np.zeros((B, 3), np.float32)
    seen_done = np.zeros(B, bool)
    for _ in range(200):
        s = env.step(s, a)
        seen_done |= np.asarray(s.terminated)
    assert np.all(seen_done), "unactuated hopper should fall over"


def test_ant_stays_alive_briefly():
    """Ant (z > 0.26 alive) standing on 4 legs should survive >20 steps with
    zero torque — validates ground contact actually supports the body."""
    env = pg.make_batched("AntPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=4)
    a = np.zeros((B, 8), np.float32)
    for _ in range(20):
        s = env.step(s, a)
        assert not np.any(np.asarray(s.terminated))
    alive = np.asarray(s.rewards["alive"])
    np.testing.assert_allclose(alive, 1.0)


def test_feet_contact_flags_present():
    env = pg.make_batched("AntPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=4)
    a = np.zeros((B, 8), np.float32)
    # ant spawns above the floor and needs ~25 control steps to touch down
    for _ in range(60):
        s = env.step(s, a)
    feet = np.asarray(s.obs)[-4:]  # last 4 rows are feet flags
    assert set(np.unique(feet)) <= {0.0, 1.0}
    assert feet.sum() > 0, "resting ant must report foot contact"


def test_torque_gains_match_reference_table():
    """torque_j = power * power_coef_j [ref: WalkerBase.apply_action;
    SURVEY §2.6 power table]."""
    cheetah = pg.make_task("HalfCheetahPyBulletEnv-v0")
    gains = cheetah.gains[:, 0]
    names = [a.joint for a in cheetah.model.actuators]
    table = {"bthigh": 120.0, "bshin": 90.0, "bfoot": 60.0,
             "fthigh": 140.0, "fshin": 60.0, "ffoot": 30.0}
    for n, g in zip(names, gains):
        np.testing.assert_allclose(g, 0.90 * table[n])

    hopper = pg.make_task("HopperPyBulletEnv-v0")
    for a, g in zip(hopper.model.actuators, hopper.gains[:, 0]):
        np.testing.assert_allclose(g, 0.75 * a.gear)
