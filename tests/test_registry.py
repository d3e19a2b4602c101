"""Registry surface parity with the reference package API
[ref: pybulletgym/envs/__init__.py — register(...) roster, SURVEY §2.4]."""

import numpy as np
import pytest

import pybulletgym_tpu as pg
from pybulletgym_tpu.api.registry import registry

# (id, act_dim, obs_dim, max_episode_steps, reward_threshold) per SURVEY §2.4
ROSTER = [
    ("InvertedPendulumPyBulletEnv-v0", 1, 5, 1000, 950.0),
    ("InvertedPendulumSwingupPyBulletEnv-v0", 1, 5, 1000, 800.0),
    ("InvertedDoublePendulumPyBulletEnv-v0", 1, 9, 1000, 9100.0),
    ("HopperPyBulletEnv-v0", 3, 15, 1000, 2500.0),
    ("Walker2DPyBulletEnv-v0", 6, 22, 1000, 2500.0),
    ("HalfCheetahPyBulletEnv-v0", 6, 26, 1000, 3000.0),
    ("AntPyBulletEnv-v0", 8, 28, 1000, 2500.0),
    ("HumanoidPyBulletEnv-v0", 17, 44, 1000, None),
]


@pytest.mark.parametrize("env_id,act,obs,steps,thresh", ROSTER)
def test_roster_registered(env_id, act, obs, steps, thresh):
    spec = registry[env_id]
    assert spec.max_episode_steps == steps
    assert spec.reward_threshold == thresh
    task = pg.make_task(env_id)
    assert task.act_dim == act
    assert task.obs_dim == obs


def test_gymnasium_mirror():
    """Importing the package registers every ID with gymnasium
    [ref: pybulletgym/envs/__init__.py import side effect]."""
    import gymnasium

    for env_id in registry:
        assert env_id in gymnasium.registry
    env = gymnasium.make("InvertedPendulumPyBulletEnv-v0")
    obs, info = env.reset(seed=0)
    assert obs.shape == (5,)
    obs, r, term, trunc, info = env.step(np.zeros(1, np.float32))
    assert obs.shape == (5,)


def test_gym_adapter_spaces():
    env = pg.make("HopperPyBulletEnv-v0")
    # Box(-1, 1, (act,)) / Box(-inf, inf, (obs,)) [ref: XmlBasedRobot.__init__]
    assert env.action_space.shape == (3,)
    assert np.all(env.action_space.low == -1.0)
    assert np.all(env.action_space.high == 1.0)
    assert env.observation_space.shape == (15,)


def test_unknown_id_raises():
    with pytest.raises(KeyError):
        pg.make_task("NopePyBulletEnv-v0")
