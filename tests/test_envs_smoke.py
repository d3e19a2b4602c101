"""Construct + rollout every registered env (the reference's test strategy:
instantiate every registered id, step random actions, assert no crash and
obs conformity [ref: pybulletgym/tests/ — SURVEY §4])."""

import numpy as np
import pytest

import pybulletgym_tpu as pg
from pybulletgym_tpu.api.registry import registry

B = 2   # matches the golden fixtures' batch so compiled steps are shared
N_STEPS = 5


@pytest.mark.parametrize("env_id", sorted(registry))
def test_batched_rollout(env_id, rng):
    env = pg.make_batched(env_id, B, backend="xla")
    state = env.reset(seed=123)
    obs = env.observations(state)
    assert obs.shape == (B, env.observation_size)
    assert np.all(np.isfinite(np.asarray(obs)))
    for _ in range(N_STEPS):
        a = rng.uniform(-1, 1, (B, env.action_size)).astype(np.float32)
        state = env.step(state, a)
        obs = np.asarray(env.observations(state))
        assert obs.shape == (B, env.observation_size)
        assert np.all(np.isfinite(obs))
        # roboschool walkers clip obs to [-5, 5] [ref: WalkerBase.calc_state];
        # pendula and the MuJoCo-parity family do not
        if "PyBulletEnv" in env_id and "Pendulum" not in env_id:
            assert np.all(np.abs(obs) <= 5.0 + 1e-6)
        r = np.asarray(state.reward)
        assert r.shape == (B,) and np.all(np.isfinite(r))
    # reward decomposition is exposed like the reference's self.rewards list
    # [ref: walker_base_env.py · step]
    assert state.rewards, "reward components dict must be populated"


# single-env adapter: representatives of each family (a per-env run would
# recompile a B=1 step for all 22 envs for no extra coverage — the batched
# test above already exercises every env's physics/contract)
GYM_API_REPRESENTATIVES = [
    "InvertedPendulumPyBulletEnv-v0",
    "HopperPyBulletEnv-v0",
    "ReacherPyBulletEnv-v0",
    "HopperMuJoCoEnv-v0",
]


@pytest.mark.parametrize("env_id", GYM_API_REPRESENTATIVES)
def test_single_env_gym_api(env_id, rng):
    env = pg.make(env_id)
    obs, info = env.reset(seed=7)
    assert obs.shape == env.observation_space.shape
    total = 0.0
    for _ in range(N_STEPS):
        a = rng.uniform(-1, 1, env.action_space.shape).astype(np.float32)
        obs, r, term, trunc, info = env.step(a)
        total += float(r)
        assert np.all(np.isfinite(obs))
        if term or trunc:
            obs, info = env.reset(seed=8)
    assert np.isfinite(total)


def test_vector_adapter(rng):
    """gymnasium VectorEnv facade over the batched core (round-2 API)."""
    venv = pg.make_vec("HopperPyBulletEnv-v0", 4)
    obs, _ = venv.reset(seed=3)
    assert obs.shape == (4,) + venv.single_observation_space.shape
    for _ in range(3):
        a = rng.uniform(-1, 1, (4, 3)).astype(np.float32)
        obs, r, term, trunc, infos = venv.step(a)
    assert obs.shape == (4, 15) and r.shape == (4,)
    assert term.dtype == bool and trunc.dtype == bool
    assert "progress" in infos


def test_render_human_headless_warns_not_crashes():
    import warnings

    env = pg.make("InvertedPendulumPyBulletEnv-v0", render_mode="human")
    env.reset(seed=0)
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        out = env.render()          # headless: falls back, returns None
    assert out is None
    env.close()
