"""The scripted arm experts (tools/arm_experts.py) recompute arm-frame
quantities from the observation alone; their FK must agree exactly with
the env's own obs (tips rows 14:17 come from the same Model), and every
expert must emit finite, clipped actions of the right shape."""

import numpy as np
import pytest

import pybulletgym_tpu as pg

from tools.arm_experts import ARM_EXPERTS, arm_frames, make_arm_expert

ENVS = ["PusherPyBulletEnv-v0", "StrikerPyBulletEnv-v0",
        "ThrowerPyBulletEnv-v0"]


@pytest.mark.parametrize("env_id", ENVS)
def test_fk_matches_env_obs(env_id):
    env = pg.make_batched(env_id, 4, backend="xla", jit=False)
    s = env.reset(seed=3)
    tips, J, vt, tau_bias = arm_frames(env.task)(s.obs)
    np.testing.assert_allclose(
        np.stack([np.asarray(t) for t in tips]),
        np.asarray(s.obs[14:17]), atol=1e-6,
        err_msg="expert FK tips disagree with the env's obs tips")
    # reset draws tiny joint velocities; the tip velocity must be tiny too
    assert float(np.abs(np.asarray(vt)).max()) < 0.02
    assert all(np.isfinite(np.asarray(c)).all() for c in tau_bias)


@pytest.mark.parametrize("env_id", ENVS)
@pytest.mark.slow  # 150-step expert rollouts x6 envs (round-5 chunk rebalance)
def test_expert_actions_valid(env_id):
    env = pg.make_batched(env_id, 4, backend="xla", jit=False)
    s = env.reset(seed=5)
    a = np.asarray(make_arm_expert(env_id, env.task)(s.obs))
    assert a.shape == (7, 4)
    assert np.isfinite(a).all()
    assert (np.abs(a) <= 1.0 + 1e-6).all()


def test_theta_roundtrip(tmp_path, monkeypatch):
    import json

    from tools import arm_experts

    monkeypatch.setattr(arm_experts, "WEIGHTS_DIR", str(tmp_path))
    env_id = ENVS[0]
    theta = list(arm_experts.default_theta(env_id) * 1.5)
    with open(arm_experts.tuned_theta_path(env_id), "w") as f:
        json.dump({"theta": theta, "score": -1.0}, f)
    assert arm_experts.load_theta(env_id) == tuple(theta)
    # mirrors fall back to defaults when untuned
    assert arm_experts.load_theta("PusherMuJoCoEnv-v0") == tuple(
        ARM_EXPERTS["PusherMuJoCoEnv-v0"][1])
