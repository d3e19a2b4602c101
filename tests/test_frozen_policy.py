"""Frozen-policy behavioral regression: a PPO-trained policy shipped in
examples/weights must keep solving its env — the role the reference's
pretrained `enjoy_TF_*` demos play as de-facto regression anchors
[ref: pybulletgym/examples/roboschool-weights — SURVEY §3.5/§4]."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pybulletgym_tpu as pg
from pybulletgym_tpu.envs.base import make_env

pytestmark = pytest.mark.slow

WEIGHTS = sorted(
    p for p in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "examples", "weights", "*.npz")
    )
    # optimizer/learner checkpoints, not policies
    if not p.endswith((".trainstate.npz", ".saclearner.npz"))
)

# env id -> minimum acceptable mean return (conservative floors: the
# pendulum ships solved; the hopper ships as a working gait demo)
MIN_RETURN = {
    "InvertedPendulumPyBulletEnv-v0": 950.0,
    "InvertedDoublePendulumPyBulletEnv-v0": 9100.0,  # threshold (round 2)
    "HopperPyBulletEnv-v0": 2000.0,
    # solved on 64-ep mean 2846; seed-123 8-ep mean 2905, ep min 2678 —
    # ~70% floor so a halving regression fails (VERDICT r4 item 4)
    "AntPyBulletEnv-v0": 2000.0,
    # ship 1193 (SAC campaign in flight toward 2500); seed-123 8-ep mean
    # 1213 — floor at ~60% of ship per VERDICT r4 item 4
    "Walker2DPyBulletEnv-v0": 750.0,
    # SOLVED round 5: SAC ship eval 3130 > threshold 3000 (seed-123 8-ep
    # mean 3153, ep min 3117) — floor IS the reference threshold
    "HalfCheetahPyBulletEnv-v0": 3000.0,
    "ReacherPyBulletEnv-v0": 18.0,  # threshold (round 3, IK-expert BC)
    "InvertedPendulumSwingupPyBulletEnv-v0": 800.0,  # threshold (round 3)
    "InvertedPendulumMuJoCoEnv-v0": 950.0,  # threshold (round 3, CEM)
    # mirror manipulation thresholds are the roboschool 18.0 carried over
    # by the reference registry — unreachable under the Gym-MuJoCo-style
    # negative-distance reward; floors anchor the shipped demo instead.
    "ReacherMuJoCoEnv-v0": -14.0,  # BC of the IK expert (expert: -9.4)
    "InvertedDoublePendulumMuJoCoEnv-v0": 9100.0,  # threshold (round 3, CEM)
    # mirror walkers: distilled from solved PyBullet teachers (round 3);
    # floors sit well under the 256-episode ship evals (Ant 2565) because
    # 8-episode means carry the same per-episode variance the PB Ant floor
    # documents above
    "AntMuJoCoEnv-v0": 1700.0,  # seed-123 8-ep mean 2454, ep min 2062
    "HalfCheetahMuJoCoEnv-v0": 1100.0,  # ship 1639; seed-123 8-ep mean 1561
    # FIXED round 5: PPO from scratch replaced the broken BC demo (69 —
    # Gym-v2 healthy bounds cut the PB gait short). Ship eval 1492
    # (64-ep); seed-123 8-ep mean 1268, ep min 849 — floor leaves
    # per-episode-variance margin on the 8-ep mean
    "HopperMuJoCoEnv-v0": 1000.0,
    "Walker2DMuJoCoEnv-v0": 900.0,  # ship 1239; seed-123 8-ep mean 1322
    # PB arm envs (round 4, CEM expert + DAgger BC; ship evals over 1536
    # episodes — floors leave margin for the 8-episode test mean)
    "PusherPyBulletEnv-v0": -80.0,  # ship eval -63.95
    "StrikerPyBulletEnv-v0": -300.0,  # ship eval -260.7
    "ThrowerPyBulletEnv-v0": -80.0,  # ship eval -62.65
    "PusherMuJoCoEnv-v0": -60.0,  # ship eval -44.26
    "StrikerMuJoCoEnv-v0": -300.0,  # ship eval -261.7
    "ThrowerMuJoCoEnv-v0": -80.0,  # ship eval -62.85
    # humanoid family + Atlas (round 4 first PPO chunks; floors tightened
    # round 5 to ~70% of the measured seed-123 8-ep means so a halving
    # regression fails CI — VERDICT r4 item 4)
    "HumanoidPyBulletEnv-v0": 220.0,  # ship 316; seed-123 8-ep mean 312
    "HumanoidFlagrunPyBulletEnv-v0": 140.0,  # ship 207; 8-ep mean 198
    "HumanoidFlagrunHarderPyBulletEnv-v0": 100.0,  # 8-ep mean 213, min -329
    "AtlasPyBulletEnv-v0": 75.0,  # ship 109; 8-ep mean 113, ep min 75
    "HumanoidMuJoCoEnv-v0": 430.0,  # ship 621; 8-ep mean 585
}


def _policy(path):
    d = np.load(path)
    n = int(d["n_layers"])
    ws = [jnp.asarray(d[f"w{i}"]) for i in range(n)]
    bs = [jnp.asarray(d[f"b{i}"]) for i in range(n)]
    norm = None
    if "normalized" in d and bool(d["normalized"]):
        norm = (jnp.asarray(d["obs_mean"]),
                jnp.sqrt(jnp.asarray(d["obs_var"]) + 1e-8))

    squash = "squash" in d and bool(d["squash"])  # SAC: tanh output head

    def act(obs):  # obs (B, obs_dim)
        h = obs
        if norm is not None:
            h = jnp.clip((h - norm[0]) / norm[1], -10.0, 10.0)
        for i, (w, b) in enumerate(zip(ws, bs)):
            h = h @ w + b
            if i < n - 1:
                h = jnp.tanh(h)
        return jnp.tanh(h) if squash else jnp.clip(h, -1.0, 1.0)

    return act


@pytest.mark.parametrize(
    "path", WEIGHTS, ids=[os.path.basename(p)[:-4] for p in WEIGHTS]
)
def test_frozen_policy_return(path):
    env_id = os.path.basename(path)[:-4]
    act = _policy(path)
    B = 8
    env = pg.make_batched(env_id, B, backend="xla", jit=False)
    task = env.task
    _, step_fn = make_env(task)

    def rollout(state):
        def body(s, _):
            a = act(s.obs.T)
            s2 = step_fn(s, a.T)
            # freeze finished episodes: stop accumulating after first done
            return s2, (s2.reward, s2.done)

        _, (rews, dones) = jax.lax.scan(
            body, state, None, length=task.max_episode_steps
        )
        alive = jnp.cumprod(1.0 - dones.astype(jnp.float32), axis=0)
        # include the terminal step's reward, exclude post-reset life
        prev_alive = jnp.concatenate([jnp.ones((1, B)), alive[:-1]], axis=0)
        return jnp.sum(rews * prev_alive, axis=0)

    returns = np.asarray(jax.jit(rollout)(env.reset(seed=123)))
    floor = MIN_RETURN.get(env_id, None)
    assert np.isfinite(returns).all()
    if floor is not None:
        assert returns.mean() >= floor, f"{env_id}: returns {returns}"


def test_at_least_one_frozen_policy_shipped():
    assert WEIGHTS, "examples/weights must contain at least one trained policy"
