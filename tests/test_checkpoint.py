"""Checkpoint/resume: saving an EnvState and resuming must continue the
exact trajectory (deterministic resume — SURVEY §5 checkpoint plan)."""

import os
import tempfile

import numpy as np

import pybulletgym_tpu as pg
from pybulletgym_tpu.utils import checkpoint

B = 8


def test_envstate_roundtrip_resumes_exact_trajectory():
    env = pg.make_batched("HopperPyBulletEnv-v0", B, backend="xla")
    s = env.reset(seed=7)
    rng = np.random.default_rng(0)
    acts = rng.uniform(-1, 1, (10, B, env.action_size)).astype(np.float32)
    for a in acts[:5]:
        s = env.step(s, a)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        checkpoint.save(path, s)
        s2 = checkpoint.load(path, env.reset(seed=0))

    ref, res = s, s2
    for a in acts[5:]:
        ref = env.step(ref, a)
        res = env.step(res, a)
    np.testing.assert_array_equal(np.asarray(ref.obs), np.asarray(res.obs))
    np.testing.assert_array_equal(
        np.asarray(ref.step_count), np.asarray(res.step_count)
    )


def test_trainstate_roundtrip():
    import jax

    from pybulletgym_tpu.parallel import ppo

    cfg = ppo.PPOConfig(hidden=(16, 16))
    ts = ppo.init_train_state(jax.random.PRNGKey(3), 5, 1, cfg)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ts.npz")
        checkpoint.save(path, ts)
        ts2 = checkpoint.load(path, ppo.init_train_state(jax.random.PRNGKey(9), 5, 1, cfg))
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_template_mismatches_raise_value_error():
    """ADVICE r1: fewer saved leaves than the template, more leaves, and a
    different tree STRUCTURE must all raise ValueError (so resumable
    trainers fall back to a fresh start instead of crashing or silently
    loading wrong data)."""
    import pytest

    small = {"a": np.zeros(3), "b": np.ones(2)}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        checkpoint.save(path, small)

        # template has MORE leaves than the checkpoint
        bigger = {"a": np.zeros(3), "b": np.ones(2), "c": np.zeros(1)}
        with pytest.raises(ValueError):
            checkpoint.load(path, bigger)

        # template has FEWER leaves
        with pytest.raises(ValueError):
            checkpoint.load(path, {"a": np.zeros(3)})

        # same leaf count, different structure (dict keys)
        with pytest.raises(ValueError):
            checkpoint.load(path, {"a": np.zeros(3), "z": np.ones(2)})

        # same structure, wrong shape
        with pytest.raises(ValueError):
            checkpoint.load(path, {"a": np.zeros(4), "b": np.ones(2)})
