"""2-D ('host', 'env') mesh: config-5 layout (multi-host slice) exercised
on the virtual 8-CPU-device mesh reshaped (2, 4)."""

import jax
import pytest
import numpy as np

import pybulletgym_tpu as pg
from pybulletgym_tpu.envs.base import make_env
from pybulletgym_tpu.parallel import mesh as pmesh
from tests.conftest import cpu_devices


@pytest.mark.slow  # multi-device compile-heavy (round-5 chunk rebalance)
def test_env_step_on_host_env_mesh():
    mesh = pmesh.make_mesh_2d(n_hosts=2, devices=cpu_devices(8))
    assert mesh.axis_names == ("host", "env")
    B = 64
    env = pg.make_batched("InvertedPendulumPyBulletEnv-v0", B,
                          backend="xla", jit=False)
    _, step_fn = make_env(env.task)
    s = pmesh.shard_env_state(env.reset(seed=0), mesh)
    a = jax.device_put(
        np.zeros((env.action_size, B), np.float32),
        pmesh.env_sharding(mesh, 2),
    )
    s2 = jax.jit(step_fn)(s, a)
    assert np.all(np.isfinite(np.asarray(s2.obs)))
    # state stayed sharded over both axes
    shard_count = len(s2.q.sharding.device_set)
    assert shard_count == 8


@pytest.mark.slow  # multi-device compile-heavy (round-5 chunk rebalance)
def test_ppo_train_step_on_host_env_mesh():
    from pybulletgym_tpu.parallel import ppo

    mesh = pmesh.make_mesh_2d(n_hosts=2, devices=cpu_devices(8))
    cfg = ppo.PPOConfig(rollout_length=4, num_epochs=1, num_minibatches=2,
                        hidden=(16, 16))
    env = pg.make_batched("InvertedPendulumPyBulletEnv-v0", 32,
                          backend="xla", jit=False)
    ts = ppo.init_train_state(jax.random.PRNGKey(0), env.observation_size,
                              env.action_size, cfg)
    es = pmesh.shard_env_state(env.reset(seed=0), mesh)
    ts = jax.tree.map(lambda x: jax.device_put(x, pmesh.replicated(mesh)), ts)
    step = jax.jit(ppo.make_train_step(env.task, cfg))
    ts2, es2, metrics = step(ts, es)
    assert np.isfinite(float(metrics["loss"]))
