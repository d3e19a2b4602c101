"""Sharded execution equivalence on the 8-device virtual CPU mesh: the
batched env step must produce bitwise-identical results whether the env
batch lives on one device or is sharded over 8 (new capability mandated by
the north star; the reference has no parallelism — SURVEY §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import pybulletgym_tpu as pg
from pybulletgym_tpu.envs.base import make_env


from tests.conftest import cpu_devices


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(cpu_devices(8)), ("env",))


def _shard_state(state, mesh):
    def put(x):
        if x.ndim == 0:
            return x
        spec = P(*([None] * (x.ndim - 1) + ["env"]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)


@pytest.mark.slow  # multi-device compile-heavy (round-5 chunk rebalance)
def test_sharded_step_bitwise_equal(mesh):
    B = 64
    env = pg.make_batched("HopperPyBulletEnv-v0", B, backend="xla", jit=False)
    reset_fn, step_fn = make_env(env.task)
    step_j = jax.jit(step_fn)

    s0 = env.reset(seed=0)
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1, 1, (5, env.action_size, B)).astype(np.float32)

    # single-CPU-device reference (same platform as the sharded run, so the
    # comparison below is a true bitwise check)
    cpu0 = cpu_devices(1)[0]
    s = jax.tree.map(lambda x: jax.device_put(x, cpu0), s0)
    for a in actions:
        s = step_j(s, jax.device_put(jnp.asarray(a), cpu0))
    ref = np.asarray(s.obs)

    s = _shard_state(s0, mesh)
    for a in actions:
        a_sh = jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P(None, "env"))
        )
        s = step_j(s, a_sh)
    out = np.asarray(s.obs)

    np.testing.assert_array_equal(ref, out)


@pytest.mark.slow  # multi-device compile-heavy (round-5 chunk rebalance)
def test_rollout_scan_under_shard(mesh):
    """A lax.scan rollout (the production shape) compiles and runs sharded."""
    B = 64
    env = pg.make_batched("AntPyBulletEnv-v0", B, backend="xla", jit=False)
    reset_fn, step_fn = make_env(env.task)

    def rollout(state, actions):
        def body(s, a):
            s2 = step_fn(s, a)
            return s2, (s2.reward, s2.terminated)

        return jax.lax.scan(body, state, actions)

    rollout_j = jax.jit(rollout)
    s0 = _shard_state(env.reset(seed=3), mesh)
    rng = np.random.default_rng(1)
    acts = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, (4, env.action_size, B)).astype(np.float32)),
        NamedSharding(mesh, P(None, None, "env")),
    )
    s_final, (rew, term) = rollout_j(s0, acts)
    assert rew.shape == (4, B)
    assert np.all(np.isfinite(np.asarray(rew)))
