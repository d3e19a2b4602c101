"""Pallas kernel path in interpret mode: runs on any backend, so CPU-only
CI still exercises the kernel's trace (auto-reset + RNG + physics + obs +
reward in one program). Numerical equivalence vs the XLA path is asserted
— interpret mode executes the same trace with plain XLA ops."""

import jax
import jax.numpy as jnp
import numpy as np

import pybulletgym_tpu as pg
from pybulletgym_tpu.envs.base import make_env
from pybulletgym_tpu.ops.pallas_engine import TILE, make_pallas_env_step

B = TILE  # one kernel program


def test_interpret_env_step_matches_xla():
    task = pg.make_task("InvertedPendulumPyBulletEnv-v0")
    step_p = make_pallas_env_step(task, interpret=True)
    _, step_x = make_env(task)

    env = pg.make_batched("InvertedPendulumPyBulletEnv-v0", B,
                          backend="xla", jit=False)
    s0 = env.reset(seed=5)
    a = jnp.full((1, B), 0.3, jnp.float32)

    sp = step_p(s0, a)
    sx = step_x(s0, a)
    np.testing.assert_allclose(
        np.asarray(sp.q), np.asarray(sx.q), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sp.obs), np.asarray(sx.obs), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sp.reward), np.asarray(sx.reward), atol=2e-3
    )
    np.testing.assert_array_equal(
        np.asarray(sp.terminated), np.asarray(sx.terminated)
    )
    # auto-reset path: force done and step again — epochs must bump
    sd = sp._replace(terminated=jnp.ones((B,), bool))
    sp2 = step_p(sd, a)
    assert np.all(np.asarray(sp2.epoch) == np.asarray(sp.epoch) + 1)
    assert np.all(np.asarray(sp2.step_count) == 1)
