"""Pallas kernel vs XLA path: one fused env step must agree numerically.

Runs only where a TPU is attached (the Pallas TPU kernel has no CPU
lowering; interpret mode at the (8,128) tile geometry is too slow for CI).
The driver's bench exercises the Pallas path on every round regardless.
"""

import jax
import numpy as np
import pytest

import pybulletgym_tpu as pg

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="pallas TPU kernel needs a TPU"
)

B = 1024


@requires_tpu
@pytest.mark.parametrize("env_id", ["HopperPyBulletEnv-v0", "HalfCheetahPyBulletEnv-v0"])
def test_single_step_matches_xla(env_id):
    envp = pg.make_batched(env_id, B, backend="pallas")
    envx = pg.make_batched(env_id, B, backend="xla")
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (B, envp.action_size)).astype(np.float32)

    sp = envp.step(envp.reset(seed=3), a)
    sx = envx.step(envx.reset(seed=3), a)

    # same math, different instruction order: f32 round-off only
    np.testing.assert_allclose(
        np.asarray(sp.q), np.asarray(sx.q), atol=2e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sp.obs), np.asarray(sx.obs), atol=5e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sp.reward), np.asarray(sx.reward), atol=5e-3
    )
    np.testing.assert_array_equal(
        np.asarray(sp.terminated), np.asarray(sx.terminated)
    )
