"""Pallas kernel vs XLA path: one fused env step must agree numerically.

Runs only where a TPU is attached (the Pallas TPU kernel has no CPU
lowering; interpret mode at the (8,128) tile geometry is too slow for CI).
The driver's bench exercises the Pallas path on every round regardless.
"""

import jax
import numpy as np
import pytest

import pybulletgym_tpu as pg

pytestmark = pytest.mark.slow

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

    # Same algorithm, different reduction/accumulation order: agreement is
    # f32-round-off tight away from contacts, and tolerance-bounded through
    # the stiff (ERP 0.9) contact solve where round-off is amplified by the
    # impulse scale. Tight mean bound + loose max bound.
    dq = np.abs(np.asarray(sp.q) - np.asarray(sx.q))
    assert dq.mean() < 3e-4, f"mean q diff {dq.mean()}"
    assert dq.max() < 1e-2, f"max q diff {dq.max()}"
    dob = np.abs(np.asarray(sp.obs) - np.asarray(sx.obs))
    # feet-contact flags are binary and may flip for marginal contacts;
    # compare the continuous rows tightly and flags loosely
    nf = len(envp.task.spec.foot_geoms)
    assert dob[:-nf].mean() < 1e-3, f"mean obs diff {dob[:-nf].mean()}"
    flips = (dob[-nf:] > 0.5).mean()
    assert flips < 0.01, f"foot flag flip rate {flips}"
    dr = np.abs(np.asarray(sp.reward) - np.asarray(sx.reward))
    assert np.median(dr) < 5e-3, f"median reward diff {np.median(dr)}"
    term_flips = (np.asarray(sp.terminated) != np.asarray(sx.terminated)).mean()
    assert term_flips < 0.01
