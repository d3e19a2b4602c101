"""Trajectory-level oracle: contact-free rollouts must track MuJoCo's
semi-implicit Euler integration (same dt, same gravity, no contacts), not
just match instantaneous dynamics (test_dynamics_oracle). This is the
contact-free half of the parity contract ("exact parity for contact-free
phases" — SURVEY §7 hard part 1)."""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pybulletgym_tpu.models.assets import asset_path  # noqa: E402
from pybulletgym_tpu.models.mjcf import load_mjcf  # noqa: E402
from pybulletgym_tpu.ops.step import PhysicsConfig, make_physics_step  # noqa: E402
from pybulletgym_tpu.ops.contacts import SolverConfig  # noqa: E402

pytestmark = pytest.mark.slow

DT = 0.0165
N_STEPS = 60


def _roll_ours(m, q0, v0, n, dt):
    cfg = PhysicsConfig(timestep=dt, frame_skip=1,
                        gravity=(0.0, 0.0, -9.81), solver=SolverConfig())
    step, _, _ = make_physics_step(m, cfg)
    step = jax.jit(step)
    q = jnp.asarray(q0, jnp.float32)[:, None]
    v = jnp.asarray(v0, jnp.float32)[:, None]
    tau = jnp.zeros_like(v)
    traj = []
    for _ in range(n):
        q, v, _ = step(q, v, tau)
        traj.append(np.asarray(q[:, 0]))
    return np.stack(traj)


def _roll_mujoco(path, q0, v0, n, dt, zero_damping=False):
    mj = mujoco.MjModel.from_xml_path(path)
    if zero_damping:
        mj.dof_damping[:] = 0.0
    mj.opt.timestep = dt
    mj.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    mj.opt.gravity[:] = [0, 0, -9.81]
    # disable contacts & limits: this test isolates the integrator
    mj.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_LIMIT
    )
    d = mujoco.MjData(mj)
    d.qpos[:] = q0
    d.qvel[:] = v0
    traj = []
    for _ in range(n):
        mujoco.mj_step(mj, d)
        traj.append(d.qpos.copy())
    return np.stack(traj)


def test_pendulum_free_swing_matches_mujoco():
    """Undriven cart-pole swing with both trajectories interior to the
    joint limits (the oracle disables limits; ours always enforces them,
    so the comparison must stay away from them)."""
    import dataclasses

    path = asset_path("inverted_pendulum.xml")
    m = load_mjcf(path)
    # zero joint damping on both sides: MuJoCo's Euler integrates damping
    # implicitly, ours explicitly — the integrators coincide only at d=0
    m = dataclasses.replace(m, dof_damping=np.zeros_like(m.dof_damping))
    q0 = np.array([0.0, 0.08])
    v0 = np.zeros(2)
    n = 25
    ours = _roll_ours(m, q0, v0, n, DT)
    theirs = _roll_mujoco(path, q0, v0, n, DT, zero_damping=True)
    assert np.abs(theirs[:, 0]).max() < 0.9, "test setup: cart must stay interior"
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_double_pendulum_free_swing_matches_mujoco():
    """Chaotic double pendulum, damping zeroed on both sides (MuJoCo's
    Euler integrates joint damping implicitly; ours explicitly — identical
    only at d=0). Short horizon: divergence is exponential."""
    import dataclasses

    path = asset_path("inverted_double_pendulum.xml")
    m = load_mjcf(path)
    m = dataclasses.replace(m, dof_damping=np.zeros_like(m.dof_damping))
    q0 = np.array([0.0, 0.1, -0.08])
    v0 = np.zeros(3)
    n = 25
    ours = _roll_ours(m, q0, v0, n, DT)

    mj = mujoco.MjModel.from_xml_path(path)
    mj.dof_damping[:] = 0.0
    mj.opt.timestep = DT
    mj.opt.integrator = mujoco.mjtIntegrator.mjINT_EULER
    mj.opt.gravity[:] = [0, 0, -9.81]
    mj.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT | mujoco.mjtDisableBit.mjDSBL_LIMIT
    )
    d = mujoco.MjData(mj)
    d.qpos[:] = q0
    d.qvel[:] = v0
    theirs = []
    for _ in range(n):
        mujoco.mj_step(mj, d)
        theirs.append(d.qpos.copy())
    theirs = np.stack(theirs)
    assert np.abs(theirs[:, 0]).max() < 0.9
    np.testing.assert_allclose(ours, theirs, atol=5e-3)
