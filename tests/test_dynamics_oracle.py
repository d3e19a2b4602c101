"""Dynamics oracle: our CRBA mass matrix and RNE bias forces vs the MuJoCo
host bindings on the same MJCF (mujoco is a build-time cross-check oracle
only — SURVEY §7 'Environment facts'; the runtime engine is ours).

This replaces the trust we cannot place in Bullet goldens yet (no pybullet
wheel offline, SURVEY §4 blocker): the multibody algorithms are validated
against an independent implementation instead.

dof conventions: ours FREE = [ang_body(3), lin_body(3)]; MuJoCo FREE =
[lin_world(3), ang_body(3)]. Velocities map as v_mj = T(q) v_ours with
T = [[0, R],[I, 0]]; M_ours = T^T M_mj T. Because T depends on q, the bias
picks up a convective term: a_mj = T a_ours + Tdot v_ours with
Tdot = [[0, R [w]x],[0, 0]], so C_ours = T^T (C_mj + M_mj Tdot v_ours).
"""

import numpy as np
import pytest

mujoco = pytest.importorskip("mujoco")

import jax  # noqa: E402

from pybulletgym_tpu.models.assets import asset_path  # noqa: E402
from pybulletgym_tpu.models.mjcf import load_mjcf  # noqa: E402
from pybulletgym_tpu.ops import dynamics as dyn  # noqa: E402

PLANAR = ["hopper", "walker2d", "half_cheetah",
          "inverted_pendulum", "inverted_double_pendulum", "reacher"]
FREE = ["ant", "humanoid"]


def _quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _ours(m, q, v, gravity):
    import jax.numpy as jnp

    qj = [jnp.float64(x) for x in q]
    vj = [jnp.float64(x) for x in v]
    fk = dyn.forward_kinematics(m, qj, vj)
    S6 = dyn.pack_S(m, fk)
    M = np.asarray(dyn.crba_packed(m, fk, S6))
    C = np.asarray(dyn.bias_packed(m, fk, tuple(gravity), S6))
    return M, C


def _compare(name, free_root):
    path = asset_path(name + ".xml")
    m = load_mjcf(path)
    mj = mujoco.MjModel.from_xml_path(path)
    d = mujoco.MjData(mj)
    rng = np.random.default_rng(0)

    q = np.array(m.qpos0, float)
    v_ours = rng.uniform(-1.0, 1.0, m.nv)
    if free_root:
        q[0:3] += rng.uniform(-0.1, 0.1, 3)
        quat = rng.normal(size=4)
        q[3:7] = quat / np.linalg.norm(quat)
        q[7:] += rng.uniform(-0.3, 0.3, m.nq - 7)
        T = np.eye(m.nv)
        R = _quat_mat(q[3:7])
        T[0:3, 0:3] = 0.0
        T[3:6, 3:6] = 0.0
        T[0:3, 3:6] = R
        T[3:6, 0:3] = np.eye(3)
    else:
        q += rng.uniform(-0.3, 0.3, m.nq)
        T = np.eye(m.nv)

    d.qpos[:] = q
    d.qvel[:] = T @ v_ours
    mujoco.mj_forward(mj, d)
    Mmj = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, Mmj)

    Tdot = np.zeros((m.nv, m.nv))
    if free_root:
        w = v_ours[0:3]
        skew = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
        Tdot[0:3, 3:6] = T[0:3, 3:6] @ skew

    M, C = _ours(m, q, v_ours, mj.opt.gravity)
    np.testing.assert_allclose(M, T.T @ Mmj @ T, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        C, T.T @ (d.qfrc_bias + Mmj @ Tdot @ v_ours), atol=1e-6, rtol=1e-6
    )


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("name", PLANAR)
def test_planar_models_match_mujoco(name):
    _compare(name, free_root=False)


@pytest.mark.parametrize("name", FREE)
def test_free_root_models_match_mujoco(name):
    _compare(name, free_root=True)
