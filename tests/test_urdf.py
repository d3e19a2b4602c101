"""URDF importer: the same double pendulum authored in URDF and MJCF must
produce identical dynamics through the shared build pipeline
(replacement surface for Bullet's p.loadURDF [ref: robot_bases.py ·
URDFBasedRobot; SURVEY §2.2])."""

import numpy as np
import pytest

import jax.numpy as jnp

from pybulletgym_tpu.models.mjcf import parse_mjcf
from pybulletgym_tpu.models.urdf import parse_urdf
from pybulletgym_tpu.ops import dynamics as dyn

URDF = """
<robot name="dpend">
  <link name="base"/>
  <link name="link1">
    <collision><origin xyz="0 0 -0.25"/>
      <geometry><capsule radius="0.05" length="0.5"/></geometry>
    </collision>
  </link>
  <link name="link2">
    <collision><origin xyz="0 0 -0.2"/>
      <geometry><capsule radius="0.04" length="0.4"/></geometry>
    </collision>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="link1"/>
    <origin xyz="0 0 1"/><axis xyz="0 1 0"/>
    <limit lower="-2.0" upper="2.0" effort="50"/>
    <dynamics damping="0.1"/>
  </joint>
  <joint name="j2" type="continuous">
    <parent link="link1"/><child link="link2"/>
    <origin xyz="0 0 -0.5"/><axis xyz="0 1 0"/>
    <limit effort="25"/>
  </joint>
</robot>
"""

MJCF = """
<mujoco model="dpend">
  <compiler angle="radian"/>
  <worldbody>
    <body name="link1" pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" range="-2.0 2.0"
             limited="true" damping="0.1"/>
      <geom name="g1" type="capsule" fromto="0 0 0 0 0 -0.5" size="0.05"/>
      <body name="link2" pos="0 0 -0.5">
        <joint name="j2" type="hinge" axis="0 1 0"/>
        <geom name="g2" type="capsule" fromto="0 0 0 0 0 -0.4" size="0.04"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j1" gear="50"/>
    <motor joint="j2" gear="25"/>
  </actuator>
</mujoco>
"""


def _mc(model, q, v):
    qj = [jnp.float32(x) for x in q]
    vj = [jnp.float32(x) for x in v]
    fk = dyn.forward_kinematics(model, qj, vj)
    S6 = dyn.pack_S(model, fk)
    M = np.asarray(dyn.crba_packed(model, fk, S6))
    C = np.asarray(dyn.bias_packed(model, fk, (0.0, 0.0, -9.81), S6))
    return M, C


def test_urdf_matches_mjcf_dynamics():
    mu = parse_urdf(URDF)
    mm = parse_mjcf(MJCF)
    assert mu.nq == mm.nq == 2 and mu.nv == mm.nv == 2
    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, 2)
    v = rng.uniform(-1, 1, 2)
    Mu, Cu = _mc(mu, q, v)
    Mm, Cm = _mc(mm, q, v)
    np.testing.assert_allclose(Mu, Mm, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(Cu, Cm, rtol=1e-5, atol=1e-6)


def test_urdf_structure():
    m = parse_urdf(URDF)
    assert [a.joint for a in m.actuators] == ["j1", "j2"]
    assert [a.gear for a in m.actuators] == [50.0, 25.0]
    assert m.jnt_limited[m.dof_index("j1")]
    assert not m.jnt_limited[m.dof_index("j2")]
    np.testing.assert_allclose(m.jnt_range[m.dof_index("j1")], [-2.0, 2.0])
    np.testing.assert_allclose(m.dof_damping, [0.1, 0.0])


def test_urdf_explicit_inertial_overrides_geoms():
    urdf = URDF.replace(
        '<link name="link2">',
        '<link name="link2">\n'
        '    <inertial><origin xyz="0 0 -0.2"/><mass value="7.5"/>'
        '<inertia ixx="0.2" iyy="0.2" izz="0.01" ixy="0" ixz="0" iyz="0"/>'
        "</inertial>",
    )
    m = parse_urdf(urdf)
    b2 = m.bodies[m.body_index("link2")]
    np.testing.assert_allclose(b2.mass, 7.5)
    np.testing.assert_allclose(np.diag(b2.inertia), [0.2, 0.2, 0.01])


def test_urdf_free_root():
    m = parse_urdf(URDF, root_free=True)
    # base link mounts on a free joint: +7 qpos / +6 dofs
    assert m.nq == 2 + 7 and m.nv == 2 + 6
