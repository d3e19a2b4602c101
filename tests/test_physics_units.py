"""Physics unit tests prescribed by SURVEY §4 (implication 4): energy
behavior of a free pendulum, restitution of a bouncing sphere, and the
friction cone of a sliding box. These validate the integrator and the
contact solver against first-principles mechanics, independent of any
oracle or recorded fixture.

Reference analogue: Bullet's own btMultiBody unit tests; the reference
repo itself ships no physics unit tests (SURVEY §4 "Reference testing is
thin"), so these are part of the must-exceed surface.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.models.mjcf import load_mjcf
from pybulletgym_tpu.ops import dynamics as dyn
from pybulletgym_tpu.ops.contacts import SolverConfig
from pybulletgym_tpu.ops.step import PhysicsConfig, make_physics_step

G = 9.8

PENDULUM_XML = """
<mujoco model="unit_pendulum">
  <compiler angle="radian"/>
  <worldbody>
    <body name="pole" pos="0 0 1.5">
      <joint name="pin" type="hinge" axis="0 1 0"/>
      <geom name="rod" type="capsule" fromto="0 0 0 0 0 -0.8" size="0.04"/>
    </body>
  </worldbody>
</mujoco>
"""

SPHERE_XML = """
<mujoco model="unit_sphere">
  <compiler angle="radian"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1"/>
    </body>
  </worldbody>
</mujoco>
"""

BOX_XML = """
<mujoco model="unit_box">
  <compiler angle="radian"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="slab" pos="0 0 0.0499">
      <freejoint/>
      <geom name="slab" type="box" size="0.2 0.2 0.05"/>
    </body>
  </worldbody>
</mujoco>
"""


def _model(tmp_path, xml, name):
    p = tmp_path / f"{name}.xml"
    p.write_text(xml)
    return load_mjcf(str(p))


def _rollout(m, cfg, q0, v0, n):
    """Jitted scan rollout with zero torque; returns (n, nq), (n, nv)."""
    step, _, _ = make_physics_step(m, cfg)
    q = jnp.asarray(q0, jnp.float32)[:, None]
    v = jnp.asarray(v0, jnp.float32)[:, None]
    tau = jnp.zeros_like(v)

    def body(carry, _):
        cq, cv = carry
        nq_, nv_, _ = step(cq, cv, tau)
        return (nq_, nv_), (nq_[:, 0], nv_[:, 0])

    (_, _), (qs, vs) = jax.jit(
        lambda q, v: jax.lax.scan(body, (q, v), None, length=n)
    )(q, v)
    return np.asarray(qs), np.asarray(vs)


def test_free_pendulum_energy_bounded(tmp_path):
    """An undriven, undamped pendulum under semi-implicit Euler must keep
    total mechanical energy bounded (oscillating O(dt), no secular drift).
    Energy is computed from the engine's own mass matrix and FK COM
    heights, so this checks integrator + CRBA + FK jointly."""
    m = _model(tmp_path, PENDULUM_XML, "pend")
    cfg = PhysicsConfig(timestep=0.004, frame_skip=1,
                        gravity=(0.0, 0.0, -G), solver=SolverConfig())
    n = 500
    q0, v0 = np.array([2.2]), np.array([0.0])
    qs, vs = _rollout(m, cfg, q0, v0, n)

    def energy(q, v):
        ql = [q[i] for i in range(m.nq)]
        vl = [v[i] for i in range(m.nv)]
        fk = dyn.forward_kinematics(m, ql, vl)
        S6 = dyn.pack_S(m, fk)
        M = dyn.crba_packed(m, fk, S6)
        vv = jnp.stack(vl)
        ke = 0.5 * vv @ M @ vv
        pe = sum(b.mass * G * fk.com[i][2]
                 for i, b in enumerate(m.bodies))
        return ke + pe

    E = np.array([jax.jit(energy)(qs[t], vs[t]) for t in (0, n // 4, n // 2,
                                                          3 * n // 4, n - 1)])
    mass = sum(b.mass for b in m.bodies)
    scale = mass * G * 0.8  # m·g·L
    assert np.all(np.isfinite(E))
    np.testing.assert_allclose(E, E[0], atol=0.02 * scale)
    # sanity: it actually swings (exchanges PE<->KE), not frozen
    assert np.abs(vs).max() > 1.0


def test_sphere_restitution_coefficient(tmp_path):
    """A sphere dropped on the plane rebounds with |v'| ≈ e·|v|, then
    settles to rest at z = radius once impacts drop below the restitution
    threshold. e is the Bullet-style multiplicative combination of the
    floor's 0.5 and the body's restitution — robots keep Bullet's body
    default 0 (no bounce); this test gives the ball restitution 1 so the
    combined e is the stadium-ground 0.5."""
    m = _model(tmp_path, SPHERE_XML, "sphere")
    sc = SolverConfig(geom_restitution=1.0)
    cfg = PhysicsConfig(timestep=0.004, frame_skip=1,
                        gravity=(0.0, 0.0, -G), solver=sc)
    n = 500  # 2.0 s: drop (0.29 s), several bounces, settle
    q0 = np.array([0.0, 0.0, 0.5, 1.0, 0.0, 0.0, 0.0])
    v0 = np.zeros(6)
    qs, vs = _rollout(m, cfg, q0, v0, n)
    z = qs[:, 2]
    vz = vs[:, 5]  # free-joint dofs: [ang(3), lin(3)], body≈world (no spin)

    # first impact: most negative vertical velocity of the first descent
    t_imp = int(np.argmin(vz[: n // 2]))
    v_in = -vz[t_imp]
    v_out = vz[t_imp: t_imp + 12].max()
    assert v_in > 2.0, f"sphere never fell (v_in={v_in})"
    ratio = v_out / v_in
    assert 0.35 < ratio < 0.65, (
        f"restitution ratio {ratio:.3f} far from e={sc.restitution}"
    )
    # bounces decay: apex after first bounce ≈ e²·h₀, well below the drop
    apex1 = z[t_imp: t_imp + 150].max()
    assert 0.1 < apex1 < 0.35, f"first-bounce apex {apex1:.3f}"
    # settles on the plane: resting height = radius, bounded penetration
    assert abs(z[-1] - 0.1) < 0.02, f"final z {z[-1]:.4f} != radius"
    assert z.min() > 0.1 - 0.03, f"penetration {0.1 - z.min():.4f} too deep"
    assert abs(vz[-1]) < 0.05


def test_box_sliding_friction_cone(tmp_path):
    """A flat box sliding on the plane decelerates at ≈ μ·g (μ = 0.8, the
    Bullet stadium lateral friction) and comes to rest without reversing —
    the friction impulse stays inside the cone instead of overshooting."""
    m = _model(tmp_path, BOX_XML, "box")
    sc = SolverConfig()
    cfg = PhysicsConfig(timestep=0.004, frame_skip=1,
                        gravity=(0.0, 0.0, -G), solver=sc)
    n = 200  # 0.8 s; analytic stop at v0/(μg) = 0.26 s
    q0 = np.array([0.0, 0.0, 0.0499, 1.0, 0.0, 0.0, 0.0])
    v0 = np.zeros(6)
    v0[3] = 2.0  # body-frame x == world x at identity orientation
    qs, vs = _rollout(m, cfg, q0, v0, n)
    vx = vs[:, 3]
    dt = cfg.timestep

    # measured deceleration while solidly sliding (skip contact onset)
    t0, t1 = 10, 50
    decel = (vx[t0] - vx[t1]) / ((t1 - t0) * dt)
    mu_g = sc.floor_friction * G
    assert abs(decel - mu_g) < 0.25 * mu_g, (
        f"sliding decel {decel:.2f} vs μg {mu_g:.2f}"
    )
    # stops and stays stopped: no friction reversal, no residual creep
    assert abs(vx[-1]) < 0.05, f"box still moving: vx={vx[-1]:.3f}"
    assert vx.min() > -0.05, f"friction reversed the motion: {vx.min():.3f}"
    # never spun up: pure translation problem stays translational
    assert np.abs(vs[:, :3]).max() < 0.5, "box picked up spurious rotation"
