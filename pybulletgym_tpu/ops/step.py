"""Fused physics stepping: substep = dynamics + contacts + integrate.

Replaces the reference's `scene.global_step()` -> `p.stepSimulation()`
(one C++ call doing frame_skip substeps [ref: scene_bases.py · World.step]):
here the whole control step — frame_skip × (FK -> forward dynamics -> PGS
contact/limit solve -> semi-implicit Euler) — is ONE traced function with a
`lax.scan` over substeps, so a batched rollout has zero host crossings
(contrast the ~3n+5 Python↔C++ crossings per step in the reference,
SURVEY §3.3).

State layout at this API boundary: stacked batch-trailing arrays —
``q: (nq, B)``, ``v: (nv, B)``, ``tau: (nv, B)`` — so the batch axis B sits
in the TPU lane dimension for every elementwise op and is the natural axis
to shard over a device mesh. Torques are held constant across substeps,
matching Bullet's motor semantics
[ref: robot_bases.py · Joint.set_motor_torque].
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.models.schema import JointType, Model
from pybulletgym_tpu.ops import contacts as ct
from pybulletgym_tpu.ops import dynamics as dyn
from pybulletgym_tpu.ops import smath as sm


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """Timing per the reference scene contract
    [ref: scene_bases.py · Scene]: walkers run
    fixedTimeStep=0.0165, numSubSteps=4 (physics dt 4.125 ms);
    pendula/manipulators run timestep=0.0165, frame_skip=1."""

    timestep: float = 0.0165 / 4
    frame_skip: int = 4
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.8)
    solver: ct.SolverConfig = dataclasses.field(default_factory=ct.SolverConfig)
    # Bullet clamps every multibody dof velocity to
    # btMultiBody::m_maxCoordinateVelocity = 100 (rad/s or m/s) each step;
    # without it an undamped pendulum spun up by random torque accelerates
    # until float32 absorption freezes the trajectory entirely.
    max_velocity: float = 100.0

    @property
    def control_dt(self) -> float:
        return self.timestep * self.frame_skip


def _passive_tables(model: Model):
    """(damping, stiffness, springref, q-index-per-dof, stiffness mask)."""
    qmap = np.zeros(model.nv, dtype=np.int32)
    smask = np.zeros(model.nv, dtype=np.float32)
    for b in model.bodies:
        if b.jtype != JointType.FREE:
            qmap[b.v_adr] = b.q_adr
            smask[b.v_adr] = 1.0
    return (
        model.dof_damping.astype(np.float32)[:, None],
        (model.dof_stiffness.astype(np.float32) * smask)[:, None],
        model.dof_springref.astype(np.float32)[:, None],
        qmap,
    )


def _free_bodies(model: Model):
    return [b for b in model.bodies if b.jtype == JointType.FREE]


def make_substep(model: Model, cfg: PhysicsConfig):
    plan = ct.build_contact_plan(model, cfg.solver)
    lim = ct.build_limit_plan(model)
    R = ct.plan_rows(plan)
    L = 0 if lim is None else lim.dof.shape[0]
    damp, stiff, sref, qmap = _passive_tables(model)
    frees = _free_bodies(model)
    no_free = not frees
    if no_free:
        assert model.nq == model.nv
    # limit one-hot RHS columns (nv, L)
    onehots = np.zeros((model.nv, L), dtype=np.float32)
    for i in range(L):
        onehots[lim.dof[i], i] = 1.0

    def substep(q, v, tau):
        """One physics substep on stacked arrays. Returns (q', v', depths)
        with depths (R, B) — the `p.getContactPoints` replacement.

        Phases carry jax.named_scope so jax.profiler traces attribute time
        to dynamics/collision/solver (SURVEY §5 tracing plan — the
        reference has no profiling hooks at all)."""
        B = q.shape[-1]
        q_s = [q[i] for i in range(model.nq)]
        v_s = [v[i] for i in range(model.nv)]
        with jax.named_scope("fk_dynamics"):
            fk = dyn.forward_kinematics(model, q_s, v_s)
            S6 = dyn.pack_S(model, fk)                       # (nv, 6, B)
            M = dyn.crba_packed(model, fk, S6)               # (B, nv, nv)
            C = dyn.bias_packed(model, fk, cfg.gravity, S6)  # (nv, B)
        taup = -jnp.asarray(damp) * v - jnp.asarray(stiff) * (q[qmap] - jnp.asarray(sref))
        rhs_dyn = tau + taup - C                         # (nv, B)

        with jax.named_scope("narrowphase"):
            pc = ct.narrowphase(model, fk, plan)
        J = ct.contact_jacobians(model, S6, pc) if pc is not None else None

        # One batched Cholesky solve for qdd + every constraint row.
        cols = [rhs_dyn.T[..., None]]                    # (B, nv, 1)
        if pc is not None:
            cols.append(jnp.transpose(J.reshape(3 * R, model.nv, B), (2, 1, 0)))
        if lim is not None:
            cols.append(jnp.broadcast_to(jnp.asarray(onehots), (B, model.nv, L)))
        RHS = jnp.concatenate(cols, axis=-1)
        with jax.named_scope("cholesky_solve"):
            Lc = dyn.factorize(M)
            X = dyn.solve_factored(Lc, RHS)              # (B, nv, K)
        qdd = X[..., 0].T                                # (nv, B)
        ofs = 1
        w_sol = None
        if pc is not None:
            w_sol = jnp.transpose(X[..., ofs : ofs + 3 * R], (2, 1, 0)).reshape(
                R, 3, model.nv, B
            )
            ofs += 3 * R
        w_lim = None
        if lim is not None:
            w_lim = jnp.transpose(X[..., ofs : ofs + L], (2, 1, 0))  # (L, nv, B)

        v2 = v + cfg.timestep * qdd
        if pc is not None or lim is not None:
            with jax.named_scope("pgs_solver"):
                v3, vp, _ = ct.solve_packed(
                    cfg.solver, cfg.timestep, v2, q, pc, J, w_sol, lim, w_lim
                )
        else:
            v3, vp = v2, jnp.zeros_like(v2)
        v3 = jnp.clip(v3, -cfg.max_velocity, cfg.max_velocity)

        # split impulse: pseudo-velocities only enter the position integral
        with jax.named_scope("integrate"):
            q2 = _integrate(q, v3 + vp)
        depths = pc.depth if pc is not None else jnp.zeros((0, B), q.dtype)
        return q2, v3, depths

    def _integrate(q, v_pos):
        # hinge/slide-only models: q and v addresses coincide
        if no_free:
            return q + cfg.timestep * v_pos
        return _integrate_mixed(q, v_pos)

    def _integrate_mixed(q, v_pos):
        hs_q, hs_v = [], []
        for b in model.bodies:
            if b.jtype != JointType.FREE:
                hs_q.append(b.q_adr)
                hs_v.append(b.v_adr)
        q2 = q
        if hs_q:
            q2 = q2.at[np.array(hs_q)].add(cfg.timestep * v_pos[np.array(hs_v)])
        dt = cfg.timestep
        for b in frees:
            qa, va = b.q_adr, b.v_adr
            quat = (q[qa + 3], q[qa + 4], q[qa + 5], q[qa + 6])
            Rm = sm.m3_from_quat(quat)
            w_world = sm.m3_vec(Rm, (v_pos[va], v_pos[va + 1], v_pos[va + 2]))
            v_world = sm.m3_vec(Rm, (v_pos[va + 3], v_pos[va + 4], v_pos[va + 5]))
            nquat = sm.quat_integrate(quat, w_world, dt)
            upd = jnp.stack(
                [
                    q[qa] + dt * v_world[0],
                    q[qa + 1] + dt * v_world[1],
                    q[qa + 2] + dt * v_world[2],
                    nquat[0], nquat[1], nquat[2], nquat[3],
                ],
                0,
            )
            q2 = jax.lax.dynamic_update_slice_in_dim(q2, upd, qa, axis=0)
        return q2

    return substep, plan, R


def make_substep_scalar(model: Model, cfg: PhysicsConfig):
    """Fully-scalar substep over SoA lists — the Pallas-kernel body.

    Identical math to `make_substep`, but every loop (Cholesky, constraint
    rows, PGS iterations) unrolls at trace time into straight-line vector
    code: inside a Pallas kernel each op is one VPU instruction on a
    (8, 128) env tile, with no XLA fusion-recompute or loop-trip overhead.

    substep(q_list, v_list, tau_list) -> (q', v', depths_list)
    """
    plan = ct.build_contact_plan(model, cfg.solver)
    lim = ct.build_limit_plan(model)

    def substep(q, v, tau):
        q, v = list(q), list(v)
        fk = dyn.forward_kinematics(model, q, v)
        qdd, L, inv_diag = dyn.fwd_dynamics(model, fk, q, v, list(tau), cfg.gravity)
        v2 = [
            v[d] + cfg.timestep * qdd[d] if not _is0f(qdd[d]) else v[d]
            for d in range(model.nv)
        ]
        sc = ct.narrowphase_scalar(model, fk, plan)
        J = w_rows = w_lim = None
        if sc is not None:
            J = ct.scalar_jacobians(model, fk, sc)
            w_rows = [
                tuple(dyn.chol_solve(L, inv_diag, Jd) for Jd in row) for row in J
            ]
        if lim is not None:
            w_lim = []
            for i in range(lim.dof.shape[0]):
                rhs = [0.0] * model.nv
                rhs[int(lim.dof[i])] = 1.0
                w_lim.append(dyn.chol_solve(L, inv_diag, rhs))
        if sc is not None or lim is not None:
            v3, vp, _ = ct.solve_scalar(
                model, cfg.solver, cfg.timestep, sc, J, w_rows, lim, w_lim, q, v2
            )
        else:
            v3, vp = v2, [0.0] * model.nv
        v3 = [
            vd if _is0f(vd) else jnp.clip(vd, -cfg.max_velocity, cfg.max_velocity)
            for vd in v3
        ]
        v_pos = [
            v3[d] + vp[d] if not _is0f(vp[d]) else v3[d] for d in range(model.nv)
        ]
        q2 = dyn.integrate(model, q, v_pos, cfg.timestep)
        depths = list(sc.depth) if sc is not None else []
        return q2, v3, depths

    return substep, plan, (len(sc_rows(plan)))


def sc_rows(plan):
    floor_cands, pair_cands = plan
    out = []
    for c in floor_cands:
        out.extend([c] * (4 if c.kind == "disk" else 1))
    out.extend(pair_cands)
    return out


def _is0f(x):
    return isinstance(x, float) and x == 0.0


def make_physics_step(model: Model, cfg: PhysicsConfig):
    """Control step: frame_skip substeps under lax.scan with held torques.

    step(q (nq,B), v (nv,B), tau (nv,B)) -> (q', v', depths_last (R,B))
    """
    substep, plan, R = make_substep(model, cfg)

    if cfg.frame_skip == 1:
        return substep, plan, R

    def step(q, v, tau):
        zero_depths = jnp.zeros((R, q.shape[-1]), q.dtype)

        def body(carry, _):
            cq, cv, _ = carry
            return substep(cq, cv, tau), None

        (q2, v2, depths), _ = jax.lax.scan(
            body, (q, v, zero_depths), None, length=cfg.frame_skip
        )
        return q2, v2, depths

    return step, plan, R
