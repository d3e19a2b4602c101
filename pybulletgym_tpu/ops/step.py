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

        # One batched FORWARD substitution for qdd + every constraint row:
        # the PGS runs in Cholesky square-root space (see ct.solve_packed),
        # so constraint rows need y = L⁻¹Jᵀ only, and a single back
        # substitution afterwards recovers (v, v_pseudo) — half the
        # triangular-solve work of full M⁻¹Jᵀ per row.
        cols = [rhs_dyn.T[..., None]]                    # (B, nv, 1)
        if pc is not None:
            cols.append(jnp.transpose(J.reshape(3 * R, model.nv, B), (2, 1, 0)))
        if lim is not None:
            cols.append(jnp.broadcast_to(jnp.asarray(onehots), (B, model.nv, L)))
        RHS = jnp.concatenate(cols, axis=-1)
        with jax.named_scope("cholesky_solve"):
            Lc = dyn.factorize(M)
            Y = dyn.solve_fwd(Lc, RHS)                   # (B, nv, K)
        y_dyn = Y[..., 0].T                              # (nv, B) = L⁻¹ rhs
        ofs = 1
        y_sol = None
        if pc is not None:
            y_sol = jnp.transpose(Y[..., ofs : ofs + 3 * R], (2, 1, 0)).reshape(
                R, 3, model.nv, B
            )
            ofs += 3 * R
        y_lim = None
        if lim is not None:
            y_lim = jnp.transpose(Y[..., ofs : ofs + L], (2, 1, 0))  # (L, nv, B)

        if pc is not None or lim is not None:
            # z = Lᵀ v2 = Lᵀ v + dt · L⁻¹ rhs. The matvec unrolls over nv
            # as elementwise ops so the accumulation order is identical for
            # every batch shard — a dot_general contraction here broke the
            # {1,8}-device bitwise-hash matrix (tests/test_determinism.py).
            z = cfg.timestep * y_dyn
            for i in range(model.nv):
                z = z + jnp.transpose(Lc[:, i, :]) * v[i]
            with jax.named_scope("pgs_solver"):
                z3, zp, _ = ct.solve_packed(
                    cfg.solver, cfg.timestep, z, q, pc, y_sol, lim, y_lim
                )
            with jax.named_scope("back_substitute"):
                X = dyn.solve_back(Lc, jnp.stack([z3.T, zp.T], axis=-1))
            v3, vp = X[..., 0].T, X[..., 1].T
        else:
            qdd = dyn.solve_back(Lc, Y[..., :1])[..., 0].T
            v3, vp = v + cfg.timestep * qdd, jnp.zeros_like(v)
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
        rhs, L, inv_diag = dyn.rhs_and_factor(
            model, fk, q, v, list(tau), cfg.gravity
        )
        # square-root-space contact solve (see ct.solve_scalar): constraint
        # rows forward-solve only; ONE back substitution recovers v/vp.
        y_dyn = dyn.chol_solve_fwd(L, inv_diag, rhs)
        sc = ct.narrowphase_scalar(model, fk, plan)
        if sc is not None or lim is not None:
            zv = dyn.lt_matvec(L, v)
            z = []
            for d in range(model.nv):
                t = zv[d]
                if not _is0f(y_dyn[d]):
                    dy = cfg.timestep * y_dyn[d]
                    t = dy if _is0f(t) else t + dy
                z.append(t)
            y_rows = y_lim = None
            if sc is not None:
                J = ct.scalar_jacobians(model, fk, sc)
                y_rows = [
                    tuple(dyn.chol_solve_fwd(L, inv_diag, Jd) for Jd in row)
                    for row in J
                ]
            if lim is not None:
                y_lim = []
                for i in range(lim.dof.shape[0]):
                    e = [0.0] * model.nv
                    e[int(lim.dof[i])] = 1.0
                    y_lim.append(dyn.chol_solve_fwd(L, inv_diag, e))
            z3, zp, _ = ct.solve_scalar(
                model, cfg.solver, cfg.timestep, sc, y_rows, lim, y_lim, q, z
            )
            v3 = dyn.chol_solve_back(L, inv_diag, z3)
            vp = dyn.chol_solve_back(L, inv_diag, zp)
        else:
            qdd = dyn.chol_solve_back(L, inv_diag, y_dyn)
            v3 = [
                v[d] + cfg.timestep * qdd[d] if not _is0f(qdd[d]) else v[d]
                for d in range(model.nv)
            ]
            vp = [0.0] * model.nv
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
