"""Reachability analysis of self-collision plans (VERDICT r4 item 6).

The round-4 verdict proposed pruning the humanoid's static self-collision
pair plan by joint-limit reachability. `ops.contacts.prune_pairs_by_reach`
implements the conservative interval-FK ball bound; `tools/reach_study.py`
samples ground truth. The investigation's RESULT (recorded here as tests):
every one of the humanoid's 66 non-ancestor pairs can genuinely reach
contact inside the (softly enforced, hence widened) joint-limit box — the
sampled minimum separation is negative for all of them — so the plan is
already minimal and the round-5 perf work went into the square-root-space
PGS instead (ops/contacts.py · solve_scalar/solve_packed).

These tests pin both sides: the bound must never prune a reachable pair
(humanoid), and must actually prune when pairs are provably unreachable
(toy chain), so the tool stays sound for future models.
"""

import numpy as np
import pytest

from pybulletgym_tpu.models.schema import (
    Body, Geom, GeomType, JointType, Model,
)
from pybulletgym_tpu.ops.contacts import (
    full_self_collision_pairs, prune_pairs_by_reach, reach_bound_balls, _lca,
)


def _mk_body(name, parent, jaxis, jrange, pos, jpos=(0, 0, 0)):
    return Body(
        name=name, parent=parent, jtype=JointType.HINGE,
        pos=np.asarray(pos, float), quat=np.array([1.0, 0, 0, 0]),
        jpos=np.asarray(jpos, float), jaxis=np.asarray(jaxis, float),
        jref=0.0, q_adr=0, v_adr=0, mass=1.0, com=np.zeros(3),
        inertia=np.eye(3),
    )


def _toy_model(limit_deg):
    """Root body with two hinge fingers pointing +x and -x; each carries a
    tip sphere. With tiny joint ranges the tips can never meet; with huge
    ranges they can fold onto each other."""
    import dataclasses

    rad = np.deg2rad(limit_deg)
    bodies = (
        dataclasses.replace(
            _mk_body("root", -1, (0, 0, 1), None, (0, 0, 0)),
            jtype=JointType.FREE, q_adr=0, v_adr=0,
        ),
        dataclasses.replace(
            _mk_body("f1", 0, (0, 0, 1), None, (1.0, 0, 0)), q_adr=7, v_adr=6
        ),
        dataclasses.replace(
            _mk_body("f2", 0, (0, 0, 1), None, (-1.0, 0, 0)), q_adr=8, v_adr=7
        ),
    )
    geoms = (
        Geom("tip1", 1, GeomType.SPHERE, np.array([0.05]),
             np.array([1.1, 0, 0.0]), np.array([1.0, 0, 0, 0]), 0.8, 1, 1),
        Geom("tip2", 2, GeomType.SPHERE, np.array([0.05]),
             np.array([-1.1, 0, 0.0]), np.array([1.0, 0, 0, 0]), 0.8, 1, 1),
    )
    jnt_limited = np.array([False] * 6 + [True, True])
    jnt_range = np.zeros((8, 2))
    jnt_range[6] = (-rad, rad)
    jnt_range[7] = (-rad, rad)
    return Model(
        name="toy", bodies=bodies, nq=9, nv=8, qpos0=np.zeros(9),
        dof_armature=np.zeros(8), dof_damping=np.zeros(8),
        dof_stiffness=np.zeros(8), dof_springref=np.zeros(8),
        jnt_limited=jnt_limited, jnt_range=jnt_range, geoms=geoms,
        actuators=(), frames={}, sites={}, opt_timestep=0.01,
        opt_gravity=np.array([0, 0, -9.8]),
        body_dofs=(tuple(range(6)), (6,), (7,)),
        ancestor_dofs=(tuple(range(6)), tuple(range(7)),
                       tuple(range(6)) + (7,)),
        joint_names=("j1", "j2"), dof_body=(0,) * 6 + (1, 2),
    )


def test_toy_prunes_when_unreachable():
    m = _toy_model(limit_deg=10.0)
    kept, pruned = prune_pairs_by_reach(m, (("tip1", "tip2"),))
    assert pruned == (("tip1", "tip2"),), (kept, pruned)


def test_toy_keeps_when_reachable():
    # 170 deg: the fingers fold toward each other and the tips can meet
    m = _toy_model(limit_deg=170.0)
    kept, pruned = prune_pairs_by_reach(m, (("tip1", "tip2"),))
    assert kept == (("tip1", "tip2"),), (kept, pruned)


def test_toy_bound_is_conservative_vs_sampling():
    """The interval bound must enclose every sampled FK placement."""
    m = _toy_model(limit_deg=45.0)
    g = m.geoms[0]
    balls = reach_bound_balls(m, g, lca=0)
    assert balls is not None and len(balls) == 1
    c, r = balls[0]
    # sample the widened box (same slack as the bound's default)
    lo, hi = m.jnt_range[6]
    pad = 0.2 * (hi - lo) + 0.15
    for th in np.linspace(lo - pad, hi + pad, 101):
        ct, st = np.cos(th), np.sin(th)
        # finger1: body at (1,0,0), hinge about z at body origin
        tip = np.array([1.0, 0, 0]) + np.array(
            [1.1 * ct, 1.1 * st, 0.0]
        )
        assert np.linalg.norm(tip - c) <= r - 0.05 + 1e-9, th


@pytest.mark.slow
def test_humanoid_plan_is_minimal():
    """Ground truth: every humanoid pair reaches contact somewhere in the
    widened joint box, so the pruner must keep all 66 (sampled minima are
    all negative — tools/reach_study.py, 100k samples, round 5)."""
    import pybulletgym_tpu as pg

    t = pg.make_task("HumanoidPyBulletEnv-v0")
    pairs = t.physics.solver.self_collision_pairs
    assert len(pairs) == 66
    kept, pruned = prune_pairs_by_reach(t.model, pairs)
    assert pruned == ()
    # and the generator still agrees with the model
    assert set(pairs) == set(full_self_collision_pairs(t.model))


def test_lca():
    m = _toy_model(10.0)
    assert _lca(m, 1, 2) == 0
    assert _lca(m, 1, 1) == 1
    assert _lca(m, 0, 2) == 0
