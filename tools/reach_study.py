"""Ground-truth reachability study for self-collision pair pruning.

Samples the (widened) joint-limit box with a vectorized numpy FK mirror of
ops.dynamics.forward_kinematics (hinge/slide conventions identical: static
pos/quat offset, then rotation about jaxis through jpos by q - jref) and
reports, per self-collision pair, the minimum capsule-capsule distance seen.
Pairs with a large sampled floor are candidates for compile-time pruning;
`ops.contacts.prune_pairs_by_reach` must then PROVE them with its interval
bound (this script is evidence, not proof).

Usage: python tools/reach_study.py HumanoidPyBulletEnv-v0 [--samples 200000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def quat_to_mat(qn):
    w, x, y, z = [float(t) for t in qn]
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def rodrigues_batch(u, th):
    """(N,3,3) rotation about unit axis u (3,) by angles th (N,)."""
    N = th.shape[0]
    K = np.array([
        [0.0, -u[2], u[1]],
        [u[2], 0.0, -u[0]],
        [-u[1], u[0], 0.0],
    ])
    s, c = np.sin(th), np.cos(th)
    eye = np.eye(3)[None]
    return eye + s[:, None, None] * K[None] + (1 - c)[:, None, None] * (K @ K)[None]


def fk_batch(model, q):
    """q: (N, nq) -> per-body (R (N,3,3), p (N,3)). Free root at identity
    (self-collision distances are base-invariant)."""
    from pybulletgym_tpu.models.schema import JointType

    N = q.shape[0]
    Rs, ps = [], []
    for b in model.bodies:
        if b.parent == -1:
            Rp = np.broadcast_to(np.eye(3), (N, 3, 3))
            pp = np.zeros((N, 3))
        else:
            Rp, pp = Rs[b.parent], ps[b.parent]
        off_r = quat_to_mat(b.quat)
        R0 = Rp @ off_r[None]
        p0 = pp + (Rp @ b.pos[:, None])[..., 0]
        if b.jtype == JointType.HINGE:
            th = q[:, b.q_adr] - b.jref
            a = p0 + (R0 @ b.jpos[:, None])[..., 0]
            u_w = R0 @ (b.jaxis / np.linalg.norm(b.jaxis))
            # rotate in the local F0 frame instead: R_i = R0 @ Rloc
            Rloc = rodrigues_batch(b.jaxis / np.linalg.norm(b.jaxis), th)
            Ri = R0 @ Rloc
            # p_i = a + Rj @ (p0 - a) with Rj about world axis; equivalently
            # p_i = p0 + R0 @ (jpos - Rloc @ jpos)
            jp = b.jpos
            pi = p0 + (R0 @ (jp[None, :, None] - Rloc @ jp[None, :, None]))[..., 0]
            del u_w, a
        elif b.jtype == JointType.SLIDE:
            u = b.jaxis / np.linalg.norm(b.jaxis)
            Ri = R0
            pi = p0 + (R0 @ u[:, None])[..., 0] * (q[:, b.q_adr] - b.jref)[:, None]
        else:  # FREE — identity (relative distances only)
            Ri, pi = R0, p0
        Rs.append(Ri)
        ps.append(pi)
    return Rs, ps


def seg_of_geom(g):
    from pybulletgym_tpu.models.schema import GeomType

    if g.gtype == GeomType.SPHERE:
        return g.pos.copy(), g.pos.copy(), float(g.size[0])
    axis = quat_to_mat(g.quat) @ np.array([0.0, 0.0, 1.0])
    hl, r = float(g.size[1]), float(g.size[0])
    return g.pos + hl * axis, g.pos - hl * axis, r


def seg_seg_dist(a0, a1, b0, b1):
    """Batched segment-segment distance. Inputs (N,3)."""
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = np.sum(d1 * d1, -1)
    e = np.sum(d2 * d2, -1)
    f = np.sum(d2 * r, -1)
    c = np.sum(d1 * r, -1)
    b = np.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = np.where(denom > 1e-12, np.clip((b * f - c * e) / (denom + 1e-20), 0, 1), 0.0)
    t = (b * s + f) / (e + 1e-20)
    t = np.clip(t, 0, 1)
    s = np.clip((b * t - c) / (a + 1e-20), 0, 1)
    ca = a0 + s[:, None] * d1
    cb = b0 + t[:, None] * d2
    return np.linalg.norm(ca - cb, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--samples", type=int, default=200000)
    ap.add_argument("--slack-frac", type=float, default=0.2)
    ap.add_argument("--slack-abs", type=float, default=0.15)
    ap.add_argument("--chunk", type=int, default=20000)
    args = ap.parse_args()

    import pybulletgym_tpu as pg
    from pybulletgym_tpu.models.schema import JointType

    t = pg.make_task(args.env_id)
    m = t.model
    pairs = t.physics.solver.self_collision_pairs
    byname = {g.name: g for g in m.geoms}

    rng = np.random.default_rng(0)
    mins = {p: np.inf for p in pairs}
    lo = np.zeros(m.nq)
    hi = np.zeros(m.nq)
    for b in m.bodies:
        if b.jtype == JointType.FREE:
            continue
        d = b.v_adr
        if m.jnt_limited[d]:
            l, h = m.jnt_range[d]
            pad = args.slack_frac * (h - l) + args.slack_abs
            lo[b.q_adr], hi[b.q_adr] = l - pad, h + pad
        else:
            lo[b.q_adr], hi[b.q_adr] = -np.pi, np.pi

    done = 0
    while done < args.samples:
        n = min(args.chunk, args.samples - done)
        q = rng.uniform(lo, hi, size=(n, m.nq))
        Rs, ps = fk_batch(m, q)
        segs = {}
        for name in {x for p in pairs for x in p}:
            g = byname[name]
            e0, e1, r = seg_of_geom(g)
            R, p = Rs[g.body], ps[g.body]
            segs[name] = (
                p + (R @ e0[:, None])[..., 0],
                p + (R @ e1[:, None])[..., 0],
                r,
            )
        for na, nb in pairs:
            a0, a1, ra = segs[na]
            b0, b1, rb = segs[nb]
            d = seg_seg_dist(a0, a1, b0, b1) - ra - rb
            mins[(na, nb)] = min(mins[(na, nb)], float(d.min()))
        done += n

    order = sorted(mins.items(), key=lambda kv: -kv[1])
    print(f"{args.env_id}: {len(pairs)} pairs, {args.samples} samples "
          f"(slack {args.slack_frac}/{args.slack_abs})")
    for (na, nb), d in order:
        print(f"  {d:+8.4f}  {na} / {nb}")


if __name__ == "__main__":
    main()
