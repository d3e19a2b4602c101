"""Scripted task-space experts for the 7-DoF arm envs (Pusher/Striker/
Thrower), CEM-tunable, for cloning into shipped demo MLPs.

The reference ships a frozen SmallReactivePolicy per env [ref:
pybulletgym/examples/roboschool-weights · SURVEY §3.5]; for the arm envs
we derive the demo policies from model-based controllers instead of RL:

* a Jacobian-transpose task-space PD with gravity/Coriolis compensation
  computed from the same Model the engine simulates (ops.dynamics FK +
  bias_forces — no second source of truth), wrapped in a per-env
  memoryless "state machine" whose branches are functions of the current
  observation only (so behavior cloning into a reactive MLP is well
  posed);
* every magic number is an entry of a small theta vector so
  tools/tune_expert.py can CEM-tune the controller against the actual
  env reward (tuned vectors land in examples/weights/<env>.expert.json).

Experts consume the env's own observation layout (obs 23 =
[qpos_arm(7), qvel_arm(7), tips(3), obj(3), goal(3)] — see
envs/manipulation.py PusherTask.output_scalar) in batch-trailing form
(obs_dim, B) and return actions (act_dim, B). Theta entries may be
floats or (B,) arrays (per-env candidates for the CEM tuner).
"""

import json
import os

import numpy as np

WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "examples", "weights"
)


# ---------------------------------------------------------------------------
# model-based arm frame quantities
# ---------------------------------------------------------------------------

def arm_frames(task):
    """Closure computing tips position/velocity, per-dof tip Jacobian
    columns, and bias (gravity+Coriolis) torques for the 7 actuated arm
    dofs, from an observation batch alone.

    Works because the arm qpos/qvel are the first 14 obs rows and the
    obj/goal chains are kinematically independent of the arm, so filling
    their q entries with qpos0 constants leaves arm FK and arm bias
    torques exact.
    """
    import jax.numpy as jnp

    from pybulletgym_tpu.ops import dynamics as dyn
    from pybulletgym_tpu.ops import smath as sm

    m = task.model
    arm_dofs = list(task.arm_dofs)
    qadr = {b.v_adr: b.q_adr for b in m.bodies}
    arm_qadr = [qadr[d] for d in arm_dofs]
    gravity = task.physics.gravity
    tip_host, tip_pos, _ = m.frames["tips_arm"]
    tip_pos = tuple(float(x) for x in tip_pos)

    def compute(obs):
        like = obs[0] * 0.0
        q = [like + float(x) for x in m.qpos0]
        v = [like for _ in range(m.nv)]
        for i in range(7):
            q[arm_qadr[i]] = obs[i]
            v[arm_dofs[i]] = obs[7 + i]
        fk = dyn.forward_kinematics(m, q, v, with_inertia=True)
        bias = dyn.bias_forces(m, fk, gravity)
        tips = sm.v3_add(fk.p[tip_host], sm.m3_vec(fk.R[tip_host], tip_pos))
        # dof motion subspace is (ang, lin) at the world origin, so the
        # tip Jacobian column is lin + ang x p_tip
        J = []
        for d in arm_dofs:
            ang, lin = fk.S[d]
            J.append(sm.v3_add(lin, sm.v3_cross(ang, tips)))
        vtips = sm.v3_zero(like)
        for i in range(7):
            vtips = sm.v3_add(vtips, sm.v3_scale(J[i], obs[7 + i]))
        tau_bias = [bias[d] for d in arm_dofs]
        return tips, J, vtips, tau_bias

    return compute


def _taskspace_action(jnp, J, F, tau_bias, kg, gains):
    a = []
    for i in range(7):
        tau = J[i][0] * F[0] + J[i][1] * F[1] + J[i][2] * F[2]
        tau = tau + kg * tau_bias[i]
        a.append(jnp.clip(tau / gains[i], -1.0, 1.0))
    return jnp.stack(a)


# ---------------------------------------------------------------------------
# per-env experts
# ---------------------------------------------------------------------------

# KP, KD, r_app, lat_th, proj_th, push_over, kg, done_th
PUSHER_DEFAULT = (12.0, 3.0, 0.10, 0.05, 0.02, 0.25, 0.8, 0.08)


def pusher_expert(task, theta=None):
    """Approach a point behind the object on the object->goal line, then
    push through it; brake once the object sits on the goal.

    Reward facts (envs/manipulation.py PusherTask.output_scalar):
    -||obj-goal|| - 0.5*||tips-obj|| - 0.1*sum(a^2) per step, so the
    controller keeps torques economical (kg scales how much gravity
    compensation is paid for) and parks once dist < done_th.
    """
    import jax.numpy as jnp

    th = tuple(theta) if theta is not None else PUSHER_DEFAULT
    KP, KD, r_app, lat_th, proj_th, push_over, kg, done_th = th
    compute = arm_frames(task)
    gains = [float(g) for g in task.gains]

    def expert(obs):
        tips, J, vt, tau_bias = compute(obs)
        ox, oy, oz = obs[17], obs[18], obs[19]
        gx, gy = obs[20], obs[21]
        dx, dy = gx - ox, gy - oy
        dist = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        ux, uy = dx / dist, dy / dist
        relx, rely = tips[0] - ox, tips[1] - oy
        proj = relx * ux + rely * uy
        latx, laty = relx - proj * ux, rely - proj * uy
        lat = jnp.sqrt(latx * latx + laty * laty + 1e-12)
        behind = (proj < -proj_th) & (lat < lat_th)
        tx = jnp.where(behind, ox + push_over * ux, ox - r_app * ux)
        ty = jnp.where(behind, oy + push_over * uy, oy - r_app * uy)
        tz = oz
        done = dist < done_th
        F = (jnp.where(done, 0.0, KP * (tx - tips[0])) - KD * vt[0],
             jnp.where(done, 0.0, KP * (ty - tips[1])) - KD * vt[1],
             jnp.where(done, 0.0, KP * (tz - tips[2])) - KD * vt[2])
        return _taskspace_action(jnp, J, F, tau_bias, kg, gains)

    return expert


# KP, KD, r_wind, algn_proj, algn_lat, c1, c2, moved_th, kg, kd_stop
STRIKER_DEFAULT = (12.0, 3.0, 0.15, 0.01, 0.04, 2.0, 2.0, 0.06, 0.8, 2.0)


def striker_expert(task, theta=None):
    """Wind up behind the (initially stationary) ball on the ball->goal
    line, drive through it with a distance-scaled force, then brake.

    The ball spawns at the fixed world point StrikerTask.BALL_WORLD; once
    it has moved more than moved_th the episode's strike is spent
    (reward_dist is the episode-min ||obj-goal||) and the cheapest thing
    the arm can do is stop (reward_ctrl).
    """
    import jax.numpy as jnp

    th = tuple(theta) if theta is not None else STRIKER_DEFAULT
    KP, KD, r_wind, algn_proj, algn_lat, c1, c2, moved_th, kg, kd_stop = th
    compute = arm_frames(task)
    gains = [float(g) for g in task.gains]
    bx0, by0 = task.BALL_WORLD

    def expert(obs):
        tips, J, vt, tau_bias = compute(obs)
        ox, oy, oz = obs[17], obs[18], obs[19]
        gx, gy = obs[20], obs[21]
        dxm, dym = ox - bx0, oy - by0
        moved = jnp.sqrt(dxm * dxm + dym * dym) > moved_th
        dx, dy = gx - ox, gy - oy
        dist = jnp.sqrt(dx * dx + dy * dy + 1e-12)
        ux, uy = dx / dist, dy / dist
        relx, rely = tips[0] - ox, tips[1] - oy
        proj = relx * ux + rely * uy
        latx, laty = relx - proj * ux, rely - proj * uy
        lat = jnp.sqrt(latx * latx + laty * laty + 1e-12)
        aligned = (proj < -algn_proj) & (lat < algn_lat)
        strike = c1 + c2 * dist
        wx = ox - r_wind * ux
        wy = oy - r_wind * uy
        Fx = jnp.where(aligned, strike * ux, KP * (wx - tips[0])) - KD * vt[0]
        Fy = jnp.where(aligned, strike * uy, KP * (wy - tips[1])) - KD * vt[1]
        Fz = KP * (oz - tips[2]) - KD * vt[2]
        F = (jnp.where(moved, -kd_stop * vt[0], Fx),
             jnp.where(moved, -kd_stop * vt[1], Fy),
             jnp.where(moved, -kd_stop * vt[2], Fz))
        return _taskspace_action(jnp, J, F, tau_bias, kg, gains)

    return expert


# aim_off, kp_pan, kd_pan, l0, l1, e0, e1, dump_th, w_dump, kp_q, kd_q, kg
THROWER_DEFAULT = (0.0, 4.0, 1.5, 0.30, -0.8, -0.30, 2.0, 0.15, -1.0,
                   3.0, 0.8, 0.9)


def thrower_expert(task, theta=None):
    """Transport-and-dump controller for the U-cradle thrower arm.

    The ball rests on the wrist cradle (thrower.xml); the controller pans
    the arm toward the goal azimuth, sets the carry radius via
    shoulder-lift/elbow targets that are affine in the goal distance, and
    tips the wrist (w_dump) once the pan error is inside dump_th so the
    ball rolls off and free-falls onto the goal. Joint-space PD +
    gravity compensation; everything is a function of the current obs
    (pan angle stands in for phase), so BC into a reactive MLP is sound.
    """
    import jax.numpy as jnp

    th = tuple(theta) if theta is not None else THROWER_DEFAULT
    (aim_off, kp_pan, kd_pan, l0, l1, e0, e1, dump_th, w_dump,
     kp_q, kd_q, kg) = th
    compute = arm_frames(task)
    gains = [float(g) for g in task.gains]
    m = task.model
    base = next(b for b in m.bodies if b.name == "r_shoulder_pan_link")
    bx, by = float(base.pos[0]), float(base.pos[1])
    lo_e, hi_e = (float(x) for x in m.jnt_range[task.arm_dofs[3]])
    lo_l, hi_l = (float(x) for x in m.jnt_range[task.arm_dofs[1]])
    lo_w, hi_w = (float(x) for x in m.jnt_range[task.arm_dofs[5]])

    def expert(obs):
        _, _, _, tau_bias = compute(obs)
        gx, gy = obs[20], obs[21]
        az = jnp.arctan2(gy - by, gx - bx)
        ddx, ddy = gx - bx, gy - by
        dist = jnp.sqrt(ddx * ddx + ddy * ddy + 1e-12)
        e_pan = az + aim_off - obs[0]
        e_pan = jnp.arctan2(jnp.sin(e_pan), jnp.cos(e_pan))
        near = jnp.abs(e_pan) < dump_th
        lift_t = jnp.clip(l0 + l1 * (dist - 0.7), lo_l, hi_l)
        elbow_t = jnp.clip(e0 + e1 * (dist - 0.7), lo_e, hi_e)
        wrist_t = jnp.where(near, jnp.clip(w_dump, lo_w, hi_w), 0.0)
        targets = [None, lift_t, 0.0, elbow_t, 0.0, wrist_t, 0.0]
        taus = [kp_pan * e_pan - kd_pan * obs[7]]
        for i in range(1, 7):
            taus.append(kp_q * (targets[i] - obs[i]) - kd_q * obs[7 + i])
        a = [jnp.clip((taus[i] + kg * tau_bias[i]) / gains[i], -1.0, 1.0)
             for i in range(7)]
        return jnp.stack(a)

    return expert


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

ARM_EXPERTS = {
    "PusherPyBulletEnv-v0": (pusher_expert, PUSHER_DEFAULT),
    "StrikerPyBulletEnv-v0": (striker_expert, STRIKER_DEFAULT),
    "ThrowerPyBulletEnv-v0": (thrower_expert, THROWER_DEFAULT),
    # the MuJoCo mirrors share the obs contract, only horizons differ
    "PusherMuJoCoEnv-v0": (pusher_expert, PUSHER_DEFAULT),
    "StrikerMuJoCoEnv-v0": (striker_expert, STRIKER_DEFAULT),
    "ThrowerMuJoCoEnv-v0": (thrower_expert, THROWER_DEFAULT),
}


def tuned_theta_path(env_id):
    return os.path.join(WEIGHTS_DIR, env_id + ".expert.json")


def load_theta(env_id):
    """Tuned theta from tune_expert.py if present, else defaults."""
    path = tuned_theta_path(env_id)
    if os.path.exists(path):
        with open(path) as f:
            return tuple(float(x) for x in json.load(f)["theta"])
    return tuple(ARM_EXPERTS[env_id][1])


def make_arm_expert(env_id, task, theta=None):
    fn, _ = ARM_EXPERTS[env_id]
    if theta is None:
        theta = load_theta(env_id)
    return fn(task, theta)


def default_theta(env_id):
    return np.asarray(ARM_EXPERTS[env_id][1], np.float64)
