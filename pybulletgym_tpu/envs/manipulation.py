"""Manipulation tasks: Reacher, Pusher, Striker, Thrower.

Reacher contract [ref: …/robots/manipulators/reacher.py · Reacher,
…/envs/manipulation/reacher_env.py · ReacherBulletEnv]:

* scene: SingleRobotEmptyScene(gravity=0.0, timestep=0.0165, frame_skip=1)
* apply_action: torque = 0.05 * clip(a_i) on central/elbow joints
* reset: central & elbow ~ U(-3.14, 3.14); target_x/target_y joints
  ~ U(-0.27, 0.27) (TARG_LIMIT), zero velocities
* obs(9) = [target_x, target_y, to_target_x, to_target_y,
            cos(theta), sin(theta), 0.1*theta_dot,
            gamma_rel, 0.1*gamma_dot]
  where theta is the (unlimited) central joint angle and gamma_rel the
  limit-normalized elbow angle [ref: robot_bases.py ·
  Joint.current_relative_position].
* potential = -100 * ||fingertip - target||; reward = progress +
  electricity + stuck_joint_cost with
  electricity = -0.10*(|a0*theta_dot| + |a1*gamma_dot|) - 0.01*(|a0|+|a1|)
  stuck_joint_cost = -0.1 when the elbow sits at its limit
  (| |gamma_rel| - 1 | < 0.01); never terminates (timeout 150 only).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.envs.base import Task
from pybulletgym_tpu.models.assets import asset_path
from pybulletgym_tpu.models.mjcf import load_mjcf
from pybulletgym_tpu.ops import dynamics as dyn
from pybulletgym_tpu.ops import rand
from pybulletgym_tpu.ops import smath as sm
from pybulletgym_tpu.ops.contacts import SolverConfig
from pybulletgym_tpu.ops.step import PhysicsConfig


class ReacherTask(Task):
    TARG_LIMIT = 0.27

    def __init__(self):
        self.model = load_mjcf(asset_path("reacher.xml"))
        self.physics = PhysicsConfig(
            timestep=0.0165, frame_skip=1, gravity=(0.0, 0.0, 0.0),
            solver=SolverConfig(),
        )
        m = self.model
        self.central_dof = m.dof_index("joint0")
        self.elbow_dof = m.dof_index("joint1")
        self.tx_dof = m.dof_index("target_x")
        self.ty_dof = m.dof_index("target_y")
        self.central_qadr = _qadr(m, self.central_dof)
        self.elbow_qadr = _qadr(m, self.elbow_dof)
        self.tx_qadr = _qadr(m, self.tx_dof)
        self.ty_qadr = _qadr(m, self.ty_dof)
        lo, hi = m.jnt_range[self.elbow_dof]
        self.elbow_mid = 0.5 * (lo + hi)
        self.elbow_halfrange = 0.5 * (hi - lo)
        host, pos, quat = m.frames["fingertip"]
        self.fingertip = (host, np.asarray(pos, np.float64))
        host_t, pos_t, quat_t = m.frames["target"]
        self.target_frame = (host_t, np.asarray(pos_t, np.float64))
        self.obs_dim = 9
        self.act_dim = 2
        self.max_episode_steps = 150
        self.torque_gain = 0.05

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        q[self.central_qadr] = rand.uniform(seed, 0, env_id, epoch, -3.14, 3.14)
        q[self.elbow_qadr] = rand.uniform(seed, 1, env_id, epoch, -3.14, 3.14)
        q[self.tx_qadr] = rand.uniform(
            seed, 2, env_id, epoch, -self.TARG_LIMIT, self.TARG_LIMIT
        )
        q[self.ty_qadr] = rand.uniform(
            seed, 3, env_id, epoch, -self.TARG_LIMIT, self.TARG_LIMIT
        )
        v = [jnp.zeros_like(like) for _ in range(m.nv)]
        aux = {"potential": self._potential_from_q(q, v)}
        return q, v, aux

    def _to_target(self, q, v):
        fk = dyn.forward_kinematics(self.model, q, v, with_inertia=False)
        hf, pf = self.fingertip
        tip = sm.v3_add(fk.p[hf], sm.m3_vec(fk.R[hf], tuple(float(x) for x in pf)))
        ht, pt = self.target_frame
        tgt = sm.v3_add(fk.p[ht], sm.m3_vec(fk.R[ht], tuple(float(x) for x in pt)))
        return tuple(a - b for a, b in zip(tip, tgt))

    def _potential_from_q(self, q, v):
        d = self._to_target(q, v)
        return -100.0 * jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)

    def action_tau_scalar(self, a):
        tau = [0.0] * self.model.nv
        tau[self.central_dof] = self.torque_gain * a[0]
        tau[self.elbow_dof] = self.torque_gain * a[1]
        return tau

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        theta = q[self.central_qadr]
        theta_dot = 0.1 * v[self.central_dof]
        gamma_rel = (q[self.elbow_qadr] - self.elbow_mid) / self.elbow_halfrange
        gamma_dot = 0.1 * v[self.elbow_dof]
        tx, ty = q[self.tx_qadr], q[self.ty_qadr]
        d = self._to_target(q, v)
        obs = [tx, ty, d[0], d[1],
               jnp.cos(theta), jnp.sin(theta), theta_dot,
               gamma_rel, gamma_dot]

        potential = -100.0 * jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2)
        progress = potential - aux["potential"]
        electricity = (
            -0.10 * (jnp.abs(a[0] * theta_dot) + jnp.abs(a[1] * gamma_dot))
            - 0.01 * (jnp.abs(a[0]) + jnp.abs(a[1]))
        )
        stuck = jnp.where(
            jnp.abs(jnp.abs(gamma_rel) - 1.0) < 0.01, -0.1, 0.0
        )
        reward = progress + electricity + stuck
        terminated = jnp.zeros_like(reward, bool)
        comps = {"progress": progress, "electricity": electricity,
                 "stuck_joint": stuck}
        return obs, reward, terminated, {"potential": potential}, comps


class PusherTask(Task):
    """7-DoF arm pushing a cylinder to a goal on a table
    [ref: …/robots/manipulators/pusher.py · Pusher,
    …/envs/manipulation/pusher_env.py · PusherBulletEnv] — contracts per
    Gym-Pusher-v2, which the reference mirrors:

    * obs(23) = [qpos[:7], qvel[:7], tips_arm(3), object(3), goal(3)]
    * reward = reward_dist + 0.5*reward_near + 0.1*reward_ctrl with
      reward_dist = -||obj - goal||, reward_near = -||tips - obj||,
      reward_ctrl = -sum(a^2); never terminates (timeout only)
    * reset: object xy ~ (U(-0.3, 0), U(-0.2, 0.2)) kept >= 0.17 from the
      goal (we project too-close draws out radially instead of rejection
      sampling — (M) distribution deviation); arm qvel ~ U(-0.005, 0.005)
    * torque = gear * ctrlrange_hi * clip(a) = 2*a
    """

    XML = "pusher.xml"
    # fingertip/forearm capsules vs the object: the pairs MuJoCo's
    # contype/conaffinity masks activate in the asset
    PAIRS = (("geom15", "geom19"), ("geom16", "geom19"), ("geom17", "geom19"))

    def __init__(self):
        self.model = load_mjcf(asset_path(self.XML))
        m = self.model
        pairs = self.PAIRS
        self.physics = PhysicsConfig(
            timestep=0.0165, frame_skip=1, gravity=(0.0, 0.0, -9.8),
            solver=SolverConfig(self_collision_pairs=pairs),
        )
        self.arm_dofs = [a.v_adr for a in m.actuators]
        self.gains = [a.gear * a.ctrlrange[1] for a in m.actuators]
        self.obj_x = m.dof_index("obj_slidey")   # document order: first slide
        self.obj_y = m.dof_index("obj_slidex")
        self.goal_x = m.dof_index("goal_slidey")
        self.goal_y = m.dof_index("goal_slidex")
        self.tips = m.frames["tips_arm"]
        self.obj_frame = m.frames["object"]
        self.goal_frame = m.frames["goal"]
        self.obs_dim = 23
        self.act_dim = 7
        self.max_episode_steps = 150

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        cx = rand.uniform(seed, 0, env_id, epoch, -0.3, 0.0)
        cy = rand.uniform(seed, 1, env_id, epoch, -0.2, 0.2)
        # keep the object >= 0.17 from the goal (at joint coords (0, 0))
        d = jnp.sqrt(cx * cx + cy * cy) + 1e-9
        scale = jnp.maximum(1.0, 0.18 / d)
        q[_qadr(m, self.obj_x)] = cx * scale
        q[_qadr(m, self.obj_y)] = cy * scale
        q[_qadr(m, self.goal_x)] = jnp.zeros_like(like)
        q[_qadr(m, self.goal_y)] = jnp.zeros_like(like)
        v = [
            rand.uniform(seed, 10 + i, env_id, epoch, -0.005, 0.005)
            for i in range(m.nv)
        ]
        for dof in (self.obj_x, self.obj_y, self.goal_x, self.goal_y):
            v[dof] = jnp.zeros_like(like)
        return q, v, {}

    def action_tau_scalar(self, a):
        tau = [0.0] * self.model.nv
        for i, dof in enumerate(self.arm_dofs):
            tau[dof] = self.gains[i] * a[i]
        return tau

    def _points(self, q, v):
        fk = dyn.forward_kinematics(self.model, q, v, with_inertia=False)

        def world(frame):
            host, pos, quat = frame
            return sm.v3_add(
                fk.p[host], sm.m3_vec(fk.R[host], tuple(float(x) for x in pos))
            )

        return world(self.tips), world(self.obj_frame), world(self.goal_frame)

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        tips, obj, goal = self._points(q, v)
        obs = (
            [q[_qadr(self.model, d)] for d in self.arm_dofs]
            + [v[d] for d in self.arm_dofs]
            + list(tips) + list(obj) + list(goal)
        )
        d_no = tuple(o - g for o, g in zip(obj, goal))
        d_to = tuple(t - o for t, o in zip(tips, obj))
        reward_dist = -jnp.sqrt(sum(x * x for x in d_no) + 1e-12)
        reward_near = -jnp.sqrt(sum(x * x for x in d_to) + 1e-12)
        reward_ctrl = -sum(ai * ai for ai in a)
        reward = reward_dist + 0.5 * reward_near + 0.1 * reward_ctrl
        terminated = jnp.zeros_like(reward, bool)
        comps = {"dist": reward_dist, "near": 0.5 * reward_near,
                 "ctrl": 0.1 * reward_ctrl}
        return obs, reward, terminated, dict(aux), comps


class StrikerTask(PusherTask):
    """Strike the ball so it slides to the goal
    [ref: …/envs/manipulation/striker_env.py · StrikerBulletEnv] —
    Gym-Striker-v2 contract over the authored striker.xml (arm3d arm +
    sphere ball + striking plate; an (L)-confidence reconstruction — the
    reference asset is absent offline):

    * reward = 3·reward_dist + 0.1·reward_ctrl + 0.5·reward_near where
      reward_dist = -min over the episode of ||obj - goal|| (tracked in
      aux), reward_near = -||obj - tips|| until the arm first comes within
      0.1 of the ball ("striked"), afterwards -||obj - strike_pos||
    * reset: ball fixed at world (0.5, -0.175); goal ~ (U(0.15,0.7),
      U(0.1,1.0)) kept >= 0.17 from the ball
    * dedicated striker.xml asset (round 2): sphere ball instead of the
      pusher cylinder, wrist striking plate, larger table
    """

    XML = "striker.xml"
    PAIRS = (
        ("wrist_c1", "ball_geom"), ("wrist_c2", "ball_geom"),
        ("wrist_c3", "ball_geom"), ("strike_plate", "ball_geom"),
    )

    def __init__(self):
        super().__init__()
        self.max_episode_steps = 100
        m = self.model
        # world-frame base offsets of the slide chains (host constants)
        self._obj_base = np.asarray(m.frames["object"][1][:2], np.float64)
        self._goal_base = np.asarray(m.frames["goal"][1][:2], np.float64)

    BALL_WORLD = (0.5, -0.175)

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        bx, by = self.BALL_WORLD
        # slides are (slidey, slidex) in document order
        q[_qadr(m, self.obj_x)] = jnp.full_like(like, by - self._obj_base[1])
        q[_qadr(m, self.obj_y)] = jnp.full_like(like, bx - self._obj_base[0])
        gx = rand.uniform(seed, 0, env_id, epoch, 0.15, 0.7)
        gy = rand.uniform(seed, 1, env_id, epoch, 0.1, 1.0)
        dx, dy = gx - bx, gy - by
        d = jnp.sqrt(dx * dx + dy * dy) + 1e-9
        scale = jnp.maximum(1.0, 0.18 / d)
        gx = bx + dx * scale
        gy = by + dy * scale
        q[_qadr(m, self.goal_x)] = gy - self._goal_base[1]
        q[_qadr(m, self.goal_y)] = gx - self._goal_base[0]
        v = [
            rand.uniform(seed, 10 + i, env_id, epoch, -0.005, 0.005)
            for i in range(m.nv)
        ]
        for dof in (self.obj_x, self.obj_y, self.goal_x, self.goal_y):
            v[dof] = jnp.zeros_like(like)
        big = jnp.full_like(like, 1e3)
        aux = {"min_dist": big, "striked": jnp.zeros_like(like),
               "strike_x": jnp.zeros_like(like),
               "strike_y": jnp.zeros_like(like),
               "strike_z": jnp.zeros_like(like)}
        return q, v, aux

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        tips, obj, goal = self._points(q, v)
        obs = (
            [q[_qadr(self.model, d)] for d in self.arm_dofs]
            + [v[d] for d in self.arm_dofs]
            + list(tips) + list(obj) + list(goal)
        )
        vec1 = tuple(o - t for o, t in zip(obj, tips))
        vec2 = tuple(o - g for o, g in zip(obj, goal))
        d1 = jnp.sqrt(sum(x * x for x in vec1) + 1e-12)
        d2 = jnp.sqrt(sum(x * x for x in vec2) + 1e-12)
        min_dist = jnp.minimum(aux["min_dist"], d2)

        newly = (d1 < 0.1) & (aux["striked"] < 0.5)
        striked = jnp.maximum(aux["striked"], newly.astype(jnp.float32))
        sx = jnp.where(newly, tips[0], aux["strike_x"])
        sy = jnp.where(newly, tips[1], aux["strike_y"])
        sz = jnp.where(newly, tips[2], aux["strike_z"])
        vec3 = (obj[0] - sx, obj[1] - sy, obj[2] - sz)
        d3 = jnp.sqrt(sum(x * x for x in vec3) + 1e-12)
        reward_near = jnp.where(striked > 0.5, -d3, -d1)

        reward_dist = -min_dist
        reward_ctrl = -sum(ai * ai for ai in a)
        reward = 3.0 * reward_dist + 0.1 * reward_ctrl + 0.5 * reward_near
        terminated = jnp.zeros_like(reward, bool)
        aux2 = {"min_dist": min_dist, "striked": striked,
                "strike_x": sx, "strike_y": sy, "strike_z": sz}
        comps = {"dist": 3.0 * reward_dist, "near": 0.5 * reward_near,
                 "ctrl": 0.1 * reward_ctrl}
        return obs, reward, terminated, aux2, comps


class ThrowerTask(Task):
    """Throw the free ball so it lands near the goal
    [ref: …/envs/manipulation/thrower_env.py · ThrowerBulletEnv] —
    Gym-Thrower-v2 contract; the ball is a free body launched by the arm
    (authored thrower.xml asset, documented (L)):

    * reward = reward_dist + 0.002·reward_ctrl where reward_dist is the
      xy distance from the ball (or from where it first hit the ground,
      z < -0.25, tracked in aux) to the goal
    * reset: goal xy ~ U(-0.3, 0.3)^2
    """

    def __init__(self):
        self.model = load_mjcf(asset_path("thrower.xml"))
        m = self.model
        pairs = (("geom15", "ball_geom"), ("geom16", "ball_geom"),
                 ("geom17", "ball_geom"))
        self.physics = PhysicsConfig(
            timestep=0.0165, frame_skip=1, gravity=(0.0, 0.0, -9.8),
            solver=SolverConfig(self_collision_pairs=pairs),
        )
        self.arm_dofs = [a.v_adr for a in m.actuators]
        self.gains = [a.gear * a.ctrlrange[1] for a in m.actuators]
        self.goal_x = m.dof_index("goal_slidey")
        self.goal_y = m.dof_index("goal_slidex")
        self.tips = m.frames["tips_arm"]
        self.obj_frame = m.frames["object"]
        self.goal_frame = m.frames["goal"]
        self.obs_dim = 23
        self.act_dim = 7
        self.max_episode_steps = 100

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        q[_qadr(m, self.goal_x)] = rand.uniform(seed, 0, env_id, epoch, -0.3, 0.3)
        q[_qadr(m, self.goal_y)] = rand.uniform(seed, 1, env_id, epoch, -0.3, 0.3)
        v = [
            rand.uniform(seed, 10 + i, env_id, epoch, -0.005, 0.005)
            for i in range(m.nv)
        ]
        for dof in (self.goal_x, self.goal_y):
            v[dof] = jnp.zeros_like(like)
        aux = {"hit": jnp.zeros_like(like),
               "hit_x": jnp.zeros_like(like), "hit_y": jnp.zeros_like(like)}
        return q, v, aux

    def action_tau_scalar(self, a):
        tau = [0.0] * self.model.nv
        for i, dof in enumerate(self.arm_dofs):
            tau[dof] = self.gains[i] * a[i]
        return tau

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        m = self.model
        fk = dyn.forward_kinematics(m, q, v, with_inertia=False)

        def world(frame):
            host, pos, _ = frame
            return sm.v3_add(
                fk.p[host], sm.m3_vec(fk.R[host], tuple(float(x) for x in pos))
            )

        tips, obj, goal = world(self.tips), world(self.obj_frame), world(self.goal_frame)
        obs = (
            [q[_qadr(m, d)] for d in self.arm_dofs]
            + [v[d] for d in self.arm_dofs]
            + list(tips) + list(obj) + list(goal)
        )
        newly = (obj[2] < -0.25) & (aux["hit"] < 0.5)
        hit = jnp.maximum(aux["hit"], newly.astype(jnp.float32))
        hx = jnp.where(newly, obj[0], aux["hit_x"])
        hy = jnp.where(newly, obj[1], aux["hit_y"])
        bx = jnp.where(hit > 0.5, hx, obj[0])
        by = jnp.where(hit > 0.5, hy, obj[1])
        reward_dist = -jnp.sqrt(
            (bx - goal[0]) ** 2 + (by - goal[1]) ** 2 + 1e-12
        )
        reward_ctrl = -sum(ai * ai for ai in a)
        reward = reward_dist + 0.002 * reward_ctrl
        terminated = jnp.zeros_like(reward, bool)
        aux2 = {"hit": hit, "hit_x": hx, "hit_y": hy}
        comps = {"dist": reward_dist, "ctrl": 0.002 * reward_ctrl}
        return obs, reward, terminated, aux2, comps


def _qadr(model, v_adr: int) -> int:
    for b in model.bodies:
        if b.v_adr == v_adr:
            return b.q_adr
    raise ValueError(v_adr)
