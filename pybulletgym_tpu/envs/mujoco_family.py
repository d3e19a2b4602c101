"""MuJoCo-parity env family: the ``*MuJoCoEnv-v0`` mirrors
[ref: pybulletgym/envs/mujoco/** — SURVEY §1 'Two parallel env families'].

The reference re-derives observation layouts and reward functions to match
Gym-MuJoCo-v2 so MuJoCo-trained policies transfer, while the physics stays
Bullet's (same scenes/timing as the roboschool family). We do the same:
identical engine + timing as the PyBullet-family tasks, but Gym-MuJoCo-v2
obs/reward/termination contracts:

* Hopper:      obs 11 = [qpos[1:], clip(qvel, ±10)];
               r = 1 + vx - 1e-3·Σa²; done unless z>0.7, |ang|<0.2,
               all |state[2:]|<100
* Walker2d:    obs 17 = [qpos[1:], clip(qvel, ±10)];
               r = 1 + vx - 1e-3·Σa²; done unless 0.8<z<2.0, |ang|<1.0
* HalfCheetah: obs 17 = [qpos[1:], qvel]; r = vx - 0.1·Σa²; never done
* Ant:         obs 111 = [z, quat, joints, qvel_mj(14), cfrc_ext(84)=0];
               r = vx + 1 - 0.5·Σa² (contact cost 0 — no cfrc here, as in
               the reference's Bullet port); done unless 0.2<=z<=1.0
* InvertedPendulum:       obs 4 = [qpos, qvel]; r = 1; done |theta|>0.2
* InvertedDoublePendulum: obs 11 = [x, sin(th), cos(th), qvel, qfrc(3)=0];
               r = 10 - 0.01·x_tip² - (y_tip-2)² - 1e-3·v1² - 5e-3·v2²;
               done when y_tip <= 1

Torque mapping: tau = gear * ctrlrange_hi * clip(a, -1, 1) — the actuator
semantics of the MJCF, with the Box(-1,1) action convention the reference
keeps for this family [ref: …/mujoco/robots — apply_action].

forward velocity vx = (x_after - x_before) / control_dt, with x the root
x coordinate, exactly the Gym-v2 position-difference formulation (held in
aux between steps).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.envs.base import Task
from pybulletgym_tpu.models.assets import asset_path
from pybulletgym_tpu.models.mjcf import load_mjcf
from pybulletgym_tpu.models.schema import JointType
from pybulletgym_tpu.ops import dynamics as dyn
from pybulletgym_tpu.ops import rand
from pybulletgym_tpu.ops import smath as sm
from pybulletgym_tpu.ops.contacts import SolverConfig
from pybulletgym_tpu.ops.step import PhysicsConfig


class _MjBase(Task):
    """Shared plumbing: model load, torque map, uniform reset noise."""

    xml: str
    reset_noise: float = 0.005
    frame_skip: int = 4
    timestep: float = 0.0165 / 4

    def __init__(self):
        self.model = load_mjcf(asset_path(self.xml))
        self.physics = PhysicsConfig(
            timestep=self.timestep, frame_skip=self.frame_skip,
            gravity=(0.0, 0.0, -9.8), solver=SolverConfig(),
        )
        m = self.model
        self.act_dofs = [a.v_adr for a in m.actuators]
        self.torque_gain = [a.gear * a.ctrlrange[1] for a in m.actuators]
        self.act_dim = len(m.actuators)
        self.max_episode_steps = 1000
        self._setup()

    def _setup(self):
        pass

    def action_tau_scalar(self, a):
        tau = [0.0] * self.model.nv
        for i, d in enumerate(self.act_dofs):
            tau[d] = self.torque_gain[i] * a[i]
        return tau

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        n = self.reset_noise
        q = [
            float(m.qpos0[i]) + rand.uniform(seed, i, env_id, epoch, -n, n)
            for i in range(m.nq)
        ]
        v = [
            rand.uniform(seed, m.nq + i, env_id, epoch, -n, n)
            for i in range(m.nv)
        ]
        q = [jnp.full_like(like, 0.0) + x for x in q]
        v = [jnp.full_like(like, 0.0) + x for x in v]
        return q, v, self._init_aux(q, v)

    def _init_aux(self, q, v):
        return {"x": self._root_x(q)}

    def _root_x(self, q):
        return q[0]

    def _ctrl_cost(self, a, coef):
        return coef * sum(ai * ai for ai in a)


class _MjPlanarWalker(_MjBase):
    """Hopper / Walker2d / HalfCheetah share the planar root layout
    (rootx, rootz, rooty slide/slide/hinge)."""

    ctrl_coef: float
    alive_bonus: float
    clip_qvel: bool

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        m = self.model
        x = q[0]
        vx = (x - aux["x"]) / self.physics.control_dt
        qv = [jnp.clip(vi, -10.0, 10.0) for vi in v] if self.clip_qvel else v
        obs = list(q[1:]) + list(qv)
        reward = self.alive_bonus + vx - self._ctrl_cost(a, self.ctrl_coef)
        terminated = self._done(q, v, obs)
        comps = {"forward": vx,
                 "ctrl_cost": -self._ctrl_cost(a, self.ctrl_coef),
                 "alive": self.alive_bonus + 0.0 * vx}
        return obs, reward, terminated, {"x": x}, comps

    def _done(self, q, v, obs):
        raise NotImplementedError


class HopperMuJoCoTask(_MjPlanarWalker):
    """[ref: pybulletgym/envs/mujoco/envs/locomotion/hopper_env.py]"""

    xml = "hopper.xml"
    ctrl_coef = 1e-3
    alive_bonus = 1.0
    clip_qvel = True
    obs_dim = 11

    def _done(self, q, v, obs):
        z, ang = q[1], q[2]
        healthy = (z > 0.7) & (jnp.abs(ang) < 0.2)
        for s in list(q[2:]) + list(v):
            healthy = healthy & (jnp.abs(s) < 100.0)
        return ~healthy


class Walker2DMuJoCoTask(_MjPlanarWalker):
    """[ref: …/mujoco/envs/locomotion/walker2d_env.py]"""

    xml = "walker2d.xml"
    ctrl_coef = 1e-3
    alive_bonus = 1.0
    clip_qvel = True
    obs_dim = 17

    def _done(self, q, v, obs):
        z, ang = q[1], q[2]
        return ~((z > 0.8) & (z < 2.0) & (jnp.abs(ang) < 1.0))


class HalfCheetahMuJoCoTask(_MjPlanarWalker):
    """[ref: …/mujoco/envs/locomotion/half_cheetah_env.py]"""

    xml = "half_cheetah.xml"
    ctrl_coef = 0.1
    alive_bonus = 0.0
    clip_qvel = False
    obs_dim = 17
    reset_noise = 0.1

    def _done(self, q, v, obs):
        return jnp.zeros_like(q[0], bool)


class AntMuJoCoTask(_MjBase):
    """[ref: …/mujoco/envs/locomotion/ant_env.py] — obs 111 with the
    cfrc_ext block zero (the reference's Bullet port cannot produce MuJoCo
    constraint forces either)."""

    xml = "ant.xml"
    obs_dim = 111
    reset_noise = 0.1

    def _root_x(self, q):
        return q[0]

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        x = q[0]
        vx = (x - aux["x"]) / self.physics.control_dt
        quat = (q[3], q[4], q[5], q[6])
        R = sm.m3_from_quat(quat)
        lin_world = sm.m3_vec(R, (v[3], v[4], v[5]))
        zero = 0.0 * x
        v_mj = list(lin_world) + [v[0], v[1], v[2]] + list(v[6:])
        obs = [q[2]] + list(quat) + list(q[7:]) + v_mj + [zero] * 84
        ctrl = 0.5 * sum(ai * ai for ai in a)
        reward = vx + 1.0 - ctrl
        z = q[2]
        finite = jnp.isfinite(z)
        for s in list(q) + list(v):
            finite = finite & jnp.isfinite(s)
        terminated = ~(finite & (z >= 0.2) & (z <= 1.0))
        comps = {"forward": vx, "alive": 1.0 + zero, "ctrl_cost": -ctrl}
        return obs, reward, terminated, {"x": x}, comps


class HumanoidMuJoCoTask(_MjBase):
    """[ref: …/mujoco/envs/locomotion/humanoid_env.py] — Gym-Humanoid-v2
    contract: obs 376 = [qpos[2:](22), qvel(23), cinert(140), cvel(84),
    qfrc_actuator(23), cfrc_ext(84)]; the cinert/cvel/qfrc/cfrc blocks are
    zero (the reference's Bullet port cannot produce MuJoCo's
    composite-inertia buffers either). reward = 5 + 1.25·vx − 0.1·Σa²
    (impact cost 0); done unless 1.0 < z < 2.0."""

    xml = "humanoid.xml"
    obs_dim = 376
    reset_noise = 0.01

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        x = q[0]
        vx = (x - aux["x"]) / self.physics.control_dt
        quat = (q[3], q[4], q[5], q[6])
        R = sm.m3_from_quat(quat)
        lin_world = sm.m3_vec(R, (v[3], v[4], v[5]))
        zero = 0.0 * x
        v_mj = list(lin_world) + [v[0], v[1], v[2]] + list(v[6:])
        obs = (
            list(q[2:]) + v_mj
            + [zero] * (140 + 84)          # cinert, cvel
            + [zero] * 23                  # qfrc_actuator
            + [zero] * 84                  # cfrc_ext
        )
        ctrl = 0.1 * sum(ai * ai for ai in a)
        reward = 5.0 + 1.25 * vx - ctrl
        z = q[2]
        terminated = ~((z > 1.0) & (z < 2.0))
        comps = {"alive": 5.0 + zero, "forward": 1.25 * vx, "ctrl_cost": -ctrl}
        return obs, reward, terminated, {"x": x}, comps


class ReacherMuJoCoTask(_MjBase):
    """[ref: …/mujoco/envs/manipulation/reacher_env.py] — Gym-Reacher-v2:
    obs 11 = [cos(th), sin(th), target_xy, qvel_arm, (fingertip-target)_xyz]
    reward = -||fingertip - target|| - sum(a^2); never terminates."""

    xml = "reacher.xml"
    obs_dim = 11
    frame_skip = 1
    timestep = 0.0165

    def _setup(self):
        m = self.model
        self.j0 = m.dof_index("joint0")
        self.j1 = m.dof_index("joint1")
        self.tx = m.dof_index("target_x")
        self.ty = m.dof_index("target_y")
        self.fingertip = m.frames["fingertip"]
        self.target = m.frames["target"]
        self.max_episode_steps = 1000  # reference registers 1000 for mirrors

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        q[self.j0] = rand.uniform(seed, 0, env_id, epoch, -0.1, 0.1)
        q[self.j1] = rand.uniform(seed, 1, env_id, epoch, -0.1, 0.1)
        # goal sampled in the 0.2-radius disk (Gym: rejection-sampled;
        # we sample r ~ sqrt(U)*0.2, angle ~ U — same distribution)
        u = rand.uniform(seed, 2, env_id, epoch, 0.0, 1.0)
        ang = rand.uniform(seed, 3, env_id, epoch, -3.14159, 3.14159)
        r = 0.2 * jnp.sqrt(u)
        q[self.tx] = r * jnp.cos(ang)
        q[self.ty] = r * jnp.sin(ang)
        v = [
            rand.uniform(seed, 4 + i, env_id, epoch, -0.005, 0.005)
            for i in range(m.nv)
        ]
        v[self.tx] = jnp.zeros_like(like)
        v[self.ty] = jnp.zeros_like(like)
        return q, v, {}

    def _vec(self, q, v):
        fk = dyn.forward_kinematics(self.model, q, v, with_inertia=False)

        def world(frame):
            host, pos, _ = frame
            return sm.v3_add(
                fk.p[host], sm.m3_vec(fk.R[host], tuple(float(x) for x in pos))
            )

        tip, tgt = world(self.fingertip), world(self.target)
        return tuple(a - b for a, b in zip(tip, tgt))

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        vec = self._vec(q, v)
        obs = [jnp.cos(q[self.j0]), jnp.cos(q[self.j1]),
               jnp.sin(q[self.j0]), jnp.sin(q[self.j1]),
               q[self.tx], q[self.ty],
               v[self.j0], v[self.j1],
               vec[0], vec[1], vec[2]]
        reward_dist = -jnp.sqrt(sum(x * x for x in vec) + 1e-12)
        reward_ctrl = -sum(ai * ai for ai in a)
        reward = reward_dist + reward_ctrl
        terminated = jnp.zeros_like(reward, bool)
        comps = {"dist": reward_dist, "ctrl": reward_ctrl}
        return obs, reward, terminated, dict(aux), comps


class InvertedPendulumMuJoCoTask(_MjBase):
    """[ref: …/mujoco/envs/pendulum/inverted_pendulum_env.py]"""

    xml = "inverted_pendulum.xml"
    obs_dim = 4
    frame_skip = 1
    timestep = 0.0165
    reset_noise = 0.01

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        obs = list(q) + list(v)
        reward = jnp.ones_like(q[0])
        terminated = jnp.abs(q[1]) > 0.2
        return obs, reward, terminated, dict(aux), {"reward": reward}

    def _init_aux(self, q, v):
        return {}


class InvertedDoublePendulumMuJoCoTask(_MjBase):
    """[ref: …/mujoco/envs/pendulum/inverted_double_pendulum_env.py] —
    obs 11 with the qfrc_constraint block zero (as in the reference)."""

    xml = "inverted_double_pendulum.xml"
    obs_dim = 11
    frame_skip = 1
    timestep = 0.0165
    reset_noise = 0.01

    def _setup(self):
        self.pole2 = self.model.body_index("pole2")

    def _tip(self, q, v):
        fk = dyn.forward_kinematics(self.model, q, v, with_inertia=False)
        # tip site: pos="0 0 .6" on pole2 (inverted_double_pendulum.xml:39)
        off = sm.m3_vec(fk.R[self.pole2], (0.0, 0.0, 0.6))
        return sm.v3_add(fk.p[self.pole2], off)

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        tip = self._tip(q, v)
        x_tip, y_tip = tip[0], tip[2]
        zero = 0.0 * q[0]
        obs = [q[0], jnp.sin(q[1]), jnp.sin(q[2]), jnp.cos(q[1]), jnp.cos(q[2]),
               v[0], v[1], v[2], zero, zero, zero]
        dist_penalty = 0.01 * x_tip ** 2 + (y_tip - 2.0) ** 2
        vel_penalty = 1e-3 * v[1] ** 2 + 5e-3 * v[2] ** 2
        reward = 10.0 - dist_penalty - vel_penalty
        terminated = y_tip <= 1.0
        comps = {"alive": 10.0 + zero, "dist_penalty": -dist_penalty,
                 "vel_penalty": -vel_penalty}
        return obs, reward, terminated, dict(aux), comps

    def _init_aux(self, q, v):
        return {}
