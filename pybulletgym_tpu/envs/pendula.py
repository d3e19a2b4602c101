"""Pendulum tasks: InvertedPendulum (+Swingup), InvertedDoublePendulum.

Contracts per SURVEY §2.7 [ref: …/envs/pendulum/inverted_pendulum_env.py,
inverted_double_pendulum_env.py; robots in …/robots/pendula/]:

* InvertedPendulum: torque = 100·clip(a) on the slider; reward 1.0/step;
  done when |theta| > 0.2. Swingup variant: pole resets hanging
  (θ≈π+u), reward cos(θ), never terminates (timeout only).
* InvertedDoublePendulum: torque = 200·clip(a); reward
  10 − dist_penalty − vel_penalty with
  dist_penalty = 0.01·x_tip² + (y_tip+0.3−2)², vel_penalty = 1e-3·v1² +
  5e-3·v2²; done when y_tip + 0.3 ≤ 1 (y_tip = pole2 COM height).
* Scene: SingleRobotEmptyScene(gravity=9.8, timestep=0.0165, frame_skip=1)
  [ref: scene_bases.py · SingleRobotEmptyScene].
* Reset: joint angle(s) set to uniform(-0.1, 0.1), zero velocity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.envs.base import Task
from pybulletgym_tpu.models.assets import asset_path
from pybulletgym_tpu.models.mjcf import load_mjcf
from pybulletgym_tpu.ops import dynamics as dyn
from pybulletgym_tpu.ops import rand
from pybulletgym_tpu.ops.contacts import SolverConfig
from pybulletgym_tpu.ops.step import PhysicsConfig


class InvertedPendulumTask(Task):
    """Cart-pole balance / swing-up [ref: …/robots/pendula/interted_pendulum.py
    · InvertedPendulum]."""

    def __init__(self, swingup: bool = False):
        self.swingup = swingup
        self.model = load_mjcf(asset_path("inverted_pendulum.xml"))
        self.physics = PhysicsConfig(
            timestep=0.0165, frame_skip=1, gravity=(0.0, 0.0, -9.8),
            solver=SolverConfig(),
        )
        m = self.model
        self.slider_dof = m.dof_index("slider")
        self.hinge_dof = m.dof_index("hinge")
        self.slider_qadr = _qadr(m, self.slider_dof)
        self.hinge_qadr = _qadr(m, self.hinge_dof)
        self.obs_dim = 5
        self.act_dim = 1
        self.max_episode_steps = 1000
        self.torque_gain = 100.0

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        u = rand.uniform(seed, 0, env_id, epoch, -0.1, 0.1)
        q[self.hinge_qadr] = (np.pi if self.swingup else 0.0) + u
        v = [jnp.zeros_like(like) for _ in range(m.nv)]
        return q, v, {}

    def action_tau_scalar(self, a):
        tau = [0.0] * self.model.nv
        tau[self.slider_dof] = self.torque_gain * a[0]
        return tau

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        theta = q[self.hinge_qadr]
        theta_dot = v[self.hinge_dof]
        x = q[self.slider_qadr]
        vx = v[self.slider_dof]
        obs = [x, vx, jnp.cos(theta), jnp.sin(theta), theta_dot]
        if self.swingup:
            reward = jnp.cos(theta)
            terminated = jnp.zeros_like(reward, bool)
        else:
            reward = jnp.ones_like(theta)
            terminated = jnp.abs(theta) > 0.2
        return obs, reward, terminated, dict(aux), {"reward": reward}


class InvertedDoublePendulumTask(Task):
    """[ref: …/robots/pendula/inverted_double_pendulum.py +
    …/envs/pendulum/inverted_double_pendulum_env.py]."""

    def __init__(self):
        self.model = load_mjcf(asset_path("inverted_double_pendulum.xml"))
        self.physics = PhysicsConfig(
            timestep=0.0165, frame_skip=1, gravity=(0.0, 0.0, -9.8),
            solver=SolverConfig(),
        )
        m = self.model
        self.slider_dof = m.dof_index("slider")
        self.j1_dof = m.dof_index("hinge")
        self.j2_dof = m.dof_index("hinge2")
        self.slider_qadr = _qadr(m, self.slider_dof)
        self.j1_qadr = _qadr(m, self.j1_dof)
        self.j2_qadr = _qadr(m, self.j2_dof)
        self.pole2 = m.body_index("pole2")
        self.obs_dim = 9
        self.act_dim = 1
        self.max_episode_steps = 1000
        self.torque_gain = 200.0

    def initial_state_scalar(self, seed, env_id, epoch):
        m = self.model
        like = (seed * 0).astype(jnp.int32).astype(jnp.float32)
        q = [jnp.full_like(like, float(x)) for x in m.qpos0]
        q[self.j1_qadr] = rand.uniform(seed, 0, env_id, epoch, -0.1, 0.1)
        q[self.j2_qadr] = rand.uniform(seed, 1, env_id, epoch, -0.1, 0.1)
        v = [jnp.zeros_like(like) for _ in range(m.nv)]
        return q, v, {}

    def action_tau_scalar(self, a):
        tau = [0.0] * self.model.nv
        tau[self.slider_dof] = self.torque_gain * a[0]
        return tau

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        m = self.model
        fk = dyn.forward_kinematics(m, q, v, with_inertia=False)
        com2 = fk.com[self.pole2]
        pos_x, pos_y = com2[0], com2[2]  # reference naming: y is height

        theta, theta_dot = q[self.j1_qadr], v[self.j1_dof]
        gamma, gamma_dot = q[self.j2_qadr], v[self.j2_dof]
        x, vx = q[self.slider_qadr], v[self.slider_dof]
        obs = [x, vx, pos_x,
               jnp.cos(theta), jnp.sin(theta), theta_dot,
               jnp.cos(gamma), jnp.sin(gamma), gamma_dot]
        dist_penalty = 0.01 * pos_x**2 + (pos_y + 0.3 - 2.0) ** 2
        vel_penalty = 1e-3 * theta_dot**2 + 5e-3 * gamma_dot**2
        alive = 10.0 * jnp.ones_like(x)
        reward = alive - dist_penalty - vel_penalty
        terminated = (pos_y + 0.3) <= 1.0
        comps = {"alive": alive, "dist_penalty": -dist_penalty, "vel_penalty": -vel_penalty}
        return obs, reward, terminated, dict(aux), comps


def _qadr(model, v_adr: int) -> int:
    for b in model.bodies:
        if b.v_adr == v_adr:
            return b.q_adr
    raise ValueError(v_adr)
