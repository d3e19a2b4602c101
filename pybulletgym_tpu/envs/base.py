"""Batched functional env core: state pytree, auto-reset, episode bookkeeping.

The reference's env loop is host-side Python over one Bullet world per env
object [ref: env_bases.py · BaseBulletEnv.step/reset]; here an env *batch*
is a pytree of arrays and `step` is one jitted function:

    action -> torques -> frame_skip physics substeps -> obs/reward/done
           -> auto-reset (lax.select per env) -> bookkeeping

all on-device, zero host crossings. Auto-reset uses gymnasium's "next-step"
semantics: the obs returned alongside done=True is the terminal obs; the
following step starts the new episode (the reference requires a manual
`reset()` call instead [ref: env_bases.py · BaseBulletEnv.reset]).

NaN guard: the reference forces done when the state goes non-finite
[ref: walker_base_env.py · step]; we do the same per env in the batch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.models.schema import Model
from pybulletgym_tpu.ops.step import PhysicsConfig, make_physics_step


class EnvState(NamedTuple):
    """Everything about a batch of envs, batch-trailing layout internally.

    `aux` holds task-specific per-env scalars (potential, walk target, ...);
    `rewards` holds the reference's reward decomposition
    [ref: walker_base_env.py · step — self.rewards list].
    """

    q: jax.Array            # (nq, B)
    v: jax.Array            # (nv, B)
    obs: jax.Array          # (obs_dim, B)
    reward: jax.Array       # (B,)
    terminated: jax.Array   # (B,) bool
    truncated: jax.Array    # (B,) bool
    step_count: jax.Array   # (B,) int32
    epoch: jax.Array        # (B,) uint32 — reset counter, feeds RNG streams
    env_id: jax.Array       # (B,) int32
    seed: jax.Array         # (B,) uint32
    aux: Dict[str, jax.Array]
    rewards: Dict[str, jax.Array]

    @property
    def done(self):
        return self.terminated | self.truncated


class Task:
    """Per-env-family behavior: initial states, torque mapping, obs/reward.

    Concrete tasks (locomotion, pendula, manipulation) implement the
    *scalar-core* hooks, which operate on SoA lists of per-env scalar
    arrays of ANY shape — (B,) under the XLA path, (8, 128) env tiles
    inside the Pallas kernel:

      initial_state_scalar(seed, env_id, epoch) -> (q_list, v_list, aux)
      action_tau_scalar(a_list) -> tau_list
      output_scalar(q_list, v_list, depth_list, a_list, aux, ids=None)
          -> (obs_list, reward, terminated_bool, new_aux, reward_components)

    `ids` is the per-env RNG identity (seed, env_id, epoch) for tasks that
    draw randomness *during* an episode (flag repositioning, cube throws
    [ref: HumanoidFlagrun.flag_reposition]); pure tasks ignore it.

    The stacked-array wrappers below adapt them to the (rows, B) layout the
    XLA env path uses.
    """

    model: Model
    physics: PhysicsConfig
    obs_dim: int
    act_dim: int
    max_episode_steps: int

    def initial_state_scalar(self, seed, env_id, epoch):
        raise NotImplementedError

    def action_tau_scalar(self, a):
        raise NotImplementedError

    def output_scalar(self, q, v, depths, a, aux, ids=None):
        raise NotImplementedError

    def pre_physics_scalar(self, q, v, aux, ids=None):
        """Optional pre-step state edit (e.g. FlagrunHarder's hurled cube
        [ref: HumanoidFlagrunHarder.alive_bonus — aggressive_cube reset]).
        Returns (q, v, aux); default is identity."""
        return q, v, aux

    # ---- stacked-array adapters (XLA path) ----------------------------

    def initial_state(self, seed, env_id, epoch):
        q, v, aux = self.initial_state_scalar(seed, env_id, epoch)
        return jnp.stack(list(q), 0), jnp.stack(list(v), 0), aux

    def action_tau(self, action):
        tau = self.action_tau_scalar([action[i] for i in range(self.act_dim)])
        B = action.shape[-1]
        return jnp.stack(
            [t if not _is0f(t) else jnp.zeros((B,), action.dtype) for t in tau], 0
        )

    def pre_physics(self, q, v, aux, ids):
        q2, v2, aux2 = self.pre_physics_scalar(
            [q[i] for i in range(self.model.nq)],
            [v[i] for i in range(self.model.nv)],
            aux, ids,
        )
        return jnp.stack(list(q2), 0), jnp.stack(list(v2), 0), aux2

    def output(self, q, v, depths, action, aux, ids=None):
        obs, reward, term, aux2, comps = self.output_scalar(
            [q[i] for i in range(self.model.nq)],
            [v[i] for i in range(self.model.nv)],
            [depths[i] for i in range(depths.shape[0])],
            [action[i] for i in range(self.act_dim)],
            aux, ids,
        )
        return jnp.stack(list(obs), 0), reward, term, aux2, comps


def _is0f(x):
    return isinstance(x, float) and x == 0.0


def make_env(task: Task):
    """Build (reset_fn, step_fn) pure functions for a task.

    reset_fn(seed: (B,) uint32, env_id, epoch) -> EnvState
    step_fn(state, action (act, B)) -> EnvState
    """
    phys_step, plan, n_rows = make_physics_step(task.model, task.physics)

    def _fresh(seed, env_id, epoch):
        q, v, aux = task.initial_state(seed, env_id, epoch)
        return q, v, aux

    has_pre = type(task).pre_physics_scalar is not Task.pre_physics_scalar

    def reset_fn(seed, env_id, epoch):
        q, v, aux = _fresh(seed, env_id, epoch)
        B = q.shape[-1]
        zero_depths = jnp.zeros((n_rows, B), q.dtype)
        zero_act = jnp.zeros((task.act_dim, B), q.dtype)
        obs, _, _, aux, comps = task.output(
            q, v, zero_depths, zero_act, aux, (seed, env_id, epoch)
        )
        # every leaf gets its OWN buffer: jit callers may donate the whole
        # EnvState, and XLA rejects donation of aliased buffers
        zb = lambda: jnp.zeros((B,), q.dtype)
        return EnvState(
            q=q, v=v, obs=obs, reward=zb(),
            terminated=jnp.zeros((B,), bool), truncated=jnp.zeros((B,), bool),
            step_count=jnp.zeros((B,), jnp.int32),
            epoch=jnp.asarray(epoch, jnp.uint32),
            env_id=jnp.asarray(env_id, jnp.int32),
            seed=jnp.asarray(seed, jnp.uint32),
            aux=aux, rewards={k: zb() for k in comps},
        )

    def step_fn(state: EnvState, action) -> EnvState:
        # ---- auto-reset envs that finished last step -------------------
        need = state.done
        epoch = state.epoch + need.astype(jnp.uint32)
        fq, fv, faux = _fresh(state.seed, state.env_id, epoch)
        q = jnp.where(need[None, :], fq, state.q)
        v = jnp.where(need[None, :], fv, state.v)
        aux = {
            k: jnp.where(need, faux[k], state.aux[k]) if faux[k].ndim == 1
            else jnp.where(need[None, :], faux[k], state.aux[k])
            for k in faux
        }
        step_count = jnp.where(need, 0, state.step_count)

        # ---- physics + outputs ----------------------------------------
        ids = (state.seed, state.env_id, epoch)
        if has_pre:
            q, v, aux = task.pre_physics(q, v, aux, ids)
        a = jnp.clip(action, -1.0, 1.0)
        tau = task.action_tau(a)
        q2, v2, depths = phys_step(q, v, tau)
        obs, reward, terminated, aux2, comps = task.output(
            q2, v2, depths, a, aux, ids
        )

        # ---- NaN guard [ref: walker_base_env.py · step isfinite check] --
        bad = ~(
            jnp.all(jnp.isfinite(obs), axis=0)
            & jnp.all(jnp.isfinite(q2), axis=0)
            & jnp.all(jnp.isfinite(v2), axis=0)
        )
        terminated = terminated | bad
        obs = jnp.nan_to_num(obs, nan=0.0, posinf=0.0, neginf=0.0)
        reward = jnp.nan_to_num(reward, nan=0.0, posinf=0.0, neginf=0.0)

        step_count = step_count + 1
        truncated = (step_count >= task.max_episode_steps) & ~terminated
        return EnvState(
            q=q2, v=v2, obs=obs, reward=reward,
            terminated=terminated, truncated=truncated,
            step_count=step_count, epoch=epoch,
            env_id=state.env_id, seed=state.seed,
            aux=aux2, rewards=comps,
        )

    return reset_fn, step_fn


class BatchedEnv:
    """Convenience host-side wrapper: jitted reset/step over a fixed batch.

    The batch-leading (B, dim) convention is used at this public boundary;
    internally everything is batch-trailing (see ops.step docstring).
    """

    def __init__(
        self, task: Task, batch_size: int, jit: bool = True,
        backend: Optional[str] = None,
    ):
        self.task = task
        self.batch_size = batch_size
        self._reset, self._step = make_env(task)
        if backend is None:
            # The Pallas engine is the TPU fast path (see ops.pallas_engine);
            # the XLA path serves CPU testing and odd batch sizes.
            on_accel = jax.default_backend() not in ("cpu",)
            backend = "pallas" if (on_accel and batch_size % 1024 == 0) else "xla"
        self.backend = backend
        if backend == "pallas":
            from pybulletgym_tpu.ops.pallas_engine import TILE, make_pallas_env_step

            if batch_size % TILE != 0:
                raise ValueError(
                    f"pallas backend needs batch_size % {TILE} == 0, got "
                    f"{batch_size}; use backend='xla' for odd sizes"
                )
            self._step = make_pallas_env_step(task)
        if jit:
            self._reset = jax.jit(self._reset)
            self._step = jax.jit(self._step)

    @property
    def observation_size(self) -> int:
        return self.task.obs_dim

    @property
    def action_size(self) -> int:
        return self.task.act_dim

    def reset(self, seed: int = 0, epoch: int = 0) -> EnvState:
        B = self.batch_size
        return self._reset(
            jnp.full((B,), seed, jnp.uint32),
            jnp.arange(B, dtype=jnp.int32),
            jnp.full((B,), epoch, jnp.uint32),
        )

    def step(self, state: EnvState, action) -> EnvState:
        """action: (B, act_dim) batch-leading (public convention)."""
        action = jnp.asarray(action)
        expect = (self.batch_size, self.task.act_dim)
        if action.shape != expect:
            raise ValueError(f"action shape {action.shape} != {expect}")
        return self._step(state, action.T)

    @staticmethod
    def observations(state: EnvState):
        """(B, obs_dim) batch-leading view of the current observations."""
        return state.obs.T
