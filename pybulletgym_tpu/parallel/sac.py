"""Soft Actor-Critic over batched envs — the off-policy companion to
`parallel.ppo` for hard-exploration tasks (pendulum swing-up, where PPO's
on-policy exploration falls into the spin attractor).

The reference has no trainer at all (SURVEY §2.3); both learners exist to
*produce* the frozen-policy demos its `enjoy_TF_*` scripts ship
[ref: examples/roboschool-weights — SmallReactivePolicy].

TPU-first design: everything — env stepping, the on-device replay ring,
minibatch sampling, twin-Q/actor/alpha updates, Polyak averaging — lives
inside ONE jitted `iteration` function. The replay buffer is a pytree of
(slots, B, dim) arrays sharded the same way as the env batch (env axis
trailing on dim-1): inserts are `dynamic_update_slice_in_dim` on the slot
axis, samples are per-device `jax.random.randint` gathers, so a mesh run
keeps replay fully local to each shard with zero cross-device traffic.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.envs.base import EnvState, Task, make_env
from pybulletgym_tpu.parallel import networks as nets
from pybulletgym_tpu.parallel.ppo import _adam


@dataclasses.dataclass(frozen=True)
class SACConfig:
    hidden: Tuple[int, ...] = (256, 256)
    discount: float = 0.99
    tau: float = 0.005              # Polyak rate for target critics
    learning_rate: float = 3e-4
    alpha_lr: float = 3e-4
    init_alpha: float = 0.2
    # entropy target: -act_dim (SAC default)
    buffer_slots: int = 512         # capacity = slots * num_envs transitions
    steps_per_iter: int = 4         # env steps collected per iteration
    updates_per_iter: int = 4       # gradient updates per iteration
    batch_size: int = 1024          # minibatch transitions per update
    warmup_steps: int = 32          # random-policy slots before learning
    # anti-saturation guards: without them the pre-tanh mean can drift far
    # past +-1 early (Q briefly favors bang-bang), after which tanh'(pre)=0
    # freezes the actor permanently (observed: mean=8.2 for every state)
    pre_reg: float = 1e-3           # penalty on pre-tanh mean magnitude
    alpha_min: float = 0.01         # floor for the entropy temperature


class QParams(NamedTuple):
    q1: nets.MLPParams
    q2: nets.MLPParams


class SACState(NamedTuple):
    actor: nets.MLPParams           # outputs concat(mean, log_std)
    critics: QParams
    targets: QParams
    log_alpha: jax.Array
    opt_actor: tuple                # (m, v, count)
    opt_critic: tuple
    opt_alpha: tuple
    key: jax.Array
    # replay ring: (slots, dim, B) batch-trailing like EnvState
    buf_obs: jax.Array
    buf_act: jax.Array
    buf_rew: jax.Array              # (slots, B)
    buf_next_obs: jax.Array
    buf_nonterm: jax.Array          # (slots, B) 1 - terminated (truncation bootstraps)
    buf_ptr: jax.Array              # () int32 next slot
    buf_full: jax.Array             # () bool


LOG_STD_MIN, LOG_STD_MAX = -10.0, 2.0


def actor_dist(actor: nets.MLPParams, obs):
    out = nets.mlp_apply(actor, obs)
    mean, log_std = jnp.split(out, 2, axis=-1)
    log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
    return mean, log_std


def sample_action(actor, obs, key):
    """tanh-squashed Gaussian with change-of-variables log-prob."""
    mean, log_std = actor_dist(actor, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    pre = mean + std * eps
    a = jnp.tanh(pre)
    logp = jnp.sum(
        -0.5 * eps**2 - log_std - 0.5 * np.log(2 * np.pi)
        - jnp.log(1.0 - a**2 + 1e-6),
        axis=-1,
    )
    return a, logp


def det_action(actor, obs):
    mean, _ = actor_dist(actor, obs)
    return jnp.tanh(mean)


def q_apply(q: nets.MLPParams, obs, act):
    return nets.mlp_apply(q, jnp.concatenate([obs, act], axis=-1))[..., 0]


def init_sac_state(key, obs_dim: int, act_dim: int, num_envs: int,
                   cfg: SACConfig) -> SACState:
    ka, k1, k2, kr = jax.random.split(key, 4)
    actor = nets.init_mlp(ka, (obs_dim, *cfg.hidden, 2 * act_dim))
    q1 = nets.init_mlp(k1, (obs_dim + act_dim, *cfg.hidden, 1), final_scale=1.0)
    q2 = nets.init_mlp(k2, (obs_dim + act_dim, *cfg.hidden, 1), final_scale=1.0)
    critics = QParams(q1, q2)

    def opt(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return (z, jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))

    S, B = cfg.buffer_slots, num_envs
    return SACState(
        actor=actor, critics=critics,
        targets=jax.tree.map(lambda x: x.copy(), critics),
        log_alpha=jnp.asarray(np.log(cfg.init_alpha), jnp.float32),
        opt_actor=opt(actor), opt_critic=opt(critics),
        opt_alpha=(jnp.zeros(()), jnp.zeros(()), jnp.zeros((), jnp.int32)),
        key=kr,
        buf_obs=jnp.zeros((S, obs_dim, B)),
        buf_act=jnp.zeros((S, act_dim, B)),
        buf_rew=jnp.zeros((S, B)),
        buf_next_obs=jnp.zeros((S, obs_dim, B)),
        buf_nonterm=jnp.ones((S, B)),
        buf_ptr=jnp.zeros((), jnp.int32),
        buf_full=jnp.zeros((), bool),
    )


def make_sac_iteration(task: Task, cfg: SACConfig, step_fn=None):
    """iteration(ss: SACState, es: EnvState) -> (ss, es, metrics)."""
    if step_fn is None:
        _, step_fn = make_env(task)
    act_dim = task.act_dim
    target_entropy = -float(act_dim)
    S = cfg.buffer_slots

    def collect(ss: SACState, es: EnvState, key, random_policy):
        def body(carry, k):
            ss, es = carry
            obs = es.obs.T                                   # (B, obs)
            a_pi, _ = sample_action(ss.actor, obs, k)
            a_rand = jax.random.uniform(
                jax.random.fold_in(k, 1), a_pi.shape, minval=-1.0, maxval=1.0
            )
            a = jnp.where(random_policy, a_rand, a_pi)
            es2 = step_fn(es, a.T)
            # next-step autoreset: es2.obs at done IS the terminal obs
            ptr = ss.buf_ptr % S
            upd = lambda buf, row: jax.lax.dynamic_update_slice_in_dim(
                buf, row[None], ptr, axis=0
            )
            term = es2.terminated.astype(jnp.float32)
            ss = ss._replace(
                buf_obs=upd(ss.buf_obs, es.obs),
                buf_act=upd(ss.buf_act, a.T.astype(ss.buf_act.dtype)),
                buf_rew=upd(ss.buf_rew, es2.reward),
                buf_next_obs=upd(ss.buf_next_obs, es2.obs),
                buf_nonterm=upd(ss.buf_nonterm, 1.0 - term),
                buf_ptr=ss.buf_ptr + 1,
                buf_full=ss.buf_full | (ss.buf_ptr + 1 >= S),
            )
            return (ss, es2), es2.reward

        keys = jax.random.split(key, cfg.steps_per_iter)
        (ss, es), rews = jax.lax.scan(body, (ss, es), keys)
        return ss, es, rews

    def sample_batch(ss: SACState, key):
        B = ss.buf_rew.shape[-1]
        hi = jnp.where(ss.buf_full, S, jnp.maximum(ss.buf_ptr, 1))
        ks, ke = jax.random.split(key)
        slots = jax.random.randint(ks, (cfg.batch_size,), 0, hi)
        envs = jax.random.randint(ke, (cfg.batch_size,), 0, B)
        g = lambda buf: buf[slots, :, envs] if buf.ndim == 3 else buf[slots, envs]
        return (g(ss.buf_obs), g(ss.buf_act), g(ss.buf_rew),
                g(ss.buf_next_obs), g(ss.buf_nonterm))

    def update(ss: SACState, key):
        k_samp, k_next, k_pi = jax.random.split(key, 3)
        obs, act, rew, next_obs, nonterm = sample_batch(ss, k_samp)
        alpha = jnp.exp(ss.log_alpha)

        na, nlogp = sample_action(ss.actor, next_obs, k_next)
        tq = jnp.minimum(
            q_apply(ss.targets.q1, next_obs, na),
            q_apply(ss.targets.q2, next_obs, na),
        )
        y = rew + cfg.discount * nonterm * (tq - alpha * nlogp)
        y = jax.lax.stop_gradient(y)

        def critic_loss(critics: QParams):
            e1 = q_apply(critics.q1, obs, act) - y
            e2 = q_apply(critics.q2, obs, act) - y
            return 0.5 * jnp.mean(e1**2 + e2**2)

        closs, cgrad = jax.value_and_grad(critic_loss)(ss.critics)
        m, v, c = ss.opt_critic
        critics, m, v, c = _adam(ss.critics, cgrad, m, v, c,
                                 cfg.learning_rate, max_norm=1e9)
        opt_critic = (m, v, c)

        def actor_loss(actor):
            mean, log_std = actor_dist(actor, obs)
            std = jnp.exp(log_std)
            eps = jax.random.normal(k_pi, mean.shape, mean.dtype)
            pre = mean + std * eps
            a = jnp.tanh(pre)
            logp = jnp.sum(
                -0.5 * eps**2 - log_std - 0.5 * np.log(2 * np.pi)
                - jnp.log(1.0 - a**2 + 1e-6),
                axis=-1,
            )
            q = jnp.minimum(
                q_apply(critics.q1, obs, a), q_apply(critics.q2, obs, a)
            )
            reg = cfg.pre_reg * jnp.mean(jnp.sum(mean**2, axis=-1))
            return jnp.mean(alpha * logp - q) + reg, logp

        (aloss, logp), agrad = jax.value_and_grad(actor_loss, has_aux=True)(ss.actor)
        m, v, c = ss.opt_actor
        actor, m, v, c = _adam(ss.actor, agrad, m, v, c,
                               cfg.learning_rate, max_norm=1e9)
        opt_actor = (m, v, c)

        def alpha_loss(log_alpha):
            return -jnp.mean(
                log_alpha * jax.lax.stop_gradient(logp + target_entropy)
            )

        gl = jax.grad(alpha_loss)(ss.log_alpha)
        m, v, c = ss.opt_alpha
        log_alpha, m, v, c = _adam(ss.log_alpha, gl, m, v, c,
                                   cfg.alpha_lr, max_norm=1e9)
        log_alpha = jnp.maximum(log_alpha, np.log(cfg.alpha_min))
        opt_alpha = (m, v, c)

        targets = jax.tree.map(
            lambda t, p: (1 - cfg.tau) * t + cfg.tau * p, ss.targets, critics
        )
        ss = ss._replace(
            actor=actor, critics=critics, targets=targets,
            log_alpha=log_alpha, opt_actor=opt_actor,
            opt_critic=opt_critic, opt_alpha=opt_alpha,
        )
        return ss, (closs, aloss, jnp.exp(log_alpha))

    def iteration(ss: SACState, es: EnvState):
        key, k_coll, k_upd = jax.random.split(ss.key, 3)
        ss = ss._replace(key=key)
        random_policy = (~ss.buf_full) & (ss.buf_ptr < cfg.warmup_steps)
        ss, es, rews = collect(ss, es, k_coll, random_policy)

        def upd_body(carry, k):
            ss, metrics = carry
            ss, m = update(ss, k)
            return (ss, m), None

        can_learn = ss.buf_full | (ss.buf_ptr >= cfg.warmup_steps)

        zero = jnp.zeros((), jnp.float32)

        def do_updates(ss):
            (ss, m), _ = jax.lax.scan(
                upd_body, (ss, (zero, zero, jnp.exp(ss.log_alpha))),
                jax.random.split(k_upd, cfg.updates_per_iter),
            )
            return ss, m

        ss, (closs, aloss, alpha) = jax.lax.cond(
            can_learn, do_updates,
            lambda ss: (ss, (zero, zero, jnp.exp(ss.log_alpha))), ss,
        )
        metrics = {
            "reward_mean": rews.mean(),
            "critic_loss": closs,
            "actor_loss": aloss,
            "alpha": alpha,
        }
        return ss, es, metrics

    return iteration
