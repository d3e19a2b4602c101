"""PPO learner over sharded env batches (benchmark configs 4–5,
BASELINE.md): rollout -> GAE -> clipped-surrogate updates, all inside one
jitted train step.

Scaling design (SURVEY §2.3 / §7 step 7): the env batch is sharded over the
``('env',)`` mesh axis; params are replicated. Every reduction over the
batch (loss means, gradient sums) is written as a plain ``jnp.mean`` —
under jit with sharded inputs XLA lowers these to psum collectives over
ICI/DCN automatically. Minibatches are contiguous slices along the env
axis, so each update touches only device-local data until the gradient
all-reduce.

The reference has no trainer at all; the `enjoy_TF_*` scripts show the
policy family this learner trains [ref: examples/roboschool-weights/
enjoy_TF_*.py · SmallReactivePolicy].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pybulletgym_tpu.envs.base import EnvState, Task, make_env
from pybulletgym_tpu.parallel import networks as nets


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    rollout_length: int = 32
    num_epochs: int = 4
    num_minibatches: int = 4
    discount: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.0
    learning_rate: float = 3e-4
    max_grad_norm: float = 0.5
    hidden: Tuple[int, ...] = (64, 64)
    normalize_obs: bool = False
    # 0 = constant lr; otherwise linear anneal to 0 over this many Adam
    # updates (= iters * num_epochs * num_minibatches)
    total_updates: int = 0


class ObsStats(NamedTuple):
    """Running observation statistics (parallel Welford over env shards:
    every reduction is a jnp mean/sum, so XLA inserts the cross-shard
    collectives under jit exactly like the gradient psum)."""

    mean: jax.Array   # (obs_dim,)
    var: jax.Array    # (obs_dim,)
    count: jax.Array  # ()

    def normalize(self, obs):
        return jnp.clip(
            (obs - self.mean) / jnp.sqrt(self.var + 1e-8), -10.0, 10.0
        )

    def update(self, obs2d):
        """Fold a (N, obs_dim) batch of observations."""
        n = jnp.float32(obs2d.shape[0])
        bm = obs2d.mean(0)
        bv = obs2d.var(0)
        tot = self.count + n
        delta = bm - self.mean
        mean = self.mean + delta * (n / tot)
        m2 = self.var * self.count + bv * n + delta ** 2 * self.count * n / tot
        return ObsStats(mean, m2 / tot, tot)


class TrainState(NamedTuple):
    params: nets.ACParams
    opt_m: nets.ACParams       # Adam first moment (same treedef as params)
    opt_v: nets.ACParams       # Adam second moment
    opt_count: jax.Array
    key: jax.Array
    obs_stats: ObsStats


class Transition(NamedTuple):
    obs: jax.Array       # (B, obs_dim)
    action: jax.Array    # (B, act)
    logp: jax.Array      # (B,)
    value: jax.Array     # (B,)
    reward: jax.Array    # (B,)
    done: jax.Array      # (B,) float — episode boundary AFTER this step
    truncated: jax.Array # (B,) float


def init_train_state(key, obs_dim: int, act_dim: int, cfg: PPOConfig) -> TrainState:
    kp, kr = jax.random.split(key)
    params = nets.init_actor_critic(kp, obs_dim, act_dim, cfg.hidden)
    zeros = jax.tree.map(jnp.zeros_like, params)
    stats = ObsStats(jnp.zeros((obs_dim,)), jnp.ones((obs_dim,)),
                     jnp.zeros(()))
    return TrainState(params, zeros, zeros, jnp.zeros((), jnp.int32), kr, stats)


def _adam(params, grads, m, v, count, lr, b1=0.9, b2=0.999, eps=1e-8, max_norm=0.5):
    gnorm = jnp.sqrt(
        sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)) + 1e-12
    )
    scale = jnp.minimum(1.0, max_norm / gnorm)
    grads = jax.tree.map(lambda g: g * scale, grads)
    count = count + 1
    m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, m, grads)
    v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, v, grads)
    c = count.astype(jnp.float32)
    mhat_scale = 1.0 / (1 - b1 ** c)
    vhat_scale = 1.0 / (1 - b2 ** c)
    params = jax.tree.map(
        lambda p, mm, vv: p - lr * (mm * mhat_scale) / (jnp.sqrt(vv * vhat_scale) + eps),
        params, m, v,
    )
    return params, m, v, count


def make_train_step(task: Task, cfg: PPOConfig, step_fn=None):
    """Build train_step(ts: TrainState, es: EnvState) -> (ts, es, metrics).

    One call = rollout_length env steps + num_epochs x num_minibatches PPO
    updates, fully on-device. Jit it (optionally with shardings from
    parallel.mesh) to run.
    """
    if step_fn is None:
        _, step_fn = make_env(task)

    def rollout(params, norm, es: EnvState, key):
        def body(carry, k):
            es = carry
            obs = norm(es.obs.T)  # (B, obs_dim)
            a, logp = nets.policy_sample(params, obs, k)
            val = nets.value_apply(params, obs)
            a_clip = jnp.clip(a, -1.0, 1.0)
            es2 = step_fn(es, a_clip.T)
            t = Transition(
                obs=obs, action=a, logp=logp, value=val,
                reward=es2.reward,
                done=(es2.terminated | es2.truncated).astype(jnp.float32),
                truncated=es2.truncated.astype(jnp.float32),
            )
            # raw obs come back separately: stats must fold UNnormalized data
            return es2, (t, es.obs.T)

        keys = jax.random.split(key, cfg.rollout_length)
        es, (traj, raw_obs) = jax.lax.scan(body, es, keys)
        return es, traj, raw_obs

    def gae(traj: Transition, last_value):
        """GAE under next-step auto-reset semantics (envs.base step_fn
        resets at the START of the following step), so traj.obs[t+1] at an
        episode boundary IS the terminal observation and traj.value[t+1]
        is V(terminal obs). Hence:

          delta_t = r_t + gamma * V(s_{t+1}) * (1 - terminated_t) - V(s_t)

        bootstraps truncated-but-not-terminated episodes from the critic's
        value of the final observation for free, while terminated ones get
        the correct 0 bootstrap; the advantage recursion is cut at every
        boundary with THIS step's done flag (the previous version applied
        the next step's flag — an off-by-one that leaked advantage chains
        across episode boundaries and bootstrapped through terminations).
        """

        def body(carry, t):
            adv_next, v_next = carry
            terminated = t.done - t.truncated  # step_fn keeps these disjoint
            delta = (
                t.reward + cfg.discount * v_next * (1.0 - terminated) - t.value
            )
            adv = delta + cfg.discount * cfg.gae_lambda * (1.0 - t.done) * adv_next
            return (adv, t.value), adv

        init = (jnp.zeros_like(last_value), last_value)
        _, advs = jax.lax.scan(body, init, traj, reverse=True)
        returns = advs + traj.value
        return advs, returns

    def loss_fn(params, batch, advs, returns):
        logp, entropy = nets.policy_logp_entropy(params, batch.obs, batch.action)
        ratio = jnp.exp(logp - batch.logp)
        adv_n = (advs - jnp.mean(advs)) / (jnp.std(advs) + 1e-8)
        unclipped = ratio * adv_n
        clipped = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv_n
        pg_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        value = nets.value_apply(params, batch.obs)
        v_loss = 0.5 * jnp.mean((value - returns) ** 2)
        loss = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * entropy
        return loss, (pg_loss, v_loss)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(ts: TrainState, es: EnvState):
        key, k_roll, k_perm = jax.random.split(ts.key, 3)
        norm = ts.obs_stats.normalize if cfg.normalize_obs else (lambda x: x)
        es, traj, raw_obs = rollout(ts.params, norm, es, k_roll)
        last_value = nets.value_apply(ts.params, norm(es.obs.T))
        advs, returns = gae(traj, last_value)
        obs_stats = (
            ts.obs_stats.update(raw_obs.reshape(-1, raw_obs.shape[-1]))
            if cfg.normalize_obs else ts.obs_stats
        )

        # (T, B, ...) -> minibatches as contiguous env-axis slices: stays
        # local to each mesh shard until the gradient all-reduce.
        B = traj.reward.shape[-1]
        mb = cfg.num_minibatches
        assert B % mb == 0, f"batch {B} must divide num_minibatches {mb}"

        def epoch(carry, _):
            params, m, v, count = carry

            def minibatch(carry, i):
                params, m, v, count = carry
                sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * (B // mb), B // mb, 1)
                batch = Transition(
                    obs=sl(traj.obs).reshape(-1, traj.obs.shape[-1]),
                    action=sl(traj.action).reshape(-1, traj.action.shape[-1]),
                    logp=sl(traj.logp).reshape(-1),
                    value=sl(traj.value).reshape(-1),
                    reward=sl(traj.reward).reshape(-1),
                    done=sl(traj.done).reshape(-1),
                    truncated=sl(traj.truncated).reshape(-1),
                )
                (loss, aux), grads = grad_fn(
                    params, batch, sl(advs).reshape(-1), sl(returns).reshape(-1)
                )
                lr = cfg.learning_rate
                if cfg.total_updates:
                    frac = 1.0 - count.astype(jnp.float32) / cfg.total_updates
                    lr = lr * jnp.maximum(frac, 0.0)
                params, m, v, count = _adam(
                    params, grads, m, v, count,
                    lr, max_norm=cfg.max_grad_norm,
                )
                return (params, m, v, count), loss

            carry, losses = jax.lax.scan(
                minibatch, (params, m, v, count), jnp.arange(mb)
            )
            return carry, losses

        (params, m, v, count), losses = jax.lax.scan(
            epoch, (ts.params, ts.opt_m, ts.opt_v, ts.opt_count), None,
            length=cfg.num_epochs,
        )
        metrics = {
            "loss": losses.mean(),
            "reward_mean": traj.reward.mean(),
            "done_frac": traj.done.mean(),
            "value_mean": traj.value.mean(),
        }
        return TrainState(params, m, v, count, key, obs_stats), es, metrics

    return train_step


def train(env_id: str, batch_size: int, num_iterations: int,
          cfg: Optional[PPOConfig] = None, seed: int = 0, mesh=None,
          backend: str = "xla", progress=None,
          resume_from: Optional[str] = None):
    """Host-side training driver: jit once, loop train_step.
    `resume_from`: path of a TrainState checkpoint (utils.checkpoint.save)
    to continue from instead of a fresh init."""
    import pybulletgym_tpu as pg
    from pybulletgym_tpu.parallel import mesh as pmesh

    cfg = cfg or PPOConfig()
    env = pg.make_batched(env_id, batch_size, backend=backend, jit=False)
    train_step = make_train_step(env.task, cfg, step_fn=env._step)
    ts = init_train_state(jax.random.PRNGKey(seed), env.observation_size,
                          env.action_size, cfg)
    if resume_from is not None:
        from pybulletgym_tpu.utils import checkpoint

        ts = checkpoint.load(resume_from, ts)
    es = env.reset(seed=seed)
    if mesh is not None:
        es = pmesh.shard_env_state(es, mesh)
        ts = jax.tree.map(
            lambda x: jax.device_put(x, pmesh.replicated(mesh)), ts
        )
    # donated inputs must not alias: the TPU runtime dedupes identical
    # constants (zeros) into one buffer, so force unique buffers once
    ts = jax.tree.map(lambda x: x.copy(), ts)
    es = jax.tree.map(lambda x: x.copy(), es)
    step_j = jax.jit(train_step, donate_argnums=(0, 1))
    metrics = None
    for it in range(num_iterations):
        ts, es, metrics = step_j(ts, es)
        if progress is not None:
            progress(it, jax.tree.map(lambda x: float(x), metrics))
    return ts, es, metrics
