"""Policy/value networks.

The reference ships `SmallReactivePolicy` — a two-hidden-layer MLP with
frozen numpy weights [ref: examples/roboschool-weights/enjoy_TF_*.py ·
SmallReactivePolicy] — as its only "model". Here the same family is a
first-class trainable actor-critic: plain-pytree MLPs (no framework
overhead in the rollout hot loop), tanh activations, Gaussian policy with
state-independent log-std. Matmuls are (B, obs) x (obs, h) — batch in the
MXU sublane dimension, exactly the layout TPUs want.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class MLPParams(NamedTuple):
    weights: Tuple[jax.Array, ...]
    biases: Tuple[jax.Array, ...]


class ACParams(NamedTuple):
    policy: MLPParams
    value: MLPParams
    log_std: jax.Array  # (act_dim,)


def init_mlp(key, sizes: Sequence[int], final_scale: float = 0.01) -> MLPParams:
    ws, bs = [], []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, k in enumerate(keys):
        fan_in = sizes[i]
        scale = final_scale if i == len(keys) - 1 else 1.0
        w = jax.random.normal(k, (sizes[i], sizes[i + 1]), jnp.float32)
        w = w * (scale / np.sqrt(fan_in))
        ws.append(w)
        bs.append(jnp.zeros((sizes[i + 1],), jnp.float32))
    return MLPParams(tuple(ws), tuple(bs))


def mlp_apply(p: MLPParams, x: jax.Array) -> jax.Array:
    h = x
    n = len(p.weights)
    for i in range(n):
        h = h @ p.weights[i] + p.biases[i]
        if i < n - 1:
            h = jnp.tanh(h)
    return h


def init_actor_critic(key, obs_dim: int, act_dim: int,
                      hidden: Sequence[int] = (64, 64)) -> ACParams:
    kp, kv = jax.random.split(key)
    return ACParams(
        policy=init_mlp(kp, (obs_dim, *hidden, act_dim)),
        value=init_mlp(kv, (obs_dim, *hidden, 1), final_scale=1.0),
        log_std=jnp.zeros((act_dim,), jnp.float32),
    )


def policy_sample(params: ACParams, obs, key):
    """obs (B, obs_dim) -> (action (B, act), logp (B,))."""
    mean = mlp_apply(params.policy, obs)
    std = jnp.exp(params.log_std)
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    a = mean + std * eps
    logp = _gauss_logp(a, mean, params.log_std)
    return a, logp


def policy_logp_entropy(params: ACParams, obs, actions):
    mean = mlp_apply(params.policy, obs)
    logp = _gauss_logp(actions, mean, params.log_std)
    ent = jnp.sum(params.log_std + 0.5 * np.log(2 * np.pi * np.e))
    return logp, ent


def value_apply(params: ACParams, obs):
    return mlp_apply(params.value, obs)[..., 0]


def _gauss_logp(a, mean, log_std):
    z = (a - mean) / jnp.exp(log_std)
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * np.log(2 * np.pi), axis=-1)
