"""On-device episode statistics over auto-resetting env batches.

The reference exposes per-step reward components on the env object
[ref: walker_base_env.py · step — self.rewards] and leaves episode
aggregation to user code; with thousands of auto-resetting envs per chip
that aggregation must itself live on-device (SURVEY §5 observability plan).
`EpisodeStats` is a small pytree folded through `update` inside the jitted
rollout; host code reads means whenever convenient.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EpisodeStats(NamedTuple):
    running_return: jax.Array   # (B,) current-episode accumulated reward
    running_length: jax.Array   # (B,)
    sum_returns: jax.Array      # () sum of completed-episode returns
    sum_lengths: jax.Array      # ()
    n_episodes: jax.Array       # ()

    @classmethod
    def init(cls, batch: int) -> "EpisodeStats":
        z = jnp.zeros((batch,), jnp.float32)
        s = jnp.zeros((), jnp.float32)
        return cls(z, z + 0.0, s, s + 0.0, jnp.zeros((), jnp.int32))

    def update(self, reward, done) -> "EpisodeStats":
        """Fold one env step: `reward` (B,), `done` (B,) bool — the step's
        terminal flag (terminated | truncated)."""
        r = self.running_return + reward
        l = self.running_length + 1.0
        d = done.astype(jnp.float32)
        return EpisodeStats(
            running_return=r * (1.0 - d),
            running_length=l * (1.0 - d),
            sum_returns=self.sum_returns + jnp.sum(r * d),
            sum_lengths=self.sum_lengths + jnp.sum(l * d),
            n_episodes=self.n_episodes + jnp.sum(done.astype(jnp.int32)),
        )

    def mean_return(self):
        n = jnp.maximum(self.n_episodes, 1).astype(jnp.float32)
        return self.sum_returns / n

    def mean_length(self):
        n = jnp.maximum(self.n_episodes, 1).astype(jnp.float32)
        return self.sum_lengths / n
