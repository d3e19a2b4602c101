"""Single-env gymnasium.Env adapter over the batched functional core.

Bridges the reference's old-Gym API (`seed()`, 4-tuple step
[ref: env_bases.py · BaseBulletEnv]) to gymnasium 1.x semantics
(reset -> (obs, info), step -> 5-tuple). One adapter = a batch of 1 on
whatever JAX backend is active; useful for drop-in evaluation, NOT the
performance path (use `make_batched` for that).
"""

from __future__ import annotations

from typing import Optional

import gymnasium
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from pybulletgym_tpu.envs.base import BatchedEnv


class GymAdapter(gymnasium.Env):
    metadata = {"render_modes": ["rgb_array"]}

    def __init__(self, task, spec, render_mode: Optional[str] = None):
        from pybulletgym_tpu.api.registry import make_batched

        # route through the registry memo: repeated gym.make of the same id
        # shares one compiled step
        self._env = make_batched(spec.id, 1, backend="xla")
        self._spec = spec
        self._state = None
        self._seed = 0
        self.render_mode = render_mode
        # [ref: robot_bases.py · XmlBasedRobot.__init__ — Box(-1,1) actions,
        #  unbounded observations]
        self.action_space = spaces.Box(-1.0, 1.0, (task.act_dim,), np.float32)
        self.observation_space = spaces.Box(
            -np.inf, np.inf, (task.obs_dim,), np.float32
        )

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._seed = seed
            self._epoch = 0
        else:
            # fresh randomness on every reset, deterministically derived from
            # (seed, episode index) — the counter-based analog of the
            # reference's advancing np_random stream
            # [ref: env_bases.py · BaseBulletEnv.seed]
            self._epoch = getattr(self, "_epoch", -1) + 1
        self._state = self._env.reset(seed=self._seed, epoch=self._epoch)
        obs = np.asarray(self._state.obs[:, 0], np.float32)
        return obs, {}

    def step(self, action):
        assert self._state is not None, "call reset() first"
        a = np.asarray(action, np.float32).reshape(1, -1)
        self._state = self._env.step(self._state, a)
        st = self._state
        obs = np.asarray(st.obs[:, 0], np.float32)
        return (
            obs,
            float(st.reward[0]),
            bool(st.terminated[0]),
            bool(st.truncated[0]),
            {k: float(v[0]) for k, v in st.rewards.items()},
        )

    def render(self):
        from pybulletgym_tpu.utils.render import render_state

        return render_state(self._env.task, self._state)

    def close(self):
        pass


def make_adapter(env_id: str, **kwargs):
    from pybulletgym_tpu.api import registry as reg

    return GymAdapter(reg.make_task(env_id), reg.registry[env_id], **kwargs)
