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
    metadata = {"render_modes": ["rgb_array", "human"]}

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

        frame = render_state(self._env.task, self._state)
        if self.render_mode == "human":
            # the reference's GUI mode [ref: env_bases.py ·
            # BaseBulletEnv.render('human')]; headless boxes fall back to
            # rgb_array with a one-time notice
            self._show(frame)
            return None
        return frame

    def _show(self, frame):
        if getattr(self, "_human_broken", False):
            return
        try:
            import matplotlib

            if not hasattr(self, "_imshow"):
                import matplotlib.pyplot as plt

                if matplotlib.get_backend().lower() == "agg":
                    raise RuntimeError("no interactive matplotlib backend")
                plt.ion()
                self._fig, ax = plt.subplots(num=self._spec.id)
                ax.set_axis_off()
                self._imshow = ax.imshow(frame)
            else:
                self._imshow.set_data(frame)
            self._fig.canvas.draw_idle()
            self._fig.canvas.flush_events()
        except Exception as e:  # headless: no display/backend
            self._human_broken = True
            import warnings

            warnings.warn(
                f"render_mode='human' unavailable ({e}); frames are still "
                "produced — use render_mode='rgb_array' to consume them"
            )

    def close(self):
        if hasattr(self, "_fig"):
            import matplotlib.pyplot as plt

            plt.close(self._fig)


class VectorAdapter(gymnasium.vector.VectorEnv):
    """gymnasium VectorEnv facade over `make_batched` — the reference has
    no vector API at all (one Bullet world per env object, SURVEY §2.3);
    gym users wrap it in gym.vector manually. Here the batch IS the native
    representation, so this adapter is a thin numpy boundary around the
    jitted batched step. Auto-reset follows gymnasium 1.x's next-step
    semantics, which is exactly what envs.base implements on-device.
    """

    metadata = {"render_modes": []}

    def __init__(self, env_id: str, num_envs: int, backend: Optional[str] = None):
        from pybulletgym_tpu.api.registry import make_batched, make_task, registry

        kwargs = {} if backend is None else {"backend": backend}
        self._env = make_batched(env_id, num_envs, **kwargs)
        task = make_task(env_id)
        self.spec = registry[env_id]
        self.num_envs = num_envs
        self.single_action_space = spaces.Box(
            -1.0, 1.0, (task.act_dim,), np.float32
        )
        self.single_observation_space = spaces.Box(
            -np.inf, np.inf, (task.obs_dim,), np.float32
        )
        self.action_space = gymnasium.vector.utils.batch_space(
            self.single_action_space, num_envs
        )
        self.observation_space = gymnasium.vector.utils.batch_space(
            self.single_observation_space, num_envs
        )
        self._state = None
        self._seed = 0

    def reset(self, *, seed: Optional[int] = None, options=None):
        if seed is not None:
            self._seed = seed
            self._epoch = 0
        else:
            self._epoch = getattr(self, "_epoch", -1) + 1
        self._state = self._env.reset(seed=self._seed, epoch=self._epoch)
        return np.asarray(self._state.obs.T, np.float32), {}

    def step(self, actions):
        assert self._state is not None, "call reset() first"
        a = np.asarray(actions, np.float32).reshape(self.num_envs, -1)
        self._state = self._env.step(self._state, a)
        st = self._state
        return (
            np.asarray(st.obs.T, np.float32),
            np.asarray(st.reward, np.float32),
            np.asarray(st.terminated),
            np.asarray(st.truncated),
            {k: np.asarray(v) for k, v in st.rewards.items()},
        )

    def close_extras(self, **kwargs):
        pass


def make_adapter(env_id: str, **kwargs):
    from pybulletgym_tpu.api import registry as reg

    return GymAdapter(reg.make_task(env_id), reg.registry[env_id], **kwargs)


def make_vec(env_id: str, num_envs: int, backend: Optional[str] = None):
    """Native vectorized gymnasium API: `pybulletgym_tpu.make_vec(id, N)`."""
    return VectorAdapter(env_id, num_envs, backend=backend)
