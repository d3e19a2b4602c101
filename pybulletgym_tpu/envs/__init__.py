"""Functional env layer: the Gym-API surface of the reference, re-designed
as pure batched functions (obs/reward/done/auto-reset fused into one jitted
step; episode bookkeeping on-device).

Replaces L2-L4 of the reference — the Robot/Scene/Env class stacks
[ref: robot_bases.py, scene_bases.py, env_bases.py] — with `Task`
descriptions + `make_env` wiring in `envs.base`.
"""

from pybulletgym_tpu.envs.base import BatchedEnv, EnvState, make_env  # noqa: F401
