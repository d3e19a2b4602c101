"""Env registry: the reference package API surface
[ref: pybulletgym/envs/__init__.py — gym.envs.registration.register(...)].

Same env IDs, max_episode_steps and reward_thresholds (SURVEY §2.4). Two
entry points:

* ``make(id)`` — a single-env gymnasium.Env adapter (drop-in for the
  reference's `gym.make("HopperPyBulletEnv-v0")` usage).
* ``make_batched(id, batch_size)`` — the native batched functional API
  (the TPU-first interface: thousands of envs per chip in lockstep).

Importing ``pybulletgym_tpu`` also registers every ID with gymnasium, so
``gymnasium.make("HopperPyBulletEnv-v0")`` works exactly like the reference
package import side effect.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional


@dataclasses.dataclass(frozen=True)
class EnvSpec:
    id: str
    task_factory: Callable
    max_episode_steps: int
    reward_threshold: Optional[float]


registry: Dict[str, EnvSpec] = {}
_task_cache: Dict[str, object] = {}


def register(id: str, task_factory: Callable, max_episode_steps: int,
             reward_threshold: Optional[float] = None) -> None:
    registry[id] = EnvSpec(id, task_factory, max_episode_steps, reward_threshold)


def _get_task(id: str):
    if id not in registry:
        raise KeyError(
            f"unknown env id {id!r}; known: {sorted(registry)}"
        )
    if id not in _task_cache:
        spec = registry[id]
        task = spec.task_factory()
        task.max_episode_steps = spec.max_episode_steps
        _task_cache[id] = task
    return _task_cache[id]


def make(id: str, **kwargs):
    """Single-env gymnasium adapter (reference-compatible usage)."""
    from pybulletgym_tpu.api.gym_adapter import GymAdapter

    return GymAdapter(_get_task(id), registry[id], **kwargs)


_env_cache: Dict[tuple, object] = {}


def make_batched(id: str, batch_size: int, **kwargs):
    """Native batched env: the TPU-first interface.

    Instances are memoized per (id, batch_size, options): BatchedEnv is
    stateless (pure jitted fns), so sharing avoids re-tracing the env step
    for every caller — jit caches key on function identity."""
    from pybulletgym_tpu.envs.base import BatchedEnv

    key = (id, batch_size, tuple(sorted(kwargs.items())))
    if key not in _env_cache:
        _env_cache[key] = BatchedEnv(_get_task(id), batch_size, **kwargs)
    return _env_cache[key]


def make_task(id: str):
    """The raw Task (model + pure functions) behind an env id."""
    return _get_task(id)


# ---------------------------------------------------------------------------
# roster [ref: pybulletgym/envs/__init__.py; SURVEY §2.4]
# ---------------------------------------------------------------------------


def _register_all() -> None:
    from pybulletgym_tpu.envs import locomotion as loco
    from pybulletgym_tpu.envs import pendula

    register(
        "InvertedPendulumPyBulletEnv-v0",
        lambda: pendula.InvertedPendulumTask(swingup=False), 1000, 950.0,
    )
    register(
        "InvertedPendulumSwingupPyBulletEnv-v0",
        lambda: pendula.InvertedPendulumTask(swingup=True), 1000, 800.0,
    )
    register(
        "InvertedDoublePendulumPyBulletEnv-v0",
        pendula.InvertedDoublePendulumTask, 1000, 9100.0,
    )
    register(
        "HopperPyBulletEnv-v0",
        lambda: loco.WalkerTask(loco.HOPPER), 1000, 2500.0,
    )
    register(
        "Walker2DPyBulletEnv-v0",
        lambda: loco.WalkerTask(loco.WALKER2D), 1000, 2500.0,
    )
    register(
        "HalfCheetahPyBulletEnv-v0",
        lambda: loco.WalkerTask(loco.HALF_CHEETAH), 1000, 3000.0,
    )
    register(
        "AntPyBulletEnv-v0",
        lambda: loco.WalkerTask(loco.ANT), 1000, 2500.0,
    )
    register(
        "HumanoidPyBulletEnv-v0",
        lambda: loco.WalkerTask(loco.HUMANOID), 1000, None,
    )
    register(
        "HumanoidFlagrunPyBulletEnv-v0",
        loco.HumanoidFlagrunTask, 1000, 2000.0,
    )
    register(
        "HumanoidFlagrunHarderPyBulletEnv-v0",
        loco.HumanoidFlagrunHarderTask, 1000, None,
    )
    register(
        "AtlasPyBulletEnv-v0",
        lambda: loco.WalkerTask(loco.ATLAS), 1000, None,
    )
    from pybulletgym_tpu.envs import manipulation as manip

    register("ReacherPyBulletEnv-v0", manip.ReacherTask, 150, 18.0)
    register("PusherPyBulletEnv-v0", manip.PusherTask, 150, 18.0)
    register("StrikerPyBulletEnv-v0", manip.StrikerTask, 100, 18.0)
    register("ThrowerPyBulletEnv-v0", manip.ThrowerTask, 100, 18.0)

    # MuJoCo-parity family [ref: pybulletgym/envs/mujoco/** — SURVEY §2.4]
    from pybulletgym_tpu.envs import mujoco_family as mjf

    register("InvertedPendulumMuJoCoEnv-v0",
             mjf.InvertedPendulumMuJoCoTask, 1000, 950.0)
    register("InvertedDoublePendulumMuJoCoEnv-v0",
             mjf.InvertedDoublePendulumMuJoCoTask, 1000, 9100.0)
    register("HopperMuJoCoEnv-v0", mjf.HopperMuJoCoTask, 1000, 3800.0)
    register("Walker2DMuJoCoEnv-v0", mjf.Walker2DMuJoCoTask, 1000, None)
    register("HalfCheetahMuJoCoEnv-v0", mjf.HalfCheetahMuJoCoTask, 1000, 4800.0)
    register("AntMuJoCoEnv-v0", mjf.AntMuJoCoTask, 1000, 6000.0)
    # 150 steps like ReacherPyBulletEnv-v0: threshold 18.0 is calibrated
    # to a 150-step episode (ADVICE r1; upstream registers its Reacher
    # mirror at 150 too)
    register("ReacherMuJoCoEnv-v0", mjf.ReacherMuJoCoTask, 150, 18.0)
    register("HumanoidMuJoCoEnv-v0", mjf.HumanoidMuJoCoTask, 1000, None)
    # our Pusher already implements the Gym-Pusher-v2 contract the
    # reference's MuJoCo mirror targets; same task, Gym's 100-step horizon
    register("PusherMuJoCoEnv-v0", manip.PusherTask, 100, 0.0)
    # same rationale: the roboschool-family tasks already implement the
    # Gym-v2 Striker/Thrower contracts the mirrors target
    register("StrikerMuJoCoEnv-v0", manip.StrikerTask, 100, 0.0)
    register("ThrowerMuJoCoEnv-v0", manip.ThrowerTask, 100, 0.0)


_register_all()


def register_with_gymnasium() -> None:
    """Mirror every ID into gymnasium's global registry (the reference's
    import side effect [ref: pybulletgym/envs/__init__.py])."""
    try:
        import gymnasium
        from gymnasium.envs.registration import register as gym_register
    except ImportError:  # pragma: no cover
        return
    for spec in registry.values():
        if spec.id in gymnasium.registry:
            continue
        gym_register(
            id=spec.id,
            entry_point=f"pybulletgym_tpu.api.gym_adapter:make_adapter",
            max_episode_steps=None,  # our adapter truncates on-device
            reward_threshold=spec.reward_threshold,
            kwargs={"env_id": spec.id},
            disable_env_checker=True,
        )


register_with_gymnasium()
