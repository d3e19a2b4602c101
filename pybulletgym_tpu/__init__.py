"""pybulletgym_tpu — a TPU-native continuous-control environment suite.

A from-scratch re-design of the capabilities of ``josiahls/pybullet-gym``
(the Roboschool-style Gym env suite over Bullet physics) for TPU hardware:

* a vectorized generalized-coordinate rigid-body engine written in JAX
  (forward kinematics -> CRBA mass matrix -> RNE bias forces -> Cholesky
  solve -> velocity-level projected-Gauss-Seidel contact/limit impulses),
* a compile-time MJCF model builder replacing Bullet's C++ importers,
* a functional env layer (obs/reward/done/auto-reset fused into one jitted
  batched step; episode bookkeeping on-device),
* an env registry + gymnasium adapter mirroring the reference env IDs
  [ref: pybulletgym/envs/__init__.py],
* mesh-sharded rollouts and a PPO learner for multi-chip/multi-host scale.

Design notes: the engine is *batch-shape polymorphic*: every per-env scalar
quantity is a JAX array leaf of shape ``B`` (any batch shape, possibly
scalar ``()``); all small structural dimensions (bodies, dofs, contacts)
are unrolled at trace time over the static `Model`. On TPU this yields pure
``(B,)``-wide elementwise VPU ops with perfect lane tiling — no wasted
lanes on trailing size-3/4 dimensions — and lets `jax.sharding` shard the
batch axis over a device mesh without code changes.
"""

__version__ = "0.1.0"

from pybulletgym_tpu.api.registry import (  # noqa: F401
    make, make_batched, make_task, registry,
)
from pybulletgym_tpu.api.gym_adapter import make_vec  # noqa: F401
