"""Compile-time model layer: MJCF parsing -> static `Model` descriptions.

Replaces Bullet's C++ MJCF/URDF/SDF importers (`BulletMJCFImporter`,
exercised via `p.loadMJCF` from `MJCFBasedRobot.reset`
[ref: robot_bases.py · MJCFBasedRobot.reset]). Parsing happens once on the
host; the result is a frozen `Model` whose every constant is baked into the
XLA program at trace time.
"""

from pybulletgym_tpu.models.schema import (  # noqa: F401
    Actuator,
    Body,
    Geom,
    GeomType,
    JointType,
    Model,
)
from pybulletgym_tpu.models.mjcf import load_mjcf, parse_mjcf  # noqa: F401
