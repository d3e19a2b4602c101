"""Scaling layer: device meshes, sharded PPO, policy networks.

The reference has no parallelism at all (SURVEY §2.3); this package is the
new capability mandated by the north star — env-axis data parallelism over
1-D ('env',) or 2-D ('host', 'env') meshes with XLA-inserted collectives.
"""

from pybulletgym_tpu.parallel import mesh, networks, ppo  # noqa: F401
