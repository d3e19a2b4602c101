"""Real multi-process `jax.distributed` path (VERDICT r1 item 4): two OS
processes on localhost CPU form a 2-process world, build the 2-D
('host','env') mesh across BOTH processes' devices, and run a cross-process
psum + a sharded env rollout — the DCN code path the in-process virtual
mesh (tests/test_sharding.py) cannot exercise.

The reference has nothing distributed (SURVEY §2.3); this validates OUR
multi-host bring-up (parallel.mesh.init_distributed) end to end without a
TPU slice.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")   # sitecustomize pins a TPU plugin
coord, pid = sys.argv[1], int(sys.argv[2])

from pybulletgym_tpu.parallel import mesh as pmesh

pmesh.init_distributed(coordinator_address=coord, num_processes=2,
                       process_id=pid)
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = pmesh.make_mesh_2d(n_hosts=2)
assert mesh.devices.shape[0] == 2

# cross-process collective: shard a global array over the host axis and
# psum it — the value must include BOTH processes' contributions
nd = len(jax.devices())
sharding = NamedSharding(mesh, P(("host", "env")))
local = jnp.full((nd // 2,), float(pid + 1))
garr = jax.make_array_from_process_local_data(sharding, np.asarray(local), (nd,))
total = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(garr)
expect = (nd // 2) * 1.0 + (nd // 2) * 2.0
assert float(total) == expect, (float(total), expect)

# sharded env rollout across the 2-process mesh: the full stepping path
# compiles and runs with env-axis sharding spanning processes
import pybulletgym_tpu as pg

B = 16
env = pg.make_batched("InvertedPendulumPyBulletEnv-v0", B, backend="xla",
                      jit=False)
es = env.reset(seed=0)
es = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        pmesh.env_sharding(mesh, x.ndim, -1),
        np.asarray(x)[..., pid * (B // 2):(pid + 1) * (B // 2)], x.shape,
    ) if getattr(x, "ndim", 0) else x,
    es,
)
step = jax.jit(env._step)
a = jnp.zeros((1, B))
for _ in range(3):
    es = step(es, a)
r = jax.jit(lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P()))(es.reward)
assert np.isfinite(float(r))
print(f"proc {pid} ok", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_cpu():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        )
        + " --xla_force_host_platform_device_count=4"
    )
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} ok" in out
