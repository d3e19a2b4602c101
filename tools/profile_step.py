"""Capture a jax.profiler trace of the batched env step.

Usage: python tools/profile_step.py [env_id] [batch] [out_dir]

Produces a TensorBoard-loadable trace with the engine's named scopes
(fk_dynamics / narrowphase / cholesky_solve / pgs_solver / integrate) so
per-phase device time is attributable (SURVEY §5 — the reference has no
profiling hooks at all).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "HalfCheetahPyBulletEnv-v0"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/pybulletgym_tpu_trace"

    import pybulletgym_tpu as pg

    env = pg.make_batched(env_id, batch, jit=False)
    step = jax.jit(env._step)
    s = env.reset(seed=0)
    a = jnp.zeros((env.action_size, batch), jnp.float32)
    s = step(s, a)                      # compile outside the trace
    jax.block_until_ready(s.q)

    with jax.profiler.trace(out):
        for _ in range(20):
            s = step(s, a)
        jax.block_until_ready(s.q)
    print(f"trace written to {out} (open with TensorBoard or xprof)")


if __name__ == "__main__":
    main()
