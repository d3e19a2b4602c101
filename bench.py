"""Headline benchmark: HalfCheetah env throughput at 4096 envs/chip
(BASELINE.md config 3; target >= 1M env-steps/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured throughput / 1e6 (the driver-defined target, since
the reference publishes no numbers of its own — BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(env_id="HalfCheetahPyBulletEnv-v0", batch=4096, n_steps=200, iters=5):
    import pybulletgym_tpu as pg

    on_accel = jax.default_backend() not in ("cpu",)
    backend = "pallas" if (on_accel and batch % 1024 == 0) else "xla"
    env = pg.make_batched(env_id, batch, backend=backend, jit=False)
    step = env._step

    # fixed pseudo-random action sequence, generated once on device
    key = jax.random.PRNGKey(0)
    actions = jax.random.uniform(
        key, (n_steps, env.action_size, batch), jnp.float32, -1.0, 1.0
    )

    @jax.jit
    def rollout(state, actions):
        def body(s, a):
            return step(s, a), ()

        s, _ = jax.lax.scan(body, state, actions)
        return s

    state = env.reset(seed=0)
    state = rollout(state, actions)        # compile + warm up
    jax.block_until_ready(state.q)

    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        state = rollout(state, actions)
        jax.block_until_ready(state.q)
        dt = time.perf_counter() - t0
        best = max(best, batch * n_steps / dt)
    return best, backend


def main():
    batch = 4096
    n_steps = 200
    if jax.default_backend() == "cpu":   # keep CI/dev runs quick
        batch, n_steps = 512, 20
    value, backend = bench(batch=batch, n_steps=n_steps)
    print(json.dumps({
        "metric": f"halfcheetah_env_steps_per_sec_{batch}envs_{backend}",
        "value": round(value),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(value / 1.0e6, 3),
    }))


if __name__ == "__main__":
    main()
