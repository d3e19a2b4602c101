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


def bench_ppo(env_id="AntPyBulletEnv-v0", batch=4096, iters=3):
    """Config-4 shape: full PPO train step (rollout 32 + GAE + updates)."""
    import jax.random as jr

    from pybulletgym_tpu.parallel import ppo

    cfg = ppo.PPOConfig(rollout_length=32, num_minibatches=8)
    ts, es, _ = ppo.train(env_id, batch, 1, cfg=cfg, backend="pallas")
    # timed iterations reuse the compiled step via train()'s loop; redo
    # here to control timing exactly
    import pybulletgym_tpu as pg

    env = pg.make_batched(env_id, batch, backend="pallas", jit=False)
    step_j = jax.jit(ppo.make_train_step(env.task, cfg, step_fn=env._step))
    ts = ppo.init_train_state(jr.PRNGKey(0), env.observation_size,
                              env.action_size, cfg)
    es = env.reset(seed=0)
    ts, es, m = step_j(ts, es)
    jax.block_until_ready(m["loss"])
    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        ts, es, m = step_j(ts, es)
        jax.block_until_ready(m["loss"])
        dt = time.perf_counter() - t0
        best = max(best, batch * cfg.rollout_length / dt)
    return best


def main():
    if "--all" in sys.argv:
        rows = []
        for env_id in ["HalfCheetahPyBulletEnv-v0", "Walker2DPyBulletEnv-v0",
                       "HopperPyBulletEnv-v0", "AntPyBulletEnv-v0",
                       "HumanoidPyBulletEnv-v0"]:
            v, backend = bench(env_id, batch=4096, n_steps=200, iters=3)
            rows.append((env_id, v, backend))
            print(f"{env_id}: {v:,.0f} env-steps/s ({backend})", flush=True)
        v = bench_ppo()
        rows.append(("AntPyBulletEnv-v0 full PPO loop", v, "pallas+xla"))
        print(f"Ant PPO loop: {v:,.0f} env-steps/s", flush=True)
        with open("BENCH.md", "w") as f:
            f.write("# Benchmarks (1 TPU chip, 4096 envs)\n\n"
                    "| Config | env-steps/s | path |\n|---|---|---|\n")
            for name, v, backend in rows:
                f.write(f"| {name} | {v:,.0f} | {backend} |\n")
        return

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
