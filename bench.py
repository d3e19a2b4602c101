"""Headline benchmark: HalfCheetah env throughput at 4096 envs/chip
(BASELINE.md config 3; target >= 1M env-steps/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured throughput / 1e6 (the driver-defined target, since
the reference publishes no numbers of its own — BASELINE.md).
"""

import json
import os
import sys
import time

if "--scaling" in sys.argv or "--scaling-mesh" in sys.argv:
    # the virtual-mesh curve needs 8 CPU devices; must be set pre-import
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/pybulletgym_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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


def bench_sharded(env_id, total_batch, n_devices, n_steps=50, iters=3):
    """Sharded XLA-path throughput over an n-device ('env',) mesh."""
    import pybulletgym_tpu as pg
    from pybulletgym_tpu.parallel import mesh as pmesh

    devs = jax.devices("cpu")[:n_devices]
    mesh = pmesh.make_mesh(devices=devs)
    env = pg.make_batched(env_id, total_batch, backend="xla", jit=False)
    step = env._step
    key = jax.random.PRNGKey(0)
    actions = jax.random.uniform(
        key, (n_steps, env.action_size, total_batch), jnp.float32, -1.0, 1.0
    )

    @jax.jit
    def rollout(state, actions):
        def body(s, a):
            return step(s, a), ()

        s, _ = jax.lax.scan(body, state, actions)
        return s

    state = pmesh.shard_env_state(env.reset(seed=0), mesh)
    state = rollout(state, actions)
    jax.block_until_ready(state.q)
    best = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        state = rollout(state, actions)
        jax.block_until_ready(state.q)
        best = max(best, total_batch * n_steps / (time.perf_counter() - t0))
    return best


def bench_scaling(capacity=True, mesh=True):
    """Scaling evidence (BASELINE.md '>=85% 1 host -> N hosts' proxy):

    (a) per-chip capacity curve — HalfCheetah pallas at 4096/8192/16384
        envs (true TPU measurement; near-flat steps/s/env = the env axis
        scales, so adding chips multiplies throughput);
    (b) virtual-mesh curve — Hopper XLA path sharded over 1 and 8 CPU
        devices at fixed total batch. This machine has ONE physical core,
        so wall-clock cannot improve with device count; the curve verifies
        the sharded program COMPILES AND RUNS at every mesh size and
        measures the sharding overhead, not parallel speedup.
    """
    rows = []
    on_accel = jax.default_backend() not in ("cpu",)
    if on_accel and capacity:
        for batch in (4096, 8192, 16384):
            v, backend = bench(batch=batch, n_steps=100, iters=3)
            rows.append((f"halfcheetah capacity {batch} envs ({backend})", v,
                         v / batch))
            print(f"capacity {batch}: {v:,.0f} steps/s "
                  f"({v / batch:,.1f} per env)", flush=True)
    if mesh:
        # CPU execution of the TPU-shaped program is slow (one core, no
        # lanes); 2 sizes x tiny rollouts are enough to prove the sharded
        # program at both ends of the mesh range
        for nd in (1, 8):
            v = bench_sharded("HopperPyBulletEnv-v0", 128, nd, n_steps=5,
                              iters=2)
            rows.append((f"hopper sharded {nd} virtual cpu devs", v, v / 128))
            print(f"virtual mesh {nd} devs: {v:,.0f} steps/s", flush=True)
    # merge with any rows a previous partial invocation wrote
    if os.path.exists("BENCH_SCALING.md"):
        import re

        for line in open("BENCH_SCALING.md"):
            mrow = re.match(r"\| (.+) \| ([\d,]+) \| ([\d,.]+) \|", line)
            if mrow and not any(r[0] == mrow.group(1) for r in rows):
                rows.append((mrow.group(1),
                             float(mrow.group(2).replace(",", "")),
                             float(mrow.group(3).replace(",", ""))))
    with open("BENCH_SCALING.md", "w") as f:
        f.write(
            "# Scaling evidence\n\n"
            "Per-chip capacity (real TPU): near-flat steps/s/env across the\n"
            "batch sweep means the env axis is compute-bound and scales;\n"
            "multi-chip throughput = per-chip x N (stepping is embarrassingly\n"
            "parallel; the PPO learner all-reduce is the only cross-chip\n"
            "traffic — see MULTICHIP dryrun + tests/test_sharding.py).\n\n"
            "Virtual-mesh rows run 1 and 8 XLA devices on ONE physical CPU\n"
            "core: they verify the sharded program at every mesh size and\n"
            "bound the sharding overhead; wall-clock speedup is impossible\n"
            "on one core (BASELINE.md multi-host efficiency needs real\n"
            "hardware the sandbox lacks).\n\n"
            "| config | env-steps/s | steps/s/env |\n|---|---|---|\n"
        )
        for name, v, pe in rows:
            f.write(f"| {name} | {v:,.0f} | {pe:,.2f} |\n")
    print("wrote BENCH_SCALING.md", flush=True)


def main():
    if "--scaling-mesh" in sys.argv:
        # pure-CPU process: the mesh rows never touch the TPU, and eager
        # ops routed through the axon tunnel would dominate wall-clock
        jax.config.update("jax_platforms", "cpu")
        bench_scaling(capacity=False, mesh=True)
        return
    if "--scaling" in sys.argv:
        bench_scaling(capacity=True, mesh=False)
        return
    if "--all" in sys.argv:
        rows = []
        for env_id in ["HalfCheetahPyBulletEnv-v0", "Walker2DPyBulletEnv-v0",
                       "HopperPyBulletEnv-v0", "AntPyBulletEnv-v0",
                       "HumanoidPyBulletEnv-v0",
                       "HumanoidFlagrunHarderPyBulletEnv-v0",
                       "AtlasPyBulletEnv-v0",
                       "HalfCheetahMuJoCoEnv-v0", "Walker2DMuJoCoEnv-v0",
                       "AntMuJoCoEnv-v0", "HumanoidMuJoCoEnv-v0"]:
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
