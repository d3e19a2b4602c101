"""CEM-tune a scripted arm expert (tools/arm_experts.py) against its env.

Each CEM candidate is a theta vector for the expert family; candidates
ride the env batch axis (theta rows are (B,) arrays, one column per env),
so the whole population evaluates in ONE jitted rollout per generation —
a single compile, reused for every generation, which keeps the tool
usable even on the 1-core CPU when the TPU compile service is degraded.

Usage:
  python tools/tune_expert.py PusherPyBulletEnv-v0 --gens 60 [--cpu]
Writes examples/weights/<env>.expert.json {"theta": [...], "score": s}
whenever the best (re-evaluated) candidate improves.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from tools import arm_experts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id", choices=sorted(arm_experts.ARM_EXPERTS))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pop", type=int, default=48)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--gens", type=int, default=60)
    ap.add_argument("--elite", type=int, default=12)
    ap.add_argument("--minutes", type=float, default=0.0,
                    help="wall-clock budget (0 = until --gens)")
    ap.add_argument("--resume", action="store_true",
                    help="start the CEM mean from the tuned json")
    ap.add_argument("--sigma-scale", type=float, default=0.4)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pybulletgym_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    import pybulletgym_tpu as pg
    from pybulletgym_tpu.envs.base import make_env

    env_id = args.env_id
    P, K = args.pop, args.reps
    B = P * K
    env = pg.make_batched(env_id, B, backend="xla", jit=True)  # jitted reset: one compile, reused per generation (eager reset is minutes on TPU)
    task = env.task
    _, step_fn = make_env(task)
    T = task.max_episode_steps
    n = arm_experts.default_theta(env_id).size

    @jax.jit
    def evaluate(state, theta_cols):
        expert = arm_experts.make_arm_expert(
            env_id, task, theta=[theta_cols[i] for i in range(n)])

        def body(s, _):
            s2 = step_fn(s, expert(s.obs))
            return s2, (s2.reward, s2.done)

        _, (r, d) = jax.lax.scan(body, state, None, length=T)
        alive = jnp.cumprod(1.0 - d.astype(jnp.float32), axis=0)
        prev = jnp.concatenate([jnp.ones((1, B)), alive[:-1]], axis=0)
        return jnp.sum(r * prev, axis=0)

    mean = arm_experts.default_theta(env_id)
    if args.resume and os.path.exists(arm_experts.tuned_theta_path(env_id)):
        mean = np.asarray(arm_experts.load_theta(env_id), np.float64)
        print(f"resuming from tuned theta (score on file: "
              f"{json.load(open(arm_experts.tuned_theta_path(env_id))).get('score')})",
              flush=True)
    sigma = args.sigma_scale * np.abs(mean) + 0.02

    best_score, best_theta = -np.inf, mean.copy()
    rng = np.random.RandomState(0)
    t0 = time.time()
    for gen in range(args.gens):
        if args.minutes and (time.time() - t0) > args.minutes * 60:
            print("wall budget reached", flush=True)
            break
        cand = mean[None, :] + sigma[None, :] * rng.randn(P, n)
        cand[0] = mean  # elite-guard: the unnoised mean always competes
        theta_cols = jnp.asarray(np.repeat(cand, K, axis=0).T)
        state = env.reset(seed=1000 + gen)
        rets = np.asarray(evaluate(state, theta_cols))
        if gen == 0:
            # the first evaluate() pays the (possibly minutes-long, cold
            # CPU cache) jit compile; the wall budget buys GENERATIONS,
            # so start the clock once the program is actually running
            t0 = time.time()
        scores = rets.reshape(P, K).mean(axis=1)
        order = np.argsort(scores)[::-1]
        elite = cand[order[: args.elite]]
        mean = elite.mean(axis=0)
        sigma = elite.std(axis=0) + 0.01
        if scores[order[0]] > best_score:
            best_score = float(scores[order[0]])
            best_theta = cand[order[0]].copy()
            with open(arm_experts.tuned_theta_path(env_id), "w") as f:
                json.dump({"theta": best_theta.tolist(),
                           "score": best_score, "gen": gen,
                           "episodes": K}, f)
        print(f"gen {gen}: best {scores[order[0]]:+.2f} "
              f"elite-mean {scores[order[:args.elite]].mean():+.2f} "
              f"pop-mean {scores.mean():+.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    # re-evaluate the winner over fresh seeds at full batch for the record
    theta_cols = jnp.asarray(
        np.repeat(best_theta[None, :], B, axis=0).T)
    finals = [np.asarray(evaluate(env.reset(seed=s), theta_cols))
              for s in (7001, 7002)]
    score = float(np.concatenate(finals).mean())
    with open(arm_experts.tuned_theta_path(env_id), "w") as f:
        json.dump({"theta": best_theta.tolist(), "score": score,
                   "episodes": 2 * B}, f)
    print(f"final: {score:+.2f} over {2 * B} episodes -> "
          f"{arm_experts.tuned_theta_path(env_id)}", flush=True)


if __name__ == "__main__":
    main()
