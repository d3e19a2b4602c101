"""Cross-entropy-method policy search over the batched env axis.

Gradient-free complement to the PPO/SAC learners for the small-DoF envs
(Reacher, pendula): the whole population x episodes grid is laid out along
the env batch axis and evaluated in ONE jitted rollout, so a generation is
a single device call. Tiny policies (linear or one hidden layer) are all
these envs need — the reference's own demos are 2-hidden-layer numpy MLPs
[ref: pybulletgym/examples/roboschool-weights · SmallReactivePolicy —
SURVEY §3.5] — and CEM sidesteps the exploration pathologies PPO/SAC hit
on them (do-nothing optima, swing attractors).

Runs fine on the 1-core CPU when the TPU is busy/degraded: compile is one
rollout program, generations are milliseconds-per-step batched math.

Usage:
  python tools/train_es.py ReacherPyBulletEnv-v0 --hidden 16 \
      --pop 64 --episodes 4 --gens 300 --target 19
Weights land in examples/weights/<env>.npz (same format as train_loop)
when an eval improves on the env's campaign.json best.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_hidden(s):
    return tuple(int(x) for x in s.split(",") if x.strip())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--hidden", default="16")
    ap.add_argument("--pop", type=int, default=64)
    ap.add_argument("--episodes", type=int, default=4,
                    help="episodes per population member per generation")
    ap.add_argument("--gens", type=int, default=300)
    ap.add_argument("--sigma0", type=float, default=0.5)
    ap.add_argument("--sigma-floor", type=float, default=0.02)
    ap.add_argument("--elite", type=float, default=0.25)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--eval-episodes", type=int, default=64)
    ap.add_argument("--target", type=float, default=None)
    ap.add_argument("--minutes", type=float, default=None,
                    help="wall-clock budget; exits cleanly when exceeded")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force true-CPU jax (axon plugin pinned otherwise)")
    ap.add_argument("--resume", action="store_true",
                    help="init CEM mean from the shipped npz if compatible")
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

    hidden = parse_hidden(args.hidden)
    P, E = args.pop, args.episodes
    B = P * E
    env = pg.make_batched(args.env_id, B, backend="xla", jit=False)
    task = env.task
    _, step_fn = make_env(task)
    obs_dim, act_dim = task.obs_dim, task.act_dim
    sizes = (obs_dim,) + hidden + (act_dim,)
    shapes = [(sizes[i], sizes[i + 1]) for i in range(len(sizes) - 1)]
    D = sum(i * o + o for i, o in shapes)
    print(f"{args.env_id}: obs {obs_dim} act {act_dim} layers {shapes} "
          f"D={D} pop={P} eps/member={E} B={B}", flush=True)

    def unflatten(theta):  # theta (P, D) -> list of (W (P,i,o), b (P,o))
        layers, off = [], 0
        for i, o in shapes:
            w = theta[:, off:off + i * o].reshape(-1, i, o)
            off += i * o
            b = theta[:, off:off + o]
            off += o
            layers.append((w, b))
        return layers

    def policy(theta, obs_bt):  # obs (obs, B) -> actions (act, B)
        layers = unflatten(theta)
        h = obs_bt.T.reshape(P, E, obs_dim)
        for li, (w, b) in enumerate(layers):
            h = jnp.einsum("pei,pio->peo", h, w) + b[:, None, :]
            if li < len(layers) - 1:
                h = jnp.tanh(h)
        a = jnp.clip(h, -1.0, 1.0)
        return a.reshape(B, act_dim).T

    def generation(theta, reset_seed):
        state = env._reset(
            jnp.full((B,), reset_seed, jnp.uint32),
            jnp.arange(B, dtype=jnp.int32),
            jnp.zeros((B,), jnp.uint32),
        )

        def body(s, _):
            s2 = step_fn(s, policy(theta, s.obs))
            return s2, (s2.reward, s2.done)

        _, (rews, dones) = jax.lax.scan(
            body, state, None, length=task.max_episode_steps
        )
        alive = jnp.cumprod(1.0 - dones.astype(jnp.float32), axis=0)
        prev = jnp.concatenate([jnp.ones((1, B)), alive[:-1]], axis=0)
        ret = jnp.sum(rews * prev, axis=0)          # (B,)
        return ret.reshape(P, E).mean(axis=1)       # (P,)

    gen_jit = jax.jit(generation)

    rng = np.random.RandomState(args.seed)
    mu = np.zeros(D, np.float32)
    here = os.path.dirname(os.path.abspath(__file__))
    wdir = os.path.join(here, "..", "examples", "weights")
    os.makedirs(wdir, exist_ok=True)
    npz_path = os.path.join(wdir, args.env_id + ".npz")
    camp_path = os.path.join(wdir, args.env_id + ".campaign.json")

    def flatten_np(ws, bs):
        return np.concatenate([np.concatenate([w.ravel(), b.ravel()])
                               for w, b in zip(ws, bs)]).astype(np.float32)

    if args.resume and os.path.exists(npz_path):
        d = np.load(npz_path)
        n = int(d["n_layers"])
        got = [(d[f"w{i}"].shape) for i in range(n)]
        if got == shapes and "normalized" not in d:
            mu = flatten_np([d[f"w{i}"] for i in range(n)],
                            [d[f"b{i}"] for i in range(n)])
            print("resumed CEM mean from", npz_path, flush=True)
        else:
            print(f"shipped npz incompatible (layers {got} vs {shapes} or "
                  "normalized); starting fresh", flush=True)

    sigma = np.full(D, args.sigma0, np.float32)
    n_elite = max(2, int(round(args.elite * P)))
    best = None
    if os.path.exists(camp_path):
        with open(camp_path) as f:
            best = float(json.load(f).get("best", -1e18))
    t0 = time.time()

    def save(theta_vec, score, gens):
        layers, off = [], 0
        for i, o in shapes:
            layers.append((theta_vec[off:off + i * o].reshape(i, o),
                           theta_vec[off + i * o:off + i * o + o]))
            off += i * o + o
        out = {"n_layers": np.int64(len(layers)),
               "log_std": np.full((act_dim,), -10.0, np.float32)}
        for li, (w, b) in enumerate(layers):
            out[f"w{li}"] = w.astype(np.float32)
            out[f"b{li}"] = b.astype(np.float32)
        np.savez(npz_path, **out)
        with open(camp_path, "w") as f:
            json.dump({"best": float(score), "iters": int(gens),
                       "algo": "cem"}, f)
        print(f"  saved {npz_path} @ {score:+.1f}", flush=True)

    for g in range(1, args.gens + 1):
        if args.minutes is not None and (time.time() - t0) / 60 > args.minutes:
            print("wall-clock budget exhausted", flush=True)
            break
        eps = rng.randn(P, D).astype(np.float32)
        thetas = mu[None, :] + sigma[None, :] * eps
        thetas[0] = mu  # always keep the current mean in the population
        fit = np.asarray(gen_jit(jnp.asarray(thetas), np.uint32(args.seed + g)))
        order = np.argsort(fit)[::-1]
        elite = thetas[order[:n_elite]]
        mu = elite.mean(axis=0)
        sigma = np.maximum(elite.std(axis=0), args.sigma_floor).astype(np.float32)
        if g % args.eval_every == 0 or g == args.gens:
            # deterministic eval of the mean on fresh episodes
            ev = np.asarray(gen_jit(
                jnp.asarray(np.tile(mu, (P, 1))), np.uint32(90000 + g)))
            score = ev.mean()
            dt = time.time() - t0
            print(f"gen {g}: pop best {fit.max():+.1f} mean {fit.mean():+.1f} "
                  f"| eval(mu) {score:+.2f} | sigma {sigma.mean():.3f} "
                  f"| {dt:.0f}s", flush=True)
            if best is None or score > best:
                best = float(score)
                save(mu, best, g)
            if args.target is not None and best >= args.target:
                print(f"target {args.target} met: {best:+.2f}", flush=True)
                break
        else:
            print(f"gen {g}: pop best {fit.max():+.1f} "
                  f"mean {fit.mean():+.1f}", flush=True)


if __name__ == "__main__":
    main()
