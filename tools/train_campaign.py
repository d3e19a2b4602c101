"""Wall-clock-bounded RL training with periodic deterministic evaluation.

The reference ships one frozen-weights demo per env (`enjoy_TF_*.py`
[ref: pybulletgym/examples/roboschool-weights — SURVEY §3.5]); this tool
produces those artifacts for our roster: it trains (PPO by default, SAC
via --algo sac for hard-exploration pendula) in a bounded wall-clock
window (this sandbox kills background tasks at ~10 min), evaluates the
deterministic policy on full episodes every `--eval-every` iterations, and
keeps the BEST-scoring weights on disk — PPO can regress late, the shipped
demo should not.

Re-running resumes from the saved TrainState. SAC state is split: the
learner (actor/critics/opts, a few MB) checkpoints into the repo weights
dir and SURVIVES sandbox teardown; the replay ring (~0.5 GB) stays in /tmp
as a fast-resume bonus only — losing it costs one warmup refill, not the
policy (round-4 lesson: a /tmp-only checkpoint lost an eval-2000 run).
Stops early once the mean eval return reaches `--target` on two
consecutive evals.

Usage:
    python tools/train_campaign.py HalfCheetahPyBulletEnv-v0 \
        --minutes 8.5 --target 3000 --normalize
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pybulletgym_tpu_jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "weights")
SAC_CK_DIR = "/tmp/pybulletgym_tpu_sac_ck"


def make_eval_fn(env_id: str, episodes: int):
    """Batched deterministic full-episode evaluation, jitted once.

    `evaluate(params, apply)` where `apply(params, obs2d) -> actions` is
    the deterministic policy. Matches tests/test_frozen_policy.py's
    accounting: rewards accumulate through the first done (inclusive),
    post-reset life is excluded.
    """
    import pybulletgym_tpu as pg
    from pybulletgym_tpu.envs.base import make_env

    env = pg.make_batched(env_id, episodes, backend="xla", jit=False)
    task = env.task
    _, step_fn = make_env(task)
    B = episodes
    cache = {}

    def evaluate(params, apply, seed=123):
        if "fn" not in cache:
            def rollout(params, state):
                def body(s, _):
                    a = apply(params, s.obs.T)
                    s2 = step_fn(s, a.T)
                    return s2, (s2.reward, s2.done)

                _, (rews, dones) = jax.lax.scan(
                    body, state, None, length=task.max_episode_steps
                )
                alive = jnp.cumprod(1.0 - dones.astype(jnp.float32), axis=0)
                prev_alive = jnp.concatenate(
                    [jnp.ones((1, B)), alive[:-1]], axis=0
                )
                return jnp.sum(rews * prev_alive, axis=0)

            cache["fn"] = jax.jit(rollout)
        rets = cache["fn"](params, env.reset(seed=seed))
        return float(np.asarray(rets).mean()), np.asarray(rets)

    return evaluate


def save_policy_npz(path, weights, biases, extra):
    """Frozen-policy format shared with examples/enjoy.py and
    tests/test_frozen_policy.py: tanh-hidden MLP, final layer linear;
    `squash=True` applies tanh to the output (SAC), else clip."""
    np.savez_compressed(
        path, n_layers=len(weights),
        **{f"w{i}": np.asarray(w) for i, w in enumerate(weights)},
        **{f"b{i}": np.asarray(b) for i, b in enumerate(biases)},
        **extra,
    )


def run_ppo(args, deadline):
    from pybulletgym_tpu.parallel import ppo
    from pybulletgym_tpu.utils import checkpoint
    import pybulletgym_tpu as pg

    hidden = tuple(int(x) for x in args.hidden.split(","))
    cfg = ppo.PPOConfig(
        rollout_length=args.rollout, learning_rate=args.lr,
        num_minibatches=args.minibatches, entropy_coef=args.entropy,
        num_epochs=args.epochs, discount=args.discount,
        gae_lambda=args.gae_lambda,
        normalize_obs=args.normalize, hidden=hidden,
        total_updates=args.anneal_updates,
    )
    ck = os.path.join(WEIGHTS_DIR, args.env_id + ".trainstate.npz")
    best_path = os.path.join(WEIGHTS_DIR, args.env_id + ".npz")
    meta_path = os.path.join(WEIGHTS_DIR, args.env_id + ".campaign.json")

    env = pg.make_batched(args.env_id, args.batch, backend=args.backend,
                          jit=False)
    train_step = ppo.make_train_step(env.task, cfg, step_fn=env._step)
    ts = ppo.init_train_state(
        jax.random.PRNGKey(args.seed), env.observation_size,
        env.action_size, cfg,
    )
    meta = {"best": -np.inf, "iters": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    fresh = True
    if os.path.exists(ck):
        try:
            ts = checkpoint.load(ck, ts)
            fresh = False
            print(f"resumed trainstate ({meta})", flush=True)
        except ValueError as e:
            print(f"checkpoint incompatible ({e}); fresh start", flush=True)
            # keep the recorded best: the shipped npz is still that good,
            # a fresh run must beat it before overwriting
            meta = {"best": float(meta["best"]), "iters": 0}
    if fresh and args.log_std_init is not None:
        ts = ts._replace(params=ts.params._replace(
            log_std=jnp.full_like(ts.params.log_std, args.log_std_init)
        ))
    es = env.reset(seed=args.seed + int(meta["iters"]))
    evaluate = make_eval_fn(args.env_id, args.eval_episodes)

    def eval_params(ts):
        return (ts.params, ts.obs_stats.mean,
                1.0 / jnp.sqrt(ts.obs_stats.var + 1e-8))

    def save_best(ts):
        p = ts.params
        save_policy_npz(
            best_path, p.policy.weights, p.policy.biases,
            dict(
                log_std=np.asarray(p.log_std),
                **{f"vw{i}": np.asarray(w) for i, w in enumerate(p.value.weights)},
                **{f"vb{i}": np.asarray(b) for i, b in enumerate(p.value.biases)},
                obs_mean=np.asarray(ts.obs_stats.mean),
                obs_var=np.asarray(ts.obs_stats.var),
                normalized=bool(args.normalize),
            ),
        )

    # unique buffers before donation (TPU runtime dedupes identical consts)
    ts = jax.tree.map(lambda x: jnp.asarray(x).copy(), ts)
    es = jax.tree.map(lambda x: jnp.asarray(x).copy(), es)
    step_j = jax.jit(train_step, donate_argnums=(0, 1))

    def one_iter(ts, es):
        ts, es, m = step_j(ts, es)
        return ts, es, m

    return _drive(args, deadline, meta, ts, es, one_iter, evaluate,
                  eval_params, save_best,
                  lambda ts: checkpoint.save(ck, ts), meta_path,
                  steps_per_iter=cfg.rollout_length)


def run_sac(args, deadline):
    from pybulletgym_tpu.parallel import sac
    from pybulletgym_tpu.utils import checkpoint
    import pybulletgym_tpu as pg

    hidden = tuple(int(x) for x in args.hidden.split(","))
    cfg = sac.SACConfig(
        hidden=hidden, discount=args.discount, learning_rate=args.lr,
        buffer_slots=args.sac_slots, steps_per_iter=args.sac_steps,
        updates_per_iter=args.sac_updates, batch_size=args.sac_batch,
    )
    os.makedirs(SAC_CK_DIR, exist_ok=True)
    ck = os.path.join(SAC_CK_DIR, args.env_id + ".sacstate.npz")
    light_ck = os.path.join(WEIGHTS_DIR, args.env_id + ".saclearner.npz")
    best_path = os.path.join(WEIGHTS_DIR, args.env_id + ".npz")
    meta_path = os.path.join(WEIGHTS_DIR, args.env_id + ".campaign.json")

    env = pg.make_batched(args.env_id, args.batch, backend=args.backend,
                          jit=False)
    iteration = sac.make_sac_iteration(env.task, cfg, step_fn=env._step)
    ss = sac.init_sac_state(
        jax.random.PRNGKey(args.seed), env.observation_size,
        env.action_size, args.batch, cfg,
    )
    meta = {"best": -np.inf, "iters": 0}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)

    def learner_of(ss):
        # everything except the replay ring — small enough for the repo
        return (ss.actor, ss.critics, ss.targets, ss.log_alpha,
                ss.opt_actor, ss.opt_critic, ss.opt_alpha, ss.key)

    resumed = False
    if os.path.exists(ck):
        try:
            ss = checkpoint.load(ck, ss)
            resumed = True
            print(f"resumed full sacstate ({meta})", flush=True)
        except ValueError as e:
            print(f"ring checkpoint incompatible ({e})", flush=True)
    if not resumed and os.path.exists(light_ck):
        try:
            lt = checkpoint.load(light_ck, learner_of(ss))
            ss = ss._replace(
                actor=lt[0], critics=lt[1], targets=lt[2], log_alpha=lt[3],
                opt_actor=lt[4], opt_critic=lt[5], opt_alpha=lt[6], key=lt[7],
            )
            resumed = True
            print(f"resumed learner, ring lost — refilling ({meta})",
                  flush=True)
        except ValueError as e:
            print(f"learner checkpoint incompatible ({e}); fresh start",
                  flush=True)
    if not resumed:
        meta = {"best": float(meta["best"]), "iters": 0}
    es = env.reset(seed=args.seed + int(meta["iters"]))
    evaluate = make_eval_fn(args.env_id, args.eval_episodes)

    def eval_params(ss):
        return ss.actor

    def save_best(ss):
        # export only the mean head of the final layer so the shared
        # frozen-policy loader (tanh hidden, squash output) replays it
        act_dim = env.action_size
        ws = list(ss.actor.weights)
        bs = list(ss.actor.biases)
        ws[-1] = np.asarray(ws[-1])[:, :act_dim]
        bs[-1] = np.asarray(bs[-1])[:act_dim]
        save_policy_npz(best_path, ws, bs,
                        dict(normalized=False, squash=True))

    ss = jax.tree.map(lambda x: jnp.asarray(x).copy(), ss)
    es = jax.tree.map(lambda x: jnp.asarray(x).copy(), es)
    step_j = jax.jit(iteration, donate_argnums=(0, 1))

    def save_ck(ss):
        checkpoint.save(ck, ss)                      # ring: /tmp, best effort
        checkpoint.save(light_ck, learner_of(ss))    # learner: repo, durable

    return _drive(args, deadline, meta, ss, es, step_j, evaluate,
                  eval_params, save_best, save_ck, meta_path,
                  steps_per_iter=cfg.steps_per_iter)


def _drive(args, deadline, meta, state, es, step_j, evaluate, eval_params,
           save_best, save_ck, meta_path, steps_per_iter):
    it = int(meta["iters"])
    best = float(meta["best"])
    # algo label tracks whichever run produced the CURRENT best npz (the
    # policy-table reads it) — not merely the last chunk's algo
    best_algo = meta.get("algo", "ppo")
    t0 = time.time()
    it0 = it
    hits = 0
    first = True
    apply = _APPLY[args.algo]
    # `first or …`: pre-loop setup (env-reset compile, checkpoint load) can
    # exceed the whole minutes budget on a cold cache — the deadline only
    # resets after the first completed iteration, so without this guard a
    # cold chunk trains for ZERO iterations (observed round 4 after the
    # contacts change invalidated every cached program)
    while first or time.time() < deadline:
        state, es, m = step_j(state, es)
        if first:
            # cold compiles can eat many minutes (and the axon compile
            # service is sometimes slow); budget the chunk from the first
            # completed iteration so compile-only chunks still train
            jax.block_until_ready(jax.tree.leaves(m)[0])
            deadline = time.time() + args.minutes * 60.0
            t0 = time.time()
            first = False
        it += 1
        if it % 10 == 0:
            m = jax.tree.map(float, m)
            rate = (it - it0) * steps_per_iter * args.batch / (time.time() - t0)
            extra = "".join(
                f" {k} {m[k]:+.4f}" for k in ("critic_loss", "actor_loss",
                                              "alpha", "loss")
                if k in m
            )
            print(f"iter {it} reward {m['reward_mean']:+.3f}{extra} "
                  f"{rate:,.0f} steps/s", flush=True)
        if it % args.eval_every == 0:
            mean, rets = evaluate(eval_params(state), apply)
            mark = ""
            if mean > best:
                best = mean
                save_best(state)
                best_algo = args.algo
                mark = " *best*"
            print(f"eval @{it}: mean {mean:+.1f} min {rets.min():+.1f} "
                  f"max {rets.max():+.1f}{mark}", flush=True)
            if args.target is not None and mean >= args.target:
                hits += 1
                if hits >= 2:
                    print("target reached twice; stopping", flush=True)
                    break
            else:
                hits = 0

    save_ck(state)
    with open(meta_path, "w") as f:
        json.dump({"best": best, "iters": it, "algo": best_algo}, f)
    print(f"campaign chunk done: iter {it}, best {best:+.1f}", flush=True)
    if args.target is not None and best >= args.target:
        print("TARGET_MET", flush=True)


_APPLY = {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--algo", choices=("ppo", "sac"), default="ppo")
    ap.add_argument("--minutes", type=float, default=8.5)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--entropy", type=float, default=0.0)
    ap.add_argument("--rollout", type=int, default=32)
    ap.add_argument("--minibatches", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--discount", type=float, default=0.99)
    ap.add_argument("--gae-lambda", type=float, default=0.95)
    ap.add_argument("--hidden", default="64,64")
    ap.add_argument("--normalize", action="store_true")
    ap.add_argument("--target", type=float, default=None)
    ap.add_argument("--anneal-updates", type=int, default=0,
                    help="linear lr anneal horizon in Adam updates (0=const)")
    ap.add_argument("--log-std-init", type=float, default=None,
                    help="initial policy log-std (fresh starts only); "
                    "smaller = gentler exploration")
    ap.add_argument("--sac-slots", type=int, default=512)
    ap.add_argument("--sac-steps", type=int, default=4)
    ap.add_argument("--sac-updates", type=int, default=4)
    ap.add_argument("--sac-batch", type=int, default=1024)
    ap.add_argument("--eval-every", type=int, default=40)
    ap.add_argument("--eval-episodes", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(WEIGHTS_DIR, exist_ok=True)
    deadline = time.time() + args.minutes * 60.0

    if args.algo == "sac":
        from pybulletgym_tpu.parallel import sac as _sac

        _APPLY["sac"] = lambda actor, obs: _sac.det_action(actor, obs)
        run_sac(args, deadline)
    else:
        from pybulletgym_tpu.parallel import networks as nets

        def ppo_apply(p, obs):
            params, mean, istd = p
            h = obs
            if args.normalize:
                h = jnp.clip((h - mean) * istd, -10.0, 10.0)
            return jnp.clip(nets.mlp_apply(params.policy, h), -1.0, 1.0)

        _APPLY["ppo"] = ppo_apply
        run_ppo(args, deadline)


if __name__ == "__main__":
    main()
