"""Distill a solved PyBullet-family walker policy into its MuJoCo-mirror env.

Both env families run the SAME engine, timing (0.0165/4 x 4) and MJCF model
[ref: pybulletgym/envs/mujoco/** — the reference's MuJoCo family also reuses
the Bullet scenes; SURVEY §1 'Two parallel env families']; they differ only
in the obs/reward contract and the action->torque map:

    PyBullet family:  tau = power * coef_j * a      (envs/locomotion.py)
    MuJoCo family:    tau = gear_j * ctrlhi_j * a   (envs/mujoco_family.py)

So a frozen PyBullet teacher transfers exactly: driving the PB env with
teacher actions visits the same state distribution the mirror env would
see under a_mj = clip(G_pb/G_mj * a_pb), and the mirror obs for every
visited state is a pure function of (q, v) (Gym-v2 layouts). We roll the
teacher (plus noise rounds), relabel states with mirror obs + rescaled
actions, behavior-clone, then run DAgger rounds where the STUDENT drives
the PB env through the inverse action map (identical dynamics => exact
DAgger on the student's own distribution, while the teacher's native obs
stay available for labeling).

Entirely CPU-tractable: one jitted collect program + one jitted eval
program per env, reused across rounds.

Usage:
  python tools/mirror_distill.py HopperMuJoCoEnv-v0 [--cpu]
Ships examples/weights/<mirror>.npz when eval beats the campaign best.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

MIRRORS = {
    "HopperMuJoCoEnv-v0": "HopperPyBulletEnv-v0",
    "Walker2DMuJoCoEnv-v0": "Walker2DPyBulletEnv-v0",
    "HalfCheetahMuJoCoEnv-v0": "HalfCheetahPyBulletEnv-v0",
    "AntMuJoCoEnv-v0": "AntPyBulletEnv-v0",
}
WEIGHTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "examples", "weights")


def load_teacher(path):
    d = np.load(path)
    n = int(d["n_layers"])
    ws = [np.asarray(d[f"w{i}"], np.float32) for i in range(n)]
    bs = [np.asarray(d[f"b{i}"], np.float32) for i in range(n)]
    norm = None
    if "normalized" in d and bool(d["normalized"]):
        norm = (np.asarray(d["obs_mean"], np.float32),
                np.sqrt(np.asarray(d["obs_var"], np.float32) + 1e-8))
    return ws, bs, norm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id", choices=sorted(MIRRORS))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--envs", type=int, default=128)
    ap.add_argument("--hidden", default="64,64")
    ap.add_argument("--dagger", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--eval-envs", type=int, default=128)
    ap.add_argument("--force", action="store_true",
                    help="ship even if below the campaign best")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/pybulletgym_tpu_jaxcache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import optax

    import pybulletgym_tpu as pg
    from pybulletgym_tpu.envs.base import make_env

    mirror_id = args.env_id
    pb_id = MIRRORS[mirror_id]
    t0 = time.time()

    tws, tbs, tnorm = load_teacher(os.path.join(WEIGHTS, pb_id + ".npz"))
    tws = [jnp.asarray(w) for w in tws]
    tbs = [jnp.asarray(b) for b in tbs]

    B = args.envs
    env_pb = pg.make_batched(pb_id, B, backend="xla", jit=True)
    env_mj = pg.make_batched(mirror_id, args.eval_envs, backend="xla", jit=True)
    task_pb, task_mj = env_pb.task, env_mj.task
    _, step_pb = make_env(task_pb)
    _, step_mj = make_env(task_mj)
    T = task_mj.max_episode_steps

    # per-actuator torque-equivalence ratio (same actuator order: both
    # tasks enumerate model.actuators)
    assert np.array_equal(np.asarray(task_pb.act_dofs, np.int64),
                          np.asarray(task_mj.act_dofs, np.int64))
    g_pb = np.asarray(task_pb.gains[:, 0], np.float32)          # (act,)
    g_mj = np.asarray(task_mj.torque_gain, np.float32)          # (act,)
    ratio = jnp.asarray(g_pb / g_mj)[:, None]                   # pb -> mj
    inv_ratio = jnp.asarray(g_mj / g_pb)[:, None]               # mj -> pb
    print(f"{pb_id} -> {mirror_id}: torque ratio {np.round(g_pb / g_mj, 3)}",
          flush=True)

    def teacher_cols(obs_cols):  # (obs, B) -> (act, B), deterministic
        h = obs_cols
        if tnorm is not None:
            h = jnp.clip((h - tnorm[0][:, None]) / tnorm[1][:, None], -10, 10)
        for i, (w, b) in enumerate(zip(tws, tbs)):
            h = w.T @ h + b[:, None]
            if i < len(tws) - 1:
                h = jnp.tanh(h)
        return jnp.clip(h, -1.0, 1.0)

    def mirror_obs_cols(q, v):  # (nq,B),(nv,B) -> (obs,B); Gym-v2 obs are
        # pure functions of state; aux only feeds the reward path
        obs, _, _, _, _ = task_mj.output(
            q, v, jnp.zeros((1, q.shape[1]), q.dtype),
            jnp.zeros((task_mj.act_dim, q.shape[1]), q.dtype),
            {"x": q[0]},
        )
        return obs

    def student_cols(params, stats, obs_cols):
        mu, sd = stats
        h = jnp.clip((obs_cols - mu[:, None]) / sd[:, None], -10, 10)
        for i, (w, b) in enumerate(params):
            h = w.T @ h + b[:, None]
            if i < len(params) - 1:
                h = jnp.tanh(h)
        return jnp.clip(h, -1.0, 1.0)

    # ---- data collection: one jitted scan, teacher- or student-driven ----
    def make_collect(driver):  # driver(carry_params, s, key) -> a_pb (act,B)
        def collect(state, key, carry):
            def body(c, _):
                s, k = c
                k, k2 = jax.random.split(k)
                a_pb = driver(carry, s, k2)
                s2 = step_pb(s, a_pb)
                label = jnp.clip(ratio * a_pb, -1.0, 1.0)
                return (s2, k), (mirror_obs_cols(s.q, s.v), label)

            (_, _), (obs, lab) = jax.lax.scan(body, (state, key), None, length=T)
            return obs, lab  # (T, obs, B), (T, act, B)

        return jax.jit(collect)

    def teacher_driver(noise_sigma, s, key):
        a = teacher_cols(s.obs)
        return jnp.clip(
            a + noise_sigma * jax.random.normal(key, a.shape), -1.0, 1.0)

    collect_teacher = make_collect(
        lambda sig, s, key: teacher_driver(sig, s, key))
    collect_student = make_collect(
        lambda ps, s, key: jnp.clip(
            inv_ratio * student_cols(ps[0], ps[1], mirror_obs_cols(s.q, s.v)),
            -1.0, 1.0))

    def flatten(obs, lab):
        obs = np.asarray(obs).transpose(0, 2, 1).reshape(-1, obs.shape[1])
        lab = np.asarray(lab).transpose(0, 2, 1).reshape(-1, lab.shape[1])
        # drop non-finite samples: the physics NaN-guard terminates (and
        # auto-resets) an env whose state explodes, but the exploded state
        # itself still lands in the recorded rollout (~1e-3 of Ant samples)
        # and a single NaN row poisons obs-normalization stats and the BC
        # loss for the entire dataset
        ok = np.isfinite(obs).all(1) & np.isfinite(lab).all(1)
        if not ok.all():
            print(f"  dropped {int((~ok).sum())} non-finite samples", flush=True)
        return obs[ok], lab[ok]

    datasets = []
    for rnd, sig in enumerate((0.0, 0.1)):
        key = jax.random.PRNGKey(100 + rnd)
        s0 = env_pb.reset(seed=500 + rnd)
        datasets.append(flatten(*collect_teacher(s0, key, jnp.float32(sig))))
        print(f"teacher round sigma={sig}: {datasets[-1][0].shape[0]} samples "
              f"({time.time() - t0:.0f}s)", flush=True)

    # ---- BC training --------------------------------------------------
    hid = tuple(int(x) for x in args.hidden.split(","))
    obs_dim, act_dim = task_mj.obs_dim, task_mj.act_dim

    def init_params(key):
        sizes = (obs_dim,) + hid + (act_dim,)
        ps = []
        for i in range(len(sizes) - 1):
            key, k = jax.random.split(key)
            w = jax.random.normal(k, (sizes[i], sizes[i + 1])) * jnp.sqrt(
                1.0 / sizes[i])
            ps.append((w.astype(jnp.float32), jnp.zeros((sizes[i + 1],), jnp.float32)))
        return ps

    opt = optax.adam(1e-3)

    def loss_fn(params, stats, ob, lb):  # batch-major (N, obs)/(N, act)
        pred = student_cols(params, stats, ob.T).T
        return jnp.mean((pred - lb) ** 2)

    from functools import partial

    @partial(jax.jit, static_argnums=6)  # n_epochs sizes the key split
    def train_epochs(params, opt_state, stats, ob, lb, key, n_epochs):
        nb = ob.shape[0] // 4096

        def epoch(c, k):
            params, opt_state = c
            perm = jax.random.permutation(k, ob.shape[0])[: nb * 4096]
            obs_s = ob[perm].reshape(nb, 4096, -1)
            lab_s = lb[perm].reshape(nb, 4096, -1)

            def mb(c2, xy):
                params, opt_state = c2
                g = jax.grad(loss_fn)(params, stats, xy[0], xy[1])
                up, opt_state = opt.update(g, opt_state)
                return (optax.apply_updates(params, up), opt_state), None

            (params, opt_state), _ = jax.lax.scan(mb, (params, opt_state),
                                                  (obs_s, lab_s))
            return (params, opt_state), None

        keys = jax.random.split(key, n_epochs)
        (params, opt_state), _ = jax.lax.scan(epoch, (params, opt_state), keys)
        return params, opt_state, loss_fn(params, stats, ob[:4096], lb[:4096])

    # ---- eval in the mirror env ---------------------------------------
    @jax.jit
    def evaluate(params, stats, state):
        def body(s, _):
            a = student_cols(params, stats, s.obs)
            s2 = step_mj(s, a)
            return s2, (s2.reward, s2.terminated | s2.truncated)

        _, (r, d) = jax.lax.scan(body, state, None, length=T)
        r = jnp.where(jnp.isfinite(r), r, 0.0)  # NaN-guard terminal steps
        alive = jnp.cumprod(1.0 - d.astype(jnp.float32), axis=0)
        prev = jnp.concatenate(
            [jnp.ones((1, r.shape[1])), alive[:-1]], axis=0)
        return jnp.sum(r * prev, axis=0)

    key = jax.random.PRNGKey(0)
    params = init_params(key)
    opt_state = opt.init(params)

    best_ret, best_params, best_stats = -np.inf, None, None
    n_rounds = 1 + args.dagger
    for rnd in range(n_rounds):
        ob = np.concatenate([d[0] for d in datasets], 0)
        lb = np.concatenate([d[1] for d in datasets], 0)
        stats = (jnp.asarray(ob.mean(0)), jnp.asarray(ob.std(0) + 1e-3))
        n_ep = args.epochs if rnd == 0 else max(10, args.epochs // 2)
        params, opt_state, l = train_epochs(
            params, opt_state, stats, jnp.asarray(ob), jnp.asarray(lb),
            jax.random.PRNGKey(7 + rnd), n_ep)
        rets = np.asarray(evaluate(params, stats, env_mj.reset(seed=9000)))
        print(f"round {rnd}: N={ob.shape[0]} loss={float(l):.5f} "
              f"eval mean={rets.mean():+.1f} median={np.median(rets):+.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        if rets.mean() > best_ret:
            best_ret = float(rets.mean())
            best_params = jax.tree.map(np.asarray, params)
            best_stats = (np.asarray(stats[0]), np.asarray(stats[1]))
        if rnd < n_rounds - 1:  # DAgger: student drives, teacher labels
            s0 = env_pb.reset(seed=600 + rnd)
            datasets.append(flatten(*collect_student(
                s0, jax.random.PRNGKey(200 + rnd), (params, stats))))

    # re-eval the winner on fresh seeds for the record
    finals = [np.asarray(evaluate(
        jax.tree.map(jnp.asarray, best_params),
        (jnp.asarray(best_stats[0]), jnp.asarray(best_stats[1])),
        env_mj.reset(seed=s))) for s in (9100, 9101)]
    score = float(np.concatenate(finals).mean())
    print(f"final: {score:+.1f} over {2 * args.eval_envs} episodes", flush=True)

    camp_path = os.path.join(WEIGHTS, mirror_id + ".campaign.json")
    prev_best = -np.inf
    if os.path.exists(camp_path):
        with open(camp_path) as f:
            prev_best = float(json.load(f).get("best", -np.inf))
    finite = np.isfinite(score) and all(
        np.isfinite(a).all() for wb in best_params for a in wb
    ) and np.isfinite(best_stats[0]).all() and np.isfinite(best_stats[1]).all()
    if not finite:
        print("non-finite score or weights; refusing to ship", flush=True)
        return
    if score <= prev_best and not args.force:
        print(f"below campaign best ({prev_best:+.1f}); not shipping", flush=True)
        return

    out = {"n_layers": np.int64(len(best_params)), "normalized": True,
           "obs_mean": best_stats[0],
           "obs_var": best_stats[1] ** 2 - 1e-8}
    for i, (w, b) in enumerate(best_params):
        out[f"w{i}"], out[f"b{i}"] = w, b
    np.savez(os.path.join(WEIGHTS, mirror_id + ".npz"), **out)
    with open(camp_path, "w") as f:
        json.dump({"best": score, "iters": 0, "algo": "distill-pb",
                   "teacher": pb_id}, f)
    print(f"shipped {mirror_id}.npz at {score:+.1f} (was {prev_best:+.1f})",
          flush=True)


if __name__ == "__main__":
    main()
