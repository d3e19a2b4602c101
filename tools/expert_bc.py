"""Scripted-expert -> behavior-cloning policy pipeline.

For the small-DoF control envs (Reacher, pendula) a hand-derived
controller can solve the task outright; cloning it into the shipped
tanh-MLP format (examples/enjoy.py SmallReactivePolicy) gives a frozen
demo policy without RL compute — the reference ships exactly such small
reactive MLPs per env [ref: pybulletgym/examples/roboschool-weights ·
SmallReactivePolicy — SURVEY §3.5].

The expert is rolled out with exploration noise for the base dataset,
then DAgger rounds (policy drives, expert labels) close the
distribution-shift gap. Runs fine on the 1-core CPU (--cpu) when the TPU
compile service is degraded.

Usage:
  python tools/expert_bc.py ReacherPyBulletEnv-v0 --cpu
Weights land in examples/weights/<env>.npz when the official-path eval
beats the env's campaign.json best.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


# ---------------------------------------------------------------------------
# scripted experts: obs (obs_dim, B) -> action (act_dim, B), pure jnp
# ---------------------------------------------------------------------------

def reacher_expert(task=None):
    """Two-link IK + PD with energy shaping for ReacherPyBulletEnv-v0.

    Key reward facts (envs/manipulation.py ReacherTask.output_scalar):
    progress is a -100*dist potential delta, electricity charges
    0.10*|a*0.1qdot| + 0.01*|a|, stuck-joint -0.1 while |gamma|>2.97.
    The controller therefore (a) coasts whenever already moving toward the
    set-point faster than WCAP (zero torque = zero electricity), (b) brakes
    inside the DEAD band, (c) zeroes torque once settled, and (d) never
    "settles" inside the stuck-penalty zone.
    """
    import jax.numpy as jnp

    L1, L2 = 0.1, 0.11
    KP, KD, DEAD, VTH, KB, WCAP = 2.0, 0.1, 0.1, 0.1, 0.05, 1.5

    def expert(obs):
        tx, ty = obs[0], obs[1]
        th_dot = 10.0 * obs[6]
        gam = 3.0 * obs[7]
        gam_dot = 10.0 * obs[8]
        th = jnp.arctan2(obs[5], obs[4])
        r = jnp.sqrt(tx * tx + ty * ty)
        r = jnp.clip(r, abs(L1 - L2) + 1e-4, L1 + L2 - 1e-4)
        cg = (r * r - L1 * L1 - L2 * L2) / (2 * L1 * L2)
        gd = jnp.arccos(jnp.clip(cg, -1.0, 1.0))
        gd = jnp.clip(gd, 0.0, 2.8) * jnp.where(gam >= 0, 1.0, -1.0)
        td = jnp.arctan2(ty, tx) - jnp.arctan2(
            L2 * jnp.sin(gd), L1 + L2 * jnp.cos(gd))
        e0 = jnp.arctan2(jnp.sin(td - th), jnp.cos(td - th))
        e1 = jnp.clip(gd - gam, -np.pi, np.pi)

        def joint(e, w, in_stuck):
            a_pd = KP * e - KD * w
            coasting = (e * w > 0) & (jnp.abs(w) > WCAP)
            a_pd = jnp.where(coasting, 0.0, a_pd)
            near = jnp.abs(e) < DEAD
            a = jnp.where(near, -KB * w, a_pd)
            settled = near & (jnp.abs(w) < VTH) & (~in_stuck)
            return jnp.clip(jnp.where(settled, 0.0, a), -1, 1)

        stuck = jnp.abs(gam) > 2.85
        return jnp.stack([joint(e0, th_dot, jnp.zeros_like(stuck)),
                          joint(e1, gam_dot, stuck)])

    return expert


def swingup_expert(task=None):
    """Energy-pump + balance-PD for InvertedPendulumSwingupPyBulletEnv-v0.

    Classic two-mode cart-pole swingup: far from upright, pump energy with
    a = k_pump*theta_dot*cos(theta) (+ a sin term); near upright (cos >
    0.837, |theta_dot| < 4.7) switch to a linear balance law. The 8 gains
    were CEM-tuned against the env itself (mean return +892.9 over 512
    episodes; reward_threshold 800, envs/pendula.py swingup branch).
    """
    import jax.numpy as jnp

    PUMP, KS, KTD, KX, KVX = -10.677, 7.928, 1.067, 0.565, 0.905
    NEAR_C, NEAR_TD, PUMP_S = 0.837, 4.699, 1.304

    def expert(obs):
        x, vx, c, s, td = obs[0], obs[1], obs[2], obs[3], obs[4]
        pump = PUMP * td * c + PUMP_S * s
        bal = KS * s + KTD * td + KX * x + KVX * vx
        near = (c > NEAR_C) & (jnp.abs(td) < NEAR_TD)
        return jnp.clip(jnp.where(near, bal, pump), -1.0, 1.0)[None]

    return expert


def _arm_expert_entry(env_id):
    def factory(task):
        from tools.arm_experts import make_arm_expert
        return make_arm_expert(env_id, task)
    return factory


EXPERTS = {
    "ReacherPyBulletEnv-v0": reacher_expert,
    "InvertedPendulumSwingupPyBulletEnv-v0": swingup_expert,
}
for _env in ("PusherPyBulletEnv-v0", "StrikerPyBulletEnv-v0",
             "ThrowerPyBulletEnv-v0", "PusherMuJoCoEnv-v0",
             "StrikerMuJoCoEnv-v0", "ThrowerMuJoCoEnv-v0"):
    EXPERTS[_env] = _arm_expert_entry(_env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id", choices=sorted(EXPERTS))
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--seeds", type=int, default=6,
                    help="expert-rollout dataset seeds")
    ap.add_argument("--dagger", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--noise", type=float, default=0.15)
    ap.add_argument("--eval-episodes", type=int, default=64)
    ap.add_argument("--force", action="store_true",
                    help="ship even if below campaign.json best")
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

    B = args.envs
    env = pg.make_batched(args.env_id, B, backend="xla", jit=True)  # jitted reset (eager reset is minutes on TPU)
    task = env.task
    expert = EXPERTS[args.env_id](task)
    _, step_fn = make_env(task)
    T = task.max_episode_steps
    obs_dim, act_dim = task.obs_dim, task.act_dim
    H = args.hidden

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "w0": jax.random.normal(k1, (obs_dim, H)) * 0.3, "b0": jnp.zeros(H),
        "w1": jax.random.normal(k2, (H, act_dim)) * 0.1, "b1": jnp.zeros(act_dim),
    }

    def mlp(p, x):
        h = jnp.tanh(x @ p["w0"] + p["b0"])
        return h @ p["w1"] + p["b1"]

    # ONE jitted rollout covers expert collection, DAgger collection, and
    # policy eval (mode/noise are traced scalars): a single XLA program —
    # vital on the 1-core CPU where each T-step arm-env scan costs ~an
    # hour of LLVM time to compile, and cheap insurance on a degraded
    # axon compile service.
    @jax.jit
    def roll(state, k, p, drive_expert, noise):
        def body(carry, _):
            s, k = carry
            k, k2 = jax.random.split(k)
            a_exp = expert(s.obs)
            a_mlp = jnp.clip(mlp(p, s.obs.T).T, -1, 1)
            a = jnp.where(drive_expert > 0.5, a_exp, a_mlp)
            a = jnp.clip(a + noise * jax.random.normal(k2, a.shape), -1, 1)
            s2 = step_fn(s, a)
            return (s2, k), (s.obs, a_exp, s2.reward, s2.done)
        (_, _), (o, a, r, d) = jax.lax.scan(body, (state, k), None, length=T)
        alive = jnp.cumprod(1.0 - d.astype(jnp.float32), axis=0)
        prev = jnp.concatenate([jnp.ones((1, B)), alive[:-1]], axis=0)
        return o, a, jnp.sum(r * prev, axis=0)

    def collect_expert(state, k):
        o, a, _ = roll(state, k, params, 1.0, args.noise)
        return o, a

    def collect_dagger(state, p):
        o, a, _ = roll(state, jax.random.PRNGKey(0), p, 0.0, 0.0)
        return o, a

    def rollout(state, p):
        _, _, ret = roll(state, jax.random.PRNGKey(0), p, 0.0, 0.0)
        return ret

    def to_np(o, a):
        return (np.asarray(o).transpose(0, 2, 1).reshape(-1, obs_dim),
                np.asarray(a).transpose(0, 2, 1).reshape(-1, act_dim))

    opt = optax.adam(2e-3)

    @jax.jit
    def train_step(p, o, xb, yb):
        def loss_fn(p):
            d = jnp.clip(mlp(p, xb), -1, 1) - yb
            return jnp.mean(d * d)
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = opt.update(g, o)
        return optax.apply_updates(p, u), o, l

    def fit(X, Y, epochs):
        nonlocal params
        ost = opt.init(params)
        rng = np.random.RandomState(0)
        Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
        n = X.shape[0]
        last = 0.0
        for _ in range(epochs):
            perm = rng.permutation(n)
            for i in range(0, n - 4096, 4096):
                idx = perm[i:i + 4096]
                params, ost, last = train_step(params, ost, Xj[idx], Yj[idx])
        print(f"  fit: final batch loss {float(last):.5f}", flush=True)

    XS, YS = [], []
    for seed in range(1, args.seeds + 1):
        X, Y = to_np(*collect_expert(env.reset(seed=seed),
                                     jax.random.PRNGKey(seed)))
        XS.append(X); YS.append(Y)
    fit(np.concatenate(XS), np.concatenate(YS), args.epochs)

    for dag in range(args.dagger):
        for seed in (50 + dag * 10, 51 + dag * 10):
            X, Y = to_np(*collect_dagger(env.reset(seed=seed), params))
            XS.append(X); YS.append(Y)
        fit(np.concatenate(XS), np.concatenate(YS), args.epochs // 2)
        r = np.asarray(rollout(env.reset(seed=11), params))
        print(f"DAgger{dag}: mean {r.mean():+.2f} "
              f"p10 {np.percentile(r, 10):+.2f}", flush=True)

    # batched eval on fresh seeds ~ the official enjoy path (same MLP math)
    scores = [np.asarray(rollout(env.reset(seed=s), params))
              for s in (101, 202, 303)]
    score = float(np.concatenate(scores).mean())
    print(f"eval over {3 * B} episodes: mean {score:+.2f}", flush=True)

    wdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "examples", "weights")
    npz_path = os.path.join(wdir, args.env_id + ".npz")
    camp_path = os.path.join(wdir, args.env_id + ".campaign.json")
    best = None
    if os.path.exists(camp_path):
        with open(camp_path) as f:
            best = float(json.load(f).get("best", -1e18))
    if args.force or best is None or score > best:
        np.savez(npz_path,
                 n_layers=np.int64(2),
                 log_std=np.full((act_dim,), -10.0, np.float32),
                 w0=np.asarray(params["w0"], np.float32),
                 b0=np.asarray(params["b0"], np.float32),
                 w1=np.asarray(params["w1"], np.float32),
                 b1=np.asarray(params["b1"], np.float32))
        with open(camp_path, "w") as f:
            json.dump({"best": score, "iters": 0, "algo": "bc-expert"}, f)
        print(f"shipped {npz_path} @ {score:+.2f}", flush=True)
    else:
        print(f"kept existing weights (best {best:+.2f} >= {score:+.2f})",
              flush=True)


if __name__ == "__main__":
    main()
