"""Resumable PPO training: checkpoints TrainState every run so long
trainings survive session limits. Usage:
    python examples/train_loop.py HopperPyBulletEnv-v0 --iters 150 --batch 4096
Re-running continues from the saved checkpoint.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--entropy", type=float, default=0.0)
    ap.add_argument("--normalize", action="store_true",
                    help="running observation normalization")
    args = ap.parse_args()

    from pybulletgym_tpu.parallel import ppo
    from pybulletgym_tpu.utils import checkpoint

    ck = os.path.join(os.path.dirname(__file__), "weights",
                      args.env_id + ".trainstate.npz")
    cfg = ppo.PPOConfig(rollout_length=32, learning_rate=args.lr,
                        num_minibatches=8, entropy_coef=args.entropy,
                        normalize_obs=args.normalize)
    t0 = time.time()

    def progress(it, m):
        if it % 10 == 0:
            print(f"iter {it} reward {m['reward_mean']:+.3f} "
                  f"done_frac {m['done_frac']:.3f} "
                  f"{(it+1)*cfg.rollout_length*args.batch/(time.time()-t0):,.0f} steps/s",
                  flush=True)

    resume = ck if os.path.exists(ck) else None
    print("resuming from" if resume else "fresh start", resume or "", flush=True)
    try:
        ts, es, m = ppo.train(args.env_id, args.batch, args.iters, cfg=cfg,
                              backend=args.backend, progress=progress,
                              resume_from=resume)
    except ValueError as e:
        if resume is None:
            raise
        print(f"checkpoint incompatible ({e}); starting fresh", flush=True)
        ts, es, m = ppo.train(args.env_id, args.batch, args.iters, cfg=cfg,
                              backend=args.backend, progress=progress)
    os.makedirs(os.path.dirname(ck), exist_ok=True)
    checkpoint.save(ck, ts)

    out = os.path.join(os.path.dirname(__file__), "weights", args.env_id + ".npz")
    p = ts.params
    np.savez_compressed(
        out, n_layers=len(p.policy.weights),
        log_std=np.asarray(p.log_std),
        **{f"w{i}": np.asarray(w) for i, w in enumerate(p.policy.weights)},
        **{f"b{i}": np.asarray(b) for i, b in enumerate(p.policy.biases)},
        **{f"vw{i}": np.asarray(w) for i, w in enumerate(p.value.weights)},
        **{f"vb{i}": np.asarray(b) for i, b in enumerate(p.value.biases)},
        obs_mean=np.asarray(ts.obs_stats.mean),
        obs_var=np.asarray(ts.obs_stats.var),
        normalized=bool(args.normalize),
    )
    print("saved", out, "and", ck, flush=True)


if __name__ == "__main__":
    main()
