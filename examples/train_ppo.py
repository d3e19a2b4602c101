"""Train a PPO policy on any registered env and save the weights.

Usage:
    python examples/train_ppo.py HopperPyBulletEnv-v0 --iters 300 --batch 2048

The saved .npz is consumed by examples/enjoy.py — the analog of the
reference's pretrained-demo scripts [ref: pybulletgym/examples/
roboschool-weights/enjoy_TF_*.py], with weights trained by the in-repo
sharded PPO learner instead of imported TF checkpoints.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--rollout", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pybulletgym_tpu.parallel import ppo

    cfg = ppo.PPOConfig(rollout_length=args.rollout, learning_rate=args.lr)
    t0 = time.time()

    def progress(it, metrics):
        if it % 10 == 0:
            sps = (it + 1) * args.rollout * args.batch / (time.time() - t0)
            print(f"iter {it:4d}  reward/step {metrics['reward_mean']:+.3f}  "
                  f"loss {metrics['loss']:+.4f}  {sps:,.0f} env-steps/s",
                  flush=True)

    ts, es, metrics = ppo.train(
        args.env_id, args.batch, args.iters, cfg=cfg, seed=args.seed,
        progress=progress,
    )

    out = args.out or os.path.join(
        os.path.dirname(__file__), "weights", args.env_id + ".npz"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    p = ts.params
    np.savez_compressed(
        out,
        n_layers=len(p.policy.weights),
        log_std=np.asarray(p.log_std),
        **{f"w{i}": np.asarray(w) for i, w in enumerate(p.policy.weights)},
        **{f"b{i}": np.asarray(b) for i, b in enumerate(p.policy.biases)},
        **{f"vw{i}": np.asarray(w) for i, w in enumerate(p.value.weights)},
        **{f"vb{i}": np.asarray(b) for i, b in enumerate(p.value.biases)},
    )
    print(f"saved {out}  (final reward/step {float(metrics['reward_mean']):+.3f})")


if __name__ == "__main__":
    main()
