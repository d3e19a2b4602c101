"""Roll out a saved policy — the analog of the reference's
`enjoy_TF_<Env>_v0_2017may.py` demos [ref: pybulletgym/examples/
roboschool-weights — SmallReactivePolicy]: load frozen weights, run the
deterministic policy (tanh MLP mean action), report episode returns.

Usage:
    python examples/enjoy.py HopperPyBulletEnv-v0 [--episodes 5] [--render out.npy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class SmallReactivePolicy:
    """Frozen feed-forward policy, mirroring the reference demo class
    (obs -> tanh hidden layers -> mean action)."""

    def __init__(self, path):
        d = np.load(path)
        n = int(d["n_layers"])
        self.weights = [d[f"w{i}"] for i in range(n)]
        self.biases = [d[f"b{i}"] for i in range(n)]
        self.norm = None
        if "normalized" in d and bool(d["normalized"]):
            self.norm = (d["obs_mean"], np.sqrt(d["obs_var"] + 1e-8))
        self.squash = "squash" in d and bool(d["squash"])  # SAC tanh head

    def act(self, obs):
        h = obs
        if self.norm is not None:
            h = np.clip((h - self.norm[0]) / self.norm[1], -10, 10)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            h = h @ w + b
            if i < len(self.weights) - 1:
                h = np.tanh(h)
        return np.tanh(h) if self.squash else np.clip(h, -1.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("env_id")
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--render", default=None,
                    help="save frames of the first episode to this .npy")
    ap.add_argument("--gif", default=None,
                    help="save the first episode as an animated GIF "
                    "(every --gif-stride-th frame)")
    ap.add_argument("--gif-stride", type=int, default=4)
    ap.add_argument("--max-steps", type=int, default=0,
                    help="cap rollout length (0 = episode limit)")
    args = ap.parse_args()

    import pybulletgym_tpu as pg

    path = args.weights or os.path.join(
        os.path.dirname(__file__), "weights", args.env_id + ".npz"
    )
    pi = SmallReactivePolicy(path)
    env = pg.make(args.env_id)

    frames = []
    capture = args.render or args.gif
    stride = args.gif_stride if args.gif else 1  # --render keeps every frame
    for ep in range(args.episodes):
        obs, _ = env.reset(seed=ep)
        total, steps = 0.0, 0
        while True:
            obs, r, term, trunc, _ = env.step(pi.act(obs))
            total += r
            steps += 1
            if capture and ep == 0 and steps % stride == 0:
                frames.append(env.render())
            if term or trunc or (args.max_steps and steps >= args.max_steps):
                break
        print(f"episode {ep}: return {total:+.1f} in {steps} steps")

    if args.render and frames:
        np.save(args.render, np.stack(frames))
        print(f"saved {len(frames)} frames to {args.render}")
    if args.gif and frames:
        from PIL import Image

        ims = [Image.fromarray(f) for f in frames]
        ims[0].save(args.gif, save_all=True, append_images=ims[1:],
                    duration=int(1000 * args.gif_stride / 60), loop=0,
                    optimize=True)
        print(f"saved {len(ims)}-frame gif to {args.gif}")


if __name__ == "__main__":
    main()
