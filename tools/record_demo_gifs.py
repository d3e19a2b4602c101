"""Render demo GIFs for shipped policies — the visual analog of the
reference's `enjoy_TF_*.py` GUI demos [ref: pybulletgym/examples/
roboschool-weights — SURVEY §3.5].

Rolls each env's frozen policy (examples/weights/<env>.npz) for one
episode via examples/enjoy.py --gif and writes docs/demos/<env>.gif.

Usage: python tools/record_demo_gifs.py [env_id ...]   (default: flagship set)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, "..")
OUT = os.path.join(REPO, "docs", "demos")

FLAGSHIPS = [
    "HopperPyBulletEnv-v0",
    "Walker2DPyBulletEnv-v0",
    "HalfCheetahPyBulletEnv-v0",
    "AntPyBulletEnv-v0",
    "HumanoidPyBulletEnv-v0",
    "ReacherPyBulletEnv-v0",
    "PusherPyBulletEnv-v0",
    "InvertedPendulumSwingupPyBulletEnv-v0",
]


def main():
    ids = sys.argv[1:] or FLAGSHIPS
    os.makedirs(OUT, exist_ok=True)
    for env_id in ids:
        npz = os.path.join(REPO, "examples", "weights", env_id + ".npz")
        if not os.path.exists(npz):
            print(f"skip {env_id}: no weights")
            continue
        gif = os.path.join(OUT, env_id + ".gif")
        print(f"recording {env_id} ...", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "examples", "enjoy.py"),
             env_id, "--episodes", "1", "--gif", gif,
             "--max-steps", "300"],
            timeout=900,
        )
        if r.returncode:
            print(f"FAILED {env_id} (rc {r.returncode})")


if __name__ == "__main__":
    main()
