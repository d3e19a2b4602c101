"""Serial round-robin driver for tools/train_campaign.py.

Loops over the job list, running ONE wall-clock-bounded chunk per unmet
job per cycle (so every env makes progress instead of the first job
monopolizing the TPU). A job is met when its campaign.json best >= target,
or when its chunk budget is exhausted. Designed to run inside tmux
(outlives the ~10-min background-task kill) with everything serialized on
this box's single CPU core.

Usage:  python tools/campaign_scheduler.py [--chunk-minutes 8.7]
Logs:   /tmp/campaign/<env>.log (appended per chunk)
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
WEIGHTS = os.path.join(HERE, "..", "examples", "weights")
LOGDIR = "/tmp/campaign"

# (env_id, target, max_chunks, weight = chunks per scheduler cycle, extra)
#
# Round-3 recipes, from scripted-controller probes (/tmp/probe_swingup*,
# /tmp/probe_reacher*): both swingup (+887 scripted, threshold 800) and
# reacher (+23 from a random linear policy, threshold 18) are solvable —
# the round-2 failures were (a) swingup runs predating the physics fix
# plus a replay ring spanning only ~128 iters of history (2048 envs x 512
# slots ~ on-policy SAC, collapses into the swing attractor), and (b)
# reacher settling into the "don't move, save electricity" optimum with
# entropy 0.003. Fix: few-env/long-history SAC for swingup; higher
# exploration for reacher.
# Round-3 recipes (post mid-round review):
# * Swingup + Reacher solved via scripted-expert BC (tools/expert_bc.py) —
#   their campaign.json bests exceed target, so no jobs here.
# * Resuming a converged policy at lr 3e-4 / entropy 3e-3 DEGRADES it
#   (walker chunk 1: eval 1102 -> 520 over 3000 iters): polish resumes run
#   at lr 1e-4 and entropy 1e-3.
# * Walker2D's 64,64 net plateaued ~1000 in both rounds: go to 128,128
#   fresh with lr-anneal + gentle initial exploration (best-guard in
#   campaign.json protects the shipped npz until the new run beats it).
JOBS = [
    ("HalfCheetahPyBulletEnv-v0", 3050.0, 60, 2,
     ["--normalize", "--entropy", "0.001", "--lr", "1e-4",
      "--eval-every", "40"]),
    ("Walker2DPyBulletEnv-v0", 2550.0, 60, 2,
     ["--normalize", "--entropy", "0.005", "--hidden", "128,128",
      "--anneal-updates", "30000", "--log-std-init", "-0.7",
      "--eval-every", "40"]),
    ("HumanoidPyBulletEnv-v0", 2500.0, 80, 2,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    ("HumanoidFlagrunPyBulletEnv-v0", 2000.0, 80, 2,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    ("PusherPyBulletEnv-v0", -40.0, 12, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "60"]),
    ("HopperPyBulletEnv-v0", 2650.0, 12, 1,
     ["--normalize", "--entropy", "0.001", "--lr", "5e-5",
      "--eval-every", "40"]),
]


def best_of(env_id):
    p = os.path.join(WEIGHTS, env_id + ".campaign.json")
    if not os.path.exists(p):
        return None, 0
    with open(p) as f:
        d = json.load(f)
    return float(d.get("best", -1e18)), int(d.get("iters", 0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-minutes", type=float, default=8.7)
    args = ap.parse_args()
    os.makedirs(LOGDIR, exist_ok=True)
    chunks_run = {env: 0 for env, *_ in JOBS}

    while True:
        progress = False
        for env_id, target, max_chunks, weight, extra in JOBS:
            for _ in range(weight):
                best, iters = best_of(env_id)
                if best is not None and best >= target:
                    break
                if chunks_run[env_id] >= max_chunks:
                    break
                chunks_run[env_id] += 1
                progress = True
                log = os.path.join(LOGDIR, env_id + ".log")
                cmd = [sys.executable,
                       os.path.join(HERE, "train_campaign.py"),
                       env_id, "--minutes", str(args.chunk_minutes),
                       "--target", str(target)] + extra
                stamp = time.strftime("%H:%M:%S")
                with open(log, "a") as f:
                    f.write(f"\n===== chunk {chunks_run[env_id]} @ {stamp} "
                            f"(best so far: {best}) =====\n")
                    f.flush()
                    try:
                        # generous hard cap: cold compiles (slow axon
                        # compile service) can precede the chunk's own
                        # post-compile wall-clock budget; killing a chunk
                        # mid-compile restarts that compile from zero, so
                        # err far on the side of patience
                        subprocess.run(
                            cmd, stdout=f, stderr=subprocess.STDOUT,
                            timeout=args.chunk_minutes * 60 + 7200,
                        )
                    except subprocess.TimeoutExpired:
                        f.write("\n[scheduler] chunk hit hard timeout\n")
                b2, it2 = best_of(env_id)
                print(f"{stamp} {env_id}: chunk {chunks_run[env_id]} done, "
                      f"best {best} -> {b2} (iters {it2})", flush=True)
        if not progress:
            print("all jobs met or exhausted; scheduler idle", flush=True)
            time.sleep(600)


if __name__ == "__main__":
    main()
