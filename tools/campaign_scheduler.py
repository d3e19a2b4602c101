"""Serial round-robin driver for the policy-training campaign.

Loops over the job list, running ONE wall-clock-bounded chunk per unmet
job per cycle (so every env makes progress instead of the first job
monopolizing the TPU). A job is met when its campaign.json best >= target,
or when its chunk budget is exhausted. Designed to run via setsid/nohup
(outlives the ~10-min background-task kill) with everything serialized on
this box's single CPU core.

Two job kinds:
  ppo    — chunks of tools/train_campaign.py (PPO/SAC on the TPU)
  expert — CEM-tune a scripted controller (tools/tune_expert.py) until
           its expert.json score clears tune_target, then clone it into
           the shipped MLP via tools/expert_bc.py; re-tune with --resume
           if the cloned policy falls short of the ship target.

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

# Round-3 recipes (post mid-round review):
# * Swingup/Reacher/mirror-pendula solved via scripted-expert BC + CEM —
#   no jobs needed; their campaign.json bests exceed target.
# * Resuming a converged PPO policy at lr 3e-4 / entropy 3e-3 DEGRADES it
#   (walker chunk 1: eval 1102 -> 520 over 3000 iters): polish resumes run
#   at lr 1e-4 and entropy 1e-3.
# * Walker2D's 64,64 net plateaued ~1000 in both rounds: go to 128,128
#   fresh with lr-anneal + gentle initial exploration (best-guard in
#   campaign.json protects the shipped npz until the new run beats it).
# * Arm envs (Pusher/Striker/Thrower + mirrors) go through the
#   model-based-expert pipeline (tools/arm_experts.py), not RL: CEM-tune
#   ~10 controller constants against the env reward, then behavior-clone.
#   Targets are derived from the analytic random-policy baselines
#   (Pusher ~ -95, Striker ~ -270, Thrower ~ -50 random).

PPO_JOBS = [
    # (env_id, target, max_chunks, weight, extra train_campaign args)
    # Round-5 ordering (VERDICT r4 item 1): the three open PyBullet
    # thresholds lead with heavy weights — HalfCheetah SAC (round 4 hit
    # eval ~2000 in 2 chunks from scratch; /tmp ck lost, learner now
    # persists in-repo), Walker2D 128,128 fresh, HopperMuJoCo's broken
    # demo. Humanoid-family quality lifts follow; mirror polish trails.
    ("HalfCheetahPyBulletEnv-v0", 3050.0, 60, 3,
     ["--algo", "sac", "--hidden", "256,256", "--eval-every", "40"]),
    # Round-5 mid-round switch: the 128,128 PPO recipe spikes to ~1000 by
    # iter 80 then self-destructs (975 -> 100 inside one chunk; resumed
    # chunks train the corpse). SAC is the known-good closer here — same
    # recipe as HalfCheetah; the best-guard protects the 1193 PPO npz.
    ("Walker2DPyBulletEnv-v0", 2550.0, 60, 2,
     ["--algo", "sac", "--hidden", "256,256", "--eval-every", "40"]),
    # HopperMuJoCo: round-5 PPO-from-scratch fixed the broken distill
    # (69 -> 1492 ship) but plateaued at 27k iters below the 1800 target;
    # switch to the SAC closer recipe (same as the HalfCheetah run that
    # went 2442 -> 3130). Best-guard protects the 1492 npz.
    ("HopperMuJoCoEnv-v0", 1800.0, 30, 2,
     ["--algo", "sac", "--hidden", "256,256", "--eval-every", "40"]),
    # Humanoid family: the reference's marquee demos (SURVEY §3.5).
    # 4.25x step cost — resumes continue round-4 trainstates.
    ("HumanoidPyBulletEnv-v0", 2500.0, 80, 2,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    ("HumanoidFlagrunPyBulletEnv-v0", 2000.0, 80, 2,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    ("HumanoidFlagrunHarderPyBulletEnv-v0", 1500.0, 60, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    ("HumanoidMuJoCoEnv-v0", 1500.0, 40, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    ("AtlasPyBulletEnv-v0", 600.0, 40, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40",
      "--hidden", "256,128", "--lr", "2e-4",
      "--anneal-updates", "60000", "--log-std-init", "-0.7"]),
    # MuJoCo-mirror walkers: quality lifts (registry thresholds are the
    # full Gym-v2 "solved" bars — 3800/4800/6000 — far beyond what a
    # scheduler slot buys; these targets are demo-quality gaits, and the
    # best-guard keeps raising the shipped npz as chunks accumulate)
    ("Walker2DMuJoCoEnv-v0", 1500.0, 30, 1,
     ["--normalize", "--entropy", "0.005", "--hidden", "128,128",
      "--anneal-updates", "30000", "--log-std-init", "-0.7",
      "--eval-every", "40"]),
    ("HalfCheetahMuJoCoEnv-v0", 2200.0, 30, 1,
     ["--normalize", "--entropy", "0.001", "--eval-every", "40"]),
    # (AntMuJoCo dropped: distilled 2564 cleared its 2200 target.)
    # PPO polish for the PB arm envs: dense negative-distance rewards are
    # easy PPO food — may beat the scripted-expert BC; the best-guard
    # keeps whichever is better.
    ("PusherPyBulletEnv-v0", -45.0, 6, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40"]),
    ("StrikerPyBulletEnv-v0", -130.0, 6, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40"]),
    ("ThrowerPyBulletEnv-v0", -25.0, 6, 1,
     ["--normalize", "--entropy", "0.003", "--eval-every", "40"]),
]

# Mirror-walker distillation (tools/mirror_distill.py): identical dynamics
# let a solved PyBullet teacher be cloned into the mirror env in ONE cheap
# chunk (teacher rollouts + BC + DAgger), far cheaper than PPO-from-scratch.
# Run once per mirror before its PPO job; the tool ships only if it beats
# the campaign best, and the PPO job then continues from/above that bar.
DISTILL_JOBS = [
    # (mirror_env_id, teacher_env_id) — ordered by teacher quality
    ("AntMuJoCoEnv-v0", "AntPyBulletEnv-v0"),
    ("HopperMuJoCoEnv-v0", "HopperPyBulletEnv-v0"),
    ("HalfCheetahMuJoCoEnv-v0", "HalfCheetahPyBulletEnv-v0"),
    ("Walker2DMuJoCoEnv-v0", "Walker2DPyBulletEnv-v0"),
]

EXPERT_JOBS = [
    # (env_id, tune_target, ship_target, max_chunks, weight)
    # weight = chunks per scheduler cycle: 2 lets an env tune AND clone
    # (ship its first policy) inside one cycle instead of waiting a full
    # round-robin lap
    # Round-4 recalibration: the original targets were guesses from random
    # baselines; measured CEM plateaus are Pusher -58 / Striker -251 /
    # Thrower -58 (see /tmp/campaign logs). Ship targets sit at the
    # achieved first-policy scores so these jobs idle out once a policy
    # exists and the chunk budget flows to the PPO polish jobs instead.
    # weight 3 (round 4): ONE scheduler cycle fits in a round — a weight-1
    # job would tune in cycle 1 and never reach its clone chunk, shipping
    # nothing. 3 chunks = tune -> clone -> (stop | retune) inside cycle 1.
    ("PusherPyBulletEnv-v0", -58.0, -65.0, 6, 3),
    ("StrikerPyBulletEnv-v0", -245.0, -270.0, 6, 3),
    ("ThrowerPyBulletEnv-v0", -50.0, -65.0, 6, 3),
    # mirror arms: seeded from the PB thetas — ship the first clone
    # (any score) and stop; quality polish belongs to later rounds.
    # Tune targets sit BELOW the seeded-tune results so a restart clones
    # the existing theta immediately instead of burning a re-tune chunk.
    ("PusherMuJoCoEnv-v0", -50.0, -1e9, 4, 2),
    ("StrikerMuJoCoEnv-v0", -270.0, -1e9, 4, 2),
    ("ThrowerMuJoCoEnv-v0", -60.0, -1e9, 4, 2),
]

# mirror arms share the controller family AND theta layout with their
# PyBullet cousins (tools/arm_experts.py ARM_EXPERTS) — seed an untuned
# mirror from the cousin's tuned theta so its CEM starts near the optimum
EXPERT_SEEDS = {
    "PusherMuJoCoEnv-v0": "PusherPyBulletEnv-v0",
    "StrikerMuJoCoEnv-v0": "StrikerPyBulletEnv-v0",
    "ThrowerMuJoCoEnv-v0": "ThrowerPyBulletEnv-v0",
}


def seed_expert(env_id):
    dst = os.path.join(WEIGHTS, env_id + ".expert.json")
    src_env = EXPERT_SEEDS.get(env_id)
    if os.path.exists(dst) or src_env is None:
        return
    src = os.path.join(WEIGHTS, src_env + ".expert.json")
    if not os.path.exists(src):
        return
    with open(src) as f:
        theta = json.load(f)["theta"]
    with open(dst, "w") as f:
        # score -inf: the seed carries the THETA only — the cousin's score
        # is on a different env, so the scheduler must still run a tune
        # (re-evaluating on this env) before cloning
        json.dump({"theta": theta, "score": -1e18,
                   "seeded_from": src_env}, f)


def best_of(env_id):
    p = os.path.join(WEIGHTS, env_id + ".campaign.json")
    if not os.path.exists(p):
        return None, 0
    with open(p) as f:
        d = json.load(f)
    return float(d.get("best", -1e18)), int(d.get("iters", 0))


def expert_score(env_id):
    p = os.path.join(WEIGHTS, env_id + ".expert.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return float(json.load(f).get("score", -1e18))


def run_chunk(env_id, cmd, label, hard_timeout):
    log = os.path.join(LOGDIR, env_id + ".log")
    stamp = time.strftime("%H:%M:%S")
    with open(log, "a") as f:
        f.write(f"\n===== {label} @ {stamp} =====\n")
        f.flush()
        try:
            # generous hard cap: cold compiles (slow axon compile service)
            # can precede the chunk's own post-compile wall-clock budget;
            # killing a chunk mid-compile restarts that compile from zero,
            # so err far on the side of patience
            subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           timeout=hard_timeout)
        except subprocess.TimeoutExpired:
            f.write("\n[scheduler] chunk hit hard timeout\n")
    return stamp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk-minutes", type=float, default=8.7)
    # slop on top of the chunk budget for cold compiles: generous enough
    # that a healthy first compile (minutes) is never guillotined, small
    # enough that ONE degraded chunk can't eat a third of a round
    ap.add_argument("--slop-seconds", type=float, default=2700.0)
    # stop cleanly after this much wall-clock so the round driver gets the
    # TPU to itself for bench/dryrun (0 = run forever)
    ap.add_argument("--stop-after-minutes", type=float, default=0.0)
    args = ap.parse_args()
    os.makedirs(LOGDIR, exist_ok=True)
    chunks_run = {}
    hard = args.chunk_minutes * 60 + args.slop_seconds
    t_start = time.time()

    def expired():
        return (args.stop_after_minutes > 0
                and time.time() - t_start > args.stop_after_minutes * 60)

    distilled = set()

    while True:
        if expired():
            print("stop-after deadline reached; scheduler exiting", flush=True)
            return
        progress = False

        # one-shot distillation first: whole mirror envs' first policies
        for env_id, teacher in DISTILL_JOBS:
            if env_id in distilled:
                continue
            if best_of(env_id)[0] is not None:
                # a policy already shipped (earlier distill or PPO run):
                # distillation is a one-shot bootstrap, don't redo it on
                # scheduler restarts — the PPO job continues from here
                distilled.add(env_id)
                continue
            t_best, _ = best_of(teacher)
            if t_best is None or t_best < 1000.0:
                continue  # teacher too weak to bother cloning
            if expired():
                print("deadline; exiting", flush=True)
                return
            distilled.add(env_id)
            progress = True
            best, _ = best_of(env_id)
            cmd = [sys.executable, os.path.join(HERE, "mirror_distill.py"),
                   env_id]
            stamp = run_chunk(env_id, cmd,
                              f"distill from {teacher} ({t_best})", hard)
            b2, _ = best_of(env_id)
            print(f"{stamp} {env_id}: distill done, best {best} -> {b2}",
                  flush=True)

        # expert pipeline next: cheap chunks, whole envs' first policies
        for env_id, tune_t, ship_t, max_chunks, weight in EXPERT_JOBS:
            seed_expert(env_id)
            for _ in range(weight):
                best, _ = best_of(env_id)
                if best is not None and best >= ship_t:
                    break
                if chunks_run.get(("expert", env_id), 0) >= max_chunks:
                    break
                if expired():
                    print("deadline; exiting", flush=True)
                    return
                chunks_run[("expert", env_id)] = chunks_run.get(("expert", env_id), 0) + 1
                progress = True
                sc = expert_score(env_id)
                # strict tune/clone alternation: odd chunks refine theta
                # (CEM resume), even chunks behavior-clone whatever theta
                # exists — BC is cheap and the campaign best-guard keeps
                # the shipped npz monotone, so an "unnecessary" clone costs
                # one chunk while a missed clone (round-4 bug: clones were
                # gated on sc >= tune_target, and the recalibrated targets
                # SIT at the measured CEM plateaus) starves the env of a
                # policy entirely. Exception: clone early once the tune
                # target is already met.
                n = chunks_run[("expert", env_id)]
                do_clone = sc is not None and (
                    (sc >= tune_t and best is None) or n % 2 == 0)
                if not do_clone:
                    cmd = [sys.executable,
                           os.path.join(HERE, "tune_expert.py"),
                           env_id, "--minutes", str(args.chunk_minutes),
                           "--gens", "10000", "--resume"]
                    label = f"tune chunk {n} (score {sc})"
                else:
                    cmd = [sys.executable, os.path.join(HERE, "expert_bc.py"),
                           env_id, "--hidden", "128"]
                    label = f"bc chunk {n} (theta score {sc})"
                stamp = run_chunk(env_id, cmd, label, hard)
                b2, _ = best_of(env_id)
                print(f"{stamp} {env_id}: {label} done, best {best} -> {b2}",
                      flush=True)

        for env_id, target, max_chunks, weight, extra in PPO_JOBS:
            for _ in range(weight):
                best, iters = best_of(env_id)
                if best is not None and best >= target:
                    break
                if chunks_run.get(("ppo", env_id), 0) >= max_chunks:
                    break
                if expired():
                    print("deadline; exiting", flush=True)
                    return
                chunks_run[("ppo", env_id)] = chunks_run.get(("ppo", env_id), 0) + 1
                progress = True
                cmd = [sys.executable, os.path.join(HERE, "train_campaign.py"),
                       env_id, "--minutes", str(args.chunk_minutes),
                       "--target", str(target)] + extra
                stamp = run_chunk(
                    env_id, cmd,
                    f"chunk {chunks_run[("ppo", env_id)]} (best so far: {best})", hard)
                b2, it2 = best_of(env_id)
                print(f"{stamp} {env_id}: chunk {chunks_run[("ppo", env_id)]} done, "
                      f"best {best} -> {b2} (iters {it2})", flush=True)

        if not progress:
            print("all jobs met or exhausted; scheduler idle", flush=True)
            time.sleep(600)


if __name__ == "__main__":
    main()
