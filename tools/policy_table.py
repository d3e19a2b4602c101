"""Print the shipped demo-policy table (markdown) from campaign metadata.

The reference's L6 surface is one frozen-weights demo per env
[ref: pybulletgym/examples/roboschool-weights — SURVEY §3.5]; this table
is the status ledger for ours. Best scores are the campaign ship evals
(large-episode-count deterministic evals recorded by train_campaign /
expert_bc / mirror_distill at ship time).

Usage: python tools/policy_table.py
"""

import glob
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
WEIGHTS = os.path.join(HERE, "..", "examples", "weights")


def main():
    from pybulletgym_tpu.api.registry import registry

    rows = []
    for p in sorted(glob.glob(os.path.join(WEIGHTS, "*.campaign.json"))):
        env_id = os.path.basename(p)[: -len(".campaign.json")]
        with open(p) as f:
            d = json.load(f)
        spec = registry.get(env_id)
        thr = spec.reward_threshold if spec else None
        best = float(d.get("best", float("nan")))
        algo = d.get("algo", "ppo")
        status = ("✓ solved" if thr is not None and best >= thr
                  else "demo" if thr is not None else "demo (no threshold)")
        rows.append((env_id, best, thr, algo, status))

    missing = sorted(set(registry) - {r[0] for r in rows})

    print("| Env | best eval | reward_threshold | algo | status |")
    print("|---|---|---|---|---|")
    for env_id, best, thr, algo, status in rows:
        t = f"{thr:g}" if thr is not None else "—"
        print(f"| {env_id} | {best:+.1f} | {t} | {algo} | {status} |")
    if missing:
        print(f"\nNo policy yet: {', '.join(missing)}")


if __name__ == "__main__":
    main()
