#!/bin/bash
# CPU fallback for the policy campaign while the TPU is down (observed
# round 3: axon hangs at jax.devices() for 12+ hours). The arm-env expert
# pipeline (CEM tune -> behavior-clone) is the one campaign lane that is
# tractable on the single CPU core: one jitted rollout per program, small
# batches, 100-150-step horizons. PPO walker/humanoid jobs stay TPU-only.
#
# Yields immediately if the TPU campaign scheduler is running (the TPU
# recovered): the scheduler owns training from then on and will skip any
# env whose campaign.json best already clears its ship target.
#
# Run:  setsid nohup bash tools/cpu_fallback_campaign.sh \
#         >> /tmp/campaign/cpu_fallback.log 2>&1 < /dev/null &
cd /root/repo

# (env_id, ship_target) pairs — mirrors tools/campaign_scheduler.py EXPERT_JOBS
JOBS=(
  "PusherPyBulletEnv-v0 -50"
  "StrikerPyBulletEnv-v0 -190"
  "ThrowerPyBulletEnv-v0 -40"
  "PusherMuJoCoEnv-v0 -38"
  "StrikerMuJoCoEnv-v0 -190"
  "ThrowerMuJoCoEnv-v0 -40"
)

best_of() {  # prints campaign best or "none"
  python - "$1" <<'EOF'
import json, os, sys
p = os.path.join("examples/weights", sys.argv[1] + ".campaign.json")
print(json.load(open(p)).get("best", "none") if os.path.exists(p) else "none")
EOF
}

met() {  # env ship_target -> exit 0 if met
  b=$(best_of "$1")
  [ "$b" = "none" ] && return 1
  python -c "import sys; sys.exit(0 if float('$b') >= float('$2') else 1)"
}

for round in 1 2 3; do
  for job in "${JOBS[@]}"; do
    set -- $job; env=$1; ship=$2
    if pgrep -f campaign_scheduler.py > /dev/null; then
      echo "$(date +%H:%M:%S) TPU scheduler running; CPU fallback yields"
      exit 0
    fi
    if met "$env" "$ship"; then
      echo "$(date +%H:%M:%S) $env met (best $(best_of $env) >= $ship); skip"
      continue
    fi
    echo "===== $env round $round tune $(date +%H:%M:%S) ====="
    timeout 3000 python tools/tune_expert.py "$env" --cpu --minutes 7 \
      --gens 10000 --resume 2>&1 | tail -4
    echo "===== $env round $round bc $(date +%H:%M:%S) ====="
    timeout 3000 python tools/expert_bc.py "$env" --cpu --hidden 128 \
      2>&1 | tail -6
    echo "$(date +%H:%M:%S) $env best now $(best_of $env)"
  done
done
echo "$(date +%H:%M:%S) cpu fallback campaign done"
