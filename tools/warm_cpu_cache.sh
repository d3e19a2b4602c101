#!/bin/bash
# Warm the persistent CPU jit cache by re-running the test chunks until they
# complete (each run makes durable progress via the compile cache). Stops as
# soon as the campaign scheduler is running — the single core belongs to
# training once the TPU is back.
cd /root/repo
for i in $(seq 1 12); do
  if pgrep -f campaign_scheduler.py > /dev/null; then
    echo "$(date +%H:%M:%S) scheduler running; warming loop yields"
    exit 0
  fi
  echo "===== warm pass $i (fast) $(date +%H:%M:%S) ====="
  PYBULLETGYM_TPU_FORCE_CPU=1 timeout 560 python -m pytest tests/ -q -m "not slow" > /tmp/warm_fast.log 2>&1
  rcf=$?
  tail -2 /tmp/warm_fast.log
  if [ $rcf -eq 0 ]; then
    if pgrep -f campaign_scheduler.py > /dev/null; then exit 0; fi
    echo "===== warm pass $i (slow) $(date +%H:%M:%S) ====="
    PYBULLETGYM_TPU_FORCE_CPU=1 timeout 560 python -m pytest tests/ -q -m slow > /tmp/warm_slow.log 2>&1
    rcs=$?
    tail -2 /tmp/warm_slow.log
    if [ $rcs -eq 0 ]; then
      echo "$(date +%H:%M:%S) both chunks green on CPU"
      exit 0
    fi
  fi
done
