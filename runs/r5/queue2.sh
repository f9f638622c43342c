#!/bin/bash
# Round-5 queue 2: waits for queue1 (pid in runs/r5/queue1.pid, plus
# the R5_QUEUE1_DONE sentinel in its log in case the pid is reused),
# then re-runs the buggy-wiring QMIX cell at the FULL 50k budget — the
# round-3 run was partial (26k) and its committed model_final is a
# stale artifact the checkpoint verifier caught (restored eval 3.5 vs
# recorded 18.3).
cd /root/repo
# queue1.pid holds the bare pid.  Wait until that pid is gone OR the
# sentinel lands (covers pid reuse); require BOTH checks each pass.
Q1PID=$(cat runs/r5/queue1.pid)
until grep -q R5_QUEUE1_DONE runs/r5/queue1.log || ! kill -0 "$Q1PID" 2>/dev/null; do
  sleep 60
done
set -x
python scripts/ablation_vmapped.py --cells checkers_qmix_ref --episodes 50000 --seeds 3
echo R5_QUEUE2_DONE
