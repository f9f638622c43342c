#!/bin/bash
# Round-5 queue 2: waits for queue1's bash (22883), then re-runs the
# buggy-wiring QMIX cell at the FULL 50k budget — the round-3 run was
# partial (26k) and its committed model_final is a stale artifact the
# checkpoint verifier caught (restored eval 3.5 vs recorded 18.3).
cd /root/repo
while kill -0 22883 2>/dev/null; do sleep 60; done
set -x
python scripts/ablation_vmapped.py --cells checkers_qmix_ref --episodes 50000 --seeds 3
echo R5_QUEUE2_DONE
