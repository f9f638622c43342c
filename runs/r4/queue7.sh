#!/bin/bash
# Queue 7: after queue 6, the roadway retention v3 cell (slow actor).
cd /root/repo
while kill -0 7851 2>/dev/null; do sleep 60; done
set -x
python scripts/ablation_vmapped.py --cells roadway_s2_retain3 --episodes 30000 --seeds 3
echo QUEUE7_DONE
