#!/bin/bash
# Queue B: waits for queue A, then runs the stabilized roadway stage-2
# cell (grad_clip=10) across 3 seeds.
cd /root/repo
while kill -0 3779 2>/dev/null; do sleep 60; done
set -x
python scripts/reproduce_paper.py --episodes 50000 --seeds 3 \
  --cells roadway_s2_stable
echo QUEUE_B_DONE
