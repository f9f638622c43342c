#!/bin/bash
# CPU queue C: waits for the in-flight rd_qmix python (28321), then runs
# remaining round-3 cells on CPU (tunnel RTT degraded; CPU is faster).
cd /root/repo
while kill -0 28321 2>/dev/null; do sleep 30; done
set -x
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 1 --base-seed 12342 \
  --cells checkers_qmix,checkers_coma,checkers_iac
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 3 \
  --cells roadway_s2_stable
echo QUEUE_C_DONE
