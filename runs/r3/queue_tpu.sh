#!/bin/bash
# TPU queue: remaining round-3 cells (CPU queue finishes roadway_qmix).
cd /root/repo
set -x
python scripts/reproduce_paper.py --episodes 50000 --seeds 1 --base-seed 12342 \
  --cells checkers_qmix,checkers_coma,checkers_iac
python scripts/reproduce_paper.py --episodes 50000 --seeds 3 \
  --cells roadway_s2_stable
echo QUEUE_TPU_DONE
