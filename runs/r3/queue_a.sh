#!/bin/bash
# Round-3 training queue A: missing matrix cells + non-checkers ablations
# + third seeds for the checkers ablation ordering statistics.
cd /root/repo
set -x
python scripts/reproduce_paper.py --episodes 50000 --seeds 3 \
  --cells particle_s2_cross,particle_s2_merge,particle_s2_dual
python scripts/reproduce_paper.py --episodes 50000 --seeds 3 \
  --cells particle_coma,roadway_qmix
python scripts/reproduce_paper.py --episodes 50000 --seeds 1 --base-seed 12342 \
  --cells checkers_qmix,checkers_coma,checkers_iac
echo QUEUE_A_DONE
