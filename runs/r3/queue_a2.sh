#!/bin/bash
# Round-3 training queue A2 (CPU fallback; TPU tunnel wedged at 00:45).
cd /root/repo
set -x
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 3 \
  --cells particle_s2_cross,particle_s2_merge,particle_s2_dual
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 3 \
  --cells particle_coma,roadway_qmix
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 1 --base-seed 12342 \
  --cells checkers_qmix,checkers_coma,checkers_iac
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 3 \
  --cells roadway_s2_stable
echo QUEUE_A2_DONE
