#!/bin/bash
# Round-5 queue 1: the verdict's training matrix, vmapped 3 seeds/cell.
cd /root/repo
set -x
python scripts/ablation_vmapped.py --cells roadway_s2_retain6 --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_s2_V --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_s2_V --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_s2_cross_retain --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_s2_merge_retain --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_qmix --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_blend --episodes 50000 --seeds 3
echo R5_QUEUE1_DONE
