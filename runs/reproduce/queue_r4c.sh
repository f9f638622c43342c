#!/bin/bash
# Round-4c queue: after retain5 releases the TPU, extend the lr-tuned
# CM3 checkers cell to a 100k-episode total budget (the 50k curves are
# still rising at the cap): first the closest seed (12343, best 23.9
# at 43k) single-seed, then the 12344-47 batch from its stacked
# vmapped autosave.
set -x
cd /root/repo
while [ -f runs/reproduce/saved/rd_s2r5_vmapped/.cell_lock ]; do sleep 30; done
python scripts/reproduce_paper.py --cells checkers_s2_lrA_ext --seeds 1 \
    --base-seed 12343 --episodes 100000 > runs/reproduce/driver4_ext1.log 2>&1
python scripts/ablation_vmapped.py --cells checkers_s2_lrA_ext --seeds 4 \
    --base-seed 12344 --episodes 100000 > runs/reproduce/driver4_ext2.log 2>&1
