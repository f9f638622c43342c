#!/bin/bash
# Round-4b queue: after the lrA extra seeds finish on the TPU, run the
# retain5 (actor lr anneal) cell at the retention cells' 30k budget.
set -x
cd /root/repo
# wait for the lrA vmapped run to release its cell lock
while [ -f runs/reproduce/saved/ck_s2lr_vmapped/.cell_lock ]; do sleep 30; done
python scripts/ablation_vmapped.py --cells roadway_s2_retain5 --seeds 3 \
    --base-seed 12341 --episodes 30000 >> runs/reproduce/driver4_retain5.log 2>&1
