#!/bin/bash
# Queue 5 (replaces queue4; priority order for the time budget):
# TPU update microbenchmark first (short, closes verdict item 5), then
# retention v2, then the lr sweep, then particle v2.
cd /root/repo
while kill -0 28506 2>/dev/null; do sleep 60; done
set -x
python scripts/bench_update.py > runs/r4/bench_update_tpu.json 2> runs/r4/bench_update_tpu.err
python scripts/ablation_vmapped.py --cells roadway_s2_retain2 --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_s2_lrB --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_s2_retain2 --episodes 30000 --seeds 3
echo QUEUE5_DONE
