#!/bin/bash
# Queue 8 (replaces 6+7 after the queue4/5 overlap cleanup): waits for
# queue4's bash (13036: lrB then old-path bench_update), then re-runs
# the scanned update microbenchmark alone and the retention v3 cell.
cd /root/repo
while kill -0 13036 2>/dev/null; do sleep 60; done
set -x
python scripts/bench_update.py > runs/r4/bench_update_tpu2.json 2> runs/r4/bench_update_tpu2.err
python scripts/ablation_vmapped.py --cells roadway_s2_retain3 --episodes 30000 --seeds 3
echo QUEUE8_DONE
