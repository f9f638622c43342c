#!/bin/bash
# Queue 3 (replaces queue2): waits for the main round-4 queue, then the
# retention-v2 cell (bounded TD targets), the lr_actor=5e-4 CM3 cell,
# and the TPU update-latency microbenchmark.
cd /root/repo
while kill -0 28506 2>/dev/null; do sleep 60; done
set -x
python scripts/ablation_vmapped.py --cells roadway_s2_retain2 --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_s2_lrB --episodes 50000 --seeds 3
python scripts/bench_update.py > runs/r4/bench_update_tpu.json 2> runs/r4/bench_update_tpu.err
echo QUEUE3_DONE
