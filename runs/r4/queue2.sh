#!/bin/bash
# Queue 2: waits for the main round-4 queue, then the lr_actor=5e-4 CM3
# cell and the TPU update-latency microbenchmark.
cd /root/repo
while kill -0 28506 2>/dev/null; do sleep 60; done
set -x
python scripts/ablation_vmapped.py --cells checkers_s2_lrB --episodes 50000 --seeds 3
python scripts/bench_update.py > runs/r4/bench_update_tpu.json 2> runs/r4/bench_update_tpu.err
echo QUEUE2_DONE
