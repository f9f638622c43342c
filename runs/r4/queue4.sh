#!/bin/bash
# Queue 4 (replaces queue3): retention v2 cells (roadway: bounded TD
# targets; particle: freeze + reference epsilon), the lr_actor=5e-4 CM3
# cell, then the TPU update-latency microbenchmark.
cd /root/repo
while kill -0 28506 2>/dev/null; do sleep 60; done
set -x
python scripts/ablation_vmapped.py --cells roadway_s2_retain2 --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_s2_retain2 --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_s2_lrB --episodes 50000 --seeds 3
python scripts/bench_update.py > runs/r4/bench_update_tpu.json 2> runs/r4/bench_update_tpu.err
echo QUEUE4_DONE
