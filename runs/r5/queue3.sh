#!/bin/bash
# Round-5 queue 3: quiet-chip measurements, chained after queue2.
#   1. seed-throughput curve + HBM ceiling (verdict item 6) ->
#      runs/r5/seed_curve.jsonl
#   2. solo headline bench capture (verdict item 3: reconcile the
#      record on an uncontended chip) -> runs/r5/bench_solo.json
# Waits for queue4's sentinel (not just its pid, which can be reused),
# so the measurements run on a fully quiesced chip after ALL training.
cd /root/repo
Q4PID=$(cat runs/r5/queue4.pid)
until grep -q R5_QUEUE4_DONE runs/r5/queue4.log || ! kill -0 "$Q4PID" 2>/dev/null; do
  sleep 60
done
set -x
python scripts/bench_seed_curve.py > runs/r5/seed_curve.jsonl 2> runs/r5/seed_curve.err
python bench.py > runs/r5/bench_solo.json 2> runs/r5/bench_solo.err
echo R5_QUEUE3_DONE
