#!/bin/bash
# Queue 6: after queue 5, re-run the update microbenchmark with the
# scanned (device-time) methodology.
cd /root/repo
while kill -0 25721 2>/dev/null; do sleep 60; done
set -x
python scripts/bench_update.py > runs/r4/bench_update_tpu2.json 2> runs/r4/bench_update_tpu2.err
echo QUEUE6_DONE
