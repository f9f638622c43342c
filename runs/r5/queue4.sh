#!/bin/bash
# Round-5 queue 4: the v7 retention recipe (v6 + entropy floor), run
# after queue2.  v6's in-flight diagnosis showed the IS correction
# holds retention to ~16k episodes but the on-policy simplex-corner
# collapse remains once the buffer turns near-greedy; v7 adds
# pg_ent_coef=0.01 (see scripts/reproduce_paper.py cell comment).
cd /root/repo
Q2PID=$(cat runs/r5/queue2.pid)
until grep -q R5_QUEUE2_DONE runs/r5/queue2.log || ! kill -0 "$Q2PID" 2>/dev/null; do
  sleep 60
done
set -x
python scripts/ablation_vmapped.py --cells roadway_s2_retain7 --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells roadway_s2_retain8 --episodes 30000 --seeds 3
echo R5_QUEUE4_DONE
