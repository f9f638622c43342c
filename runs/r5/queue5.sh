#!/bin/bash
# Round-5 queue 5: slack cells, run AFTER the quiet-chip benches
# (queue3) so they cannot contend with the measurements.  Each cell is
# gated on the wall clock so the round ends with a quiesced chip:
#   * particle_s2_cross_retain2 (~20 min) — entropy floor on the cross
#     scenario, the applicable departure for the on-policy PG decay
#     the plain retention recipe could not stop (FAIL 0/3).
#   * checkers_s2_V full-budget rerun (~40 min) — replaces the
#     'partial backend-killed at 45k' rows with full-50k rows.  The
#     stale partial logs are moved aside as provenance first (a fresh
#     run appends to log.csv otherwise).
cd /root/repo
Q3PID=$(cat runs/r5/queue3.pid)
until grep -q R5_QUEUE3_DONE runs/r5/queue3.log || ! kill -0 "$Q3PID" 2>/dev/null; do
  sleep 60
done
set -x
if [ "$(date +%s)" -lt "$(date -d '2026-08-22 03:25' +%s)" ]; then
  python scripts/ablation_vmapped.py --cells particle_s2_cross_retain2 --episodes 50000 --seeds 3
fi
if [ "$(date +%s)" -lt "$(date -d '2026-08-22 03:05' +%s)" ]; then
  for s in 12341 12342 12343; do
    [ -d runs/reproduce/log/ck_s2V_$s ] && \
      mv runs/reproduce/log/ck_s2V_$s runs/reproduce/log/ck_s2Vpartial_$s
  done
  python scripts/ablation_vmapped.py --cells checkers_s2_V --episodes 50000 --seeds 3
fi
echo R5_QUEUE5_DONE
