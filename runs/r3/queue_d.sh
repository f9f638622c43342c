#!/bin/bash
# Queue D: reference-parity (buggy target-mixer) checkers QMIX baseline,
# chained after queue C.
cd /root/repo
while kill -0 26546 2>/dev/null; do sleep 30; done
set -x
python scripts/reproduce_paper.py --cpu --episodes 50000 --seeds 3 \
  --cells checkers_qmix_ref
echo QUEUE_D_DONE
