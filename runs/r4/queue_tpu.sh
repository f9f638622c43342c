#!/bin/bash
# Round-4 TPU training queue: checkers-ordering ablation (one variable
# at a time, 3 seeds each) + stage-2 retention cells.  Sequential; each
# entry appends per-seed rows to runs/reproduce/results.jsonl.
cd /root/repo
set -x
python scripts/ablation_vmapped.py --cells checkers_s2_lrA   --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_qmix_tn  --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells roadway_s2_retain --episodes 30000 --seeds 3
python scripts/ablation_vmapped.py --cells particle_s2_retain --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_s2_tn    --episodes 50000 --seeds 3
python scripts/ablation_vmapped.py --cells checkers_qmix_tf1 --episodes 50000 --seeds 3
python scripts/reproduce_paper.py  --cells checkers_qmix_e1  --episodes 50000 --seeds 3
python scripts/reproduce_paper.py  --cells checkers_s2_e1    --episodes 50000 --seeds 3
echo QUEUE_R4_DONE
