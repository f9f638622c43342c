"""roadway_s2_stable: 3 seeds vmapped in ONE program (stage-1 graft +
dual buffer + grad_clip=10), 30k episodes; appends reproduce-format
rows.  Budget note: the reference-exact cell's collapse begins by ~2k
episodes, so 30k amply tests sustained stability."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from cm3_tpu.train import runner

WORKDIR = "runs/reproduce"
m = runner.cfgmod.load_json("master.json")
m.update(experiment="roadway", stage=2, n_envs=16, seed=12341, n_seeds=3,
         vmapped_seeds=True, dir_name="rd_s2c", dir_idx_start=12341,
         dir_restore="rd_s1_12341", train_from_nothing=0, dual_buffer=1,
         grad_clip=10.0, N_train=30000, period=100, N_eval=10)
t0 = time.time()
ts, history = runner.train_multiseed(m, workdir=WORKDIR)
minutes = (time.time() - t0) / 60

S = 3
glob = np.stack([r["r_eval_global"] for r in history])
loc = np.stack([r["r_eval_local"] for r in history])
min_loc = loc.min(axis=2)
with open(os.path.join(WORKDIR, "results.jsonl"), "a") as f:
    for i in range(S):
        r = dict(cell="roadway_s2_stable", minutes=round(minutes / S, 2),
                 episodes=int(history[-1]["episode"][i]),
                 final_eval_global=round(float(glob[-1, i]), 3),
                 best_eval_global=round(float(glob[:, i].max()), 3),
                 final_eval_local=[round(float(v), 3) for v in loc[-1, i]],
                 best_min_eval_local=round(float(min_loc[:, i].max()), 3),
                 best_reach_rate=None, final_reach_rate=None,
                 seed=12341 + i, dir_name=f"rd_s2c_{12341 + i}",
                 gate="best min-over-agents eval > 9.5 (same gate, "
                      "grad_clip=10 stabilized regime)",
                 passed=bool(min_loc[:, i].max() > 9.5),
                 vmapped=True, budget=30000)
        f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
print("DONE", flush=True)
