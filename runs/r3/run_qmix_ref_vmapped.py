"""Run the checkers_qmix_ref cell's 3 seeds as ONE vmapped program
(the framework's multiseed path) and append reproduce-format rows to
runs/reproduce/results.jsonl."""
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
m.update(experiment="checkers", stage=2, n_envs=16, alg_name="qmix",
         qmix_ref_bug=1, dir_name="ck_qmixb", train_from_nothing=1,
         N_train=50000, period=100, N_eval=10, seed=12341, n_seeds=3,
         vmapped_seeds=True, dir_idx_start=12341)
t0 = time.time()
ts, history = runner.train_multiseed(m, workdir=WORKDIR)
minutes = (time.time() - t0) / 60

S = 3
glob = np.stack([r["r_eval_global"] for r in history])       # [P, S]
loc = np.stack([r["r_eval_local"] for r in history])         # [P, S, N]
min_loc = loc.min(axis=2)                                    # [P, S]
rows = []
for i in range(S):
    rows.append(dict(
        cell="checkers_qmix_ref", minutes=round(minutes / S, 2),
        episodes=int(history[-1]["episode"][i]),
        final_eval_global=round(float(glob[-1, i]), 3),
        best_eval_global=round(float(glob[:, i].max()), 3),
        final_eval_local=[round(float(v), 3) for v in loc[-1, i]],
        best_min_eval_local=round(float(min_loc[:, i].max()), 3),
        best_reach_rate=None, final_reach_rate=None,
        seed=12341 + i, dir_name=f"ck_qmixb_{12341 + i}",
        gate="best_eval_global > 2.0 (directional; the reference's "
             "exact buggy target-mixer QMIX)",
        passed=bool(glob[:, i].max() > 2.0),
        vmapped=True))
with open(os.path.join(WORKDIR, "results.jsonl"), "a") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
        print(json.dumps(r), flush=True)
print("DONE", flush=True)
