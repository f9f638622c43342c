"""Full reference training budget on TPU: checkers stage-1 -> stage-2."""
import json, os, time
from cm3_tpu.train import runner
cfgmod = runner.cfgmod

os.makedirs("runs/full_budget", exist_ok=True)
m = cfgmod.load_json("master.json")
m.update(experiment="checkers", stage=1, dir_name="fb_s1", n_envs=256,
         N_train=50000, period=1000, N_eval=32, seed=12341)
t0 = time.time()
ts, stats = runner.train_function(m, workdir="runs/full_budget", verbose=False)
t1 = time.time()
h = stats["history"]
r1 = [float(row["r_eval_global"]) for row in h]
print(json.dumps({"stage1_minutes": round((t1-t0)/60, 2),
                  "stage1_final_eval": r1[-1], "stage1_best": max(r1)}))

m.update(stage=2, dir_name="fb_s2", dir_restore="fb_s1",
         train_from_nothing=0, N_train=50000)
t2 = time.time()
ts, stats = runner.train_function(m, workdir="runs/full_budget", verbose=False)
t3 = time.time()
h = stats["history"]
r2 = [float(row["r_eval_global"]) for row in h]
print(json.dumps({"stage2_minutes": round((t3-t2)/60, 2),
                  "stage2_final_eval": r2[-1], "stage2_best": max(r2),
                  "stage2_curve": [round(v, 2) for v in r2]}))
