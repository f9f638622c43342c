"""Reproduce the reference's experiment matrix end-to-end on one chip.

Runs, with the reference's training budgets and schedule semantics
(50k episodes, eps 0.5->0.05, periodic greedy eval — ``alg/config.json``
+ stage configs), the full two-stage CM3 curriculum on every
environment:

  * Checkers   stage 1 (1 agent)  -> stage 2 (2 agents, Q_credit graft)
  * Particle   stage 1 (1 agent)  -> stage 2 antipodal (on-policy regime)
  * Roadway    stage 1 (1 car)    -> stage 2 (2 cars)

and writes runs/reproduce/RESULTS.md with wall-clock + learning-gate
outcomes (gates per BASELINE.md: checkers summed eval > 9.0, roadway
per-agent eval > 9.5 / both > save_threshold at stage 2, particle
reach-rate).  The reference needs ~days of single-process CPU per cell;
each cell here is minutes on one TPU chip.

    python scripts/reproduce_paper.py [--episodes N] [--cells a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cm3_tpu.train import runner  # noqa: E402

cfgmod = runner.cfgmod

WORKDIR = "runs/reproduce"


def run_cell(name: str, overrides: dict, n_episodes=None):
    m = cfgmod.load_json("master.json")
    m.update(overrides)
    t0 = time.time()
    ts, stats = runner.train_function(m, workdir=WORKDIR,
                                      n_episodes=n_episodes, verbose=False)
    minutes = (time.time() - t0) / 60
    hist = stats["history"]
    glob = [float(r["r_eval_global"]) for r in hist]
    last_loc = hist[-1]["r_eval_local"] if hist else None
    # per-period min over agents, best over periods — the reference's
    # np.all(r_local_eval > save_threshold) snapshot condition
    # (train_offpolicy.py:391) as a best-over-training statistic
    min_loc = [float(min(r["r_eval_local"])) for r in hist]
    reach = [float(r["eval_reach_rate"]) for r in hist
             if "eval_reach_rate" in r]
    return dict(cell=name, minutes=round(minutes, 2),
                episodes=stats["episodes"],
                final_eval_global=round(glob[-1], 3) if glob else None,
                best_eval_global=round(max(glob), 3) if glob else None,
                final_eval_local=[round(float(v), 3) for v in last_loc]
                if last_loc is not None else None,
                best_min_eval_local=round(max(min_loc), 3) if min_loc
                else None,
                best_reach_rate=round(max(reach), 3) if reach else None,
                final_reach_rate=round(reach[-1], 3) if reach else None)


def cells(episodes):
    e = episodes
    return {
        "checkers_s1": dict(experiment="checkers", stage=1, n_envs=16,
                            dir_name="ck_s1", N_train=e, period=max(e // 50, 1),
                            N_eval=32, seed=12341),
        "checkers_s2": dict(experiment="checkers", stage=2, n_envs=16,
                            dir_name="ck_s2", dir_restore="ck_s1",
                            train_from_nothing=0, N_train=e,
                            period=max(e // 50, 1), N_eval=32, seed=12341),
        "particle_s1": dict(experiment="particle", particle_config="stage1",
                            stage=1, n_envs=16, dir_name="pt_s1", N_train=e,
                            period=max(e // 50, 1), N_eval=32, seed=12341),
        "particle_s2": dict(experiment="particle",
                            particle_config="stage2_antipodal", stage=2,
                            n_envs=16, dir_name="pt_s2", dir_restore="pt_s1",
                            train_from_nothing=0, N_train=e,
                            period=max(e // 50, 1), N_eval=32, seed=12341),
        "roadway_s1": dict(experiment="roadway", stage=1, n_envs=16,
                           dir_name="rd_s1", N_train=e,
                           period=max(e // 50, 1), N_eval=32, seed=12341),
        # stage 2 with the dual (bad/good) buffer on — the reference's
        # SUMO training option (train_offpolicy.py:370-374)
        "roadway_s2": dict(experiment="roadway", stage=2, n_envs=16,
                           dir_name="rd_s2", dir_restore="rd_s1",
                           train_from_nothing=0, N_train=e, dual_buffer=1,
                           period=max(e // 50, 1), N_eval=32, seed=12341),
        # ablation baselines, trained direct on the 2-agent task
        # (the paper's CM3-vs-baseline comparison)
        "checkers_qmix": dict(experiment="checkers", stage=2, n_envs=16,
                              alg_name="qmix", dir_name="ck_qmix",
                              train_from_nothing=1, N_train=e,
                              period=max(e // 50, 1), N_eval=32, seed=12341),
        "checkers_coma": dict(experiment="checkers", stage=2, n_envs=16,
                              alg_name="coma", dir_name="ck_coma",
                              train_from_nothing=1, N_train=e,
                              period=max(e // 50, 1), N_eval=32, seed=12341),
        "checkers_iac": dict(experiment="checkers", stage=2, n_envs=16,
                             alg_name="iac", dir_name="ck_iac",
                             train_from_nothing=1, N_train=e,
                             period=max(e // 50, 1), N_eval=32, seed=12341),
    }


# Gates use BEST-over-training statistics, matching the reference's
# threshold-snapshot semantics: a "good model" checkpoint is saved the
# first period the eval threshold is exceeded (train_offpolicy.py:385-398),
# not at the final episode.
GATES = {
    "checkers_s1": ("best sum eval > 9.0 (train_offpolicy.py:397)",
                    lambda r: (r["best_eval_global"] or -99) > 9.0),
    "checkers_s2": ("best sum eval > 9.0 two-agent (same gate)",
                    lambda r: (r["best_eval_global"] or -99) > 9.0),
    "particle_s1": ("best goal-reach rate >= 0.9 (dist<=0.05, "
                    "multi-goal_spread.py:126)",
                    lambda r: (r["best_reach_rate"] or 0) >= 0.9),
    "particle_s2": ("best goal-reach rate >= 0.75 (antipodal swap)",
                    lambda r: (r["best_reach_rate"] or 0) >= 0.75),
    "roadway_s1": ("best eval > 9.5 (save_threshold, "
                   "config_sumo_stage1.json:14)",
                   lambda r: (r["best_eval_global"] or -99) > 9.5),
    "roadway_s2": ("best min-over-agents eval > 9.5 (np.all threshold "
                   "form, train_offpolicy.py:391)",
                   lambda r: (r["best_min_eval_local"] or -99) > 9.5),
    # directional gates: the paper's point is that the baselines learn
    # SLOWER/worse than CM3 on the 2-agent task — require clear movement
    # above the random policy (~0), not the CM3 gate
    "checkers_qmix": ("best_eval_global > 2.0 (directional, paper Fig. 3)",
                      lambda r: (r["best_eval_global"] or -99) > 2.0),
    "checkers_coma": ("best_eval_global > 2.0 (directional, paper Fig. 3)",
                      lambda r: (r["best_eval_global"] or -99) > 2.0),
    "checkers_iac": ("best_eval_global > 2.0 (directional, paper Fig. 3)",
                     lambda r: (r["best_eval_global"] or -99) > 2.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=50000)
    ap.add_argument("--cells", default=None,
                    help="comma-separated subset of cells")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (the tiny-model learning cells "
                    "are dispatch-latency-bound; CPU avoids tunnel RTT)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(WORKDIR, exist_ok=True)
    todo = cells(args.episodes)
    if args.cells:
        want = args.cells.split(",")
        todo = {k: v for k, v in todo.items() if k in want}

    rows = []
    for name, overrides in todo.items():
        print(f"[{name}] ...", flush=True)
        r = run_cell(name, overrides, n_episodes=args.episodes)
        desc, fn = GATES[name]
        r["gate"] = desc
        r["passed"] = bool(fn(r))
        rows.append(r)
        print(json.dumps(r), flush=True)
        with open(os.path.join(WORKDIR, "results.jsonl"), "a") as f:
            f.write(json.dumps(r) + "\n")
        _write_md(rows, args.episodes)
    print(f"wrote {WORKDIR}/RESULTS.md")


def _write_md(rows, episodes):
    import jax
    plat = jax.devices()[0].platform
    with open(os.path.join(WORKDIR, "RESULTS.md"), "w") as f:
        f.write("# Paper-matrix reproduction\n\n"
                f"Budget: {episodes} episodes per cell "
                "(the reference default, alg/config.json:44); backend: "
                f"{plat}; n_envs=16 vectorized instances; seed 12341.  "
                "Learning gates follow the reference's threshold-snapshot "
                "semantics (best over training, "
                "train_offpolicy.py:385-398).\n\n"
                "| cell | minutes | episodes | eval local (final) | "
                "eval global (final/best) | reach rate (final/best) | "
                "gate | passed |\n"
                "|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['cell']} | {r['minutes']} | {r['episodes']} | "
                    f"{r['final_eval_local']} | {r['final_eval_global']} / "
                    f"{r['best_eval_global']} | "
                    f"{r.get('final_reach_rate')} / "
                    f"{r.get('best_reach_rate')} | {r['gate']} | "
                    f"{'PASS' if r['passed'] else 'FAIL'} |\n")


if __name__ == "__main__":
    main()
