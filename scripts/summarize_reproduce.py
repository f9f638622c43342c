"""Rebuild runs/reproduce/RESULTS.md from results.jsonl.

results.jsonl accumulates one row per (cell, seed) run — including extra
seed hunts run in parallel.  The summary keeps, per cell, the
best-scoring gate-passing row (or, if none passed, the best-scoring row
overall) — the same selection rule ``reproduce_paper._find_restore``
uses to pick stage-2 restore checkpoints — and reports how many seeds
were tried.  It also evaluates the paper's ablation ORDERING gates
(reproduce_paper.ORDERING) over best-over-seeds statistics.

    python scripts/summarize_reproduce.py [workdir]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.reproduce_paper import (GATES, ORDER, SCORE, WORKDIR,  # noqa: E402
                                     ordering_rows)


def load_rows(wd):
    rows = [json.loads(l) for l in open(os.path.join(wd, "results.jsonl"))]
    by_cell = {}
    for r in rows:
        # re-evaluate against the CURRENT gate definitions (gates are
        # calibrated by probes; stored rows may predate a recalibration)
        desc, fn = GATES[r["cell"]]
        r["gate"], r["passed"] = desc, bool(fn(r))
        by_cell.setdefault(r["cell"], []).append(r)
    return by_cell


def write_results(wd=WORKDIR):
    by_cell = load_rows(wd)
    out = ["# Paper-matrix reproduction\n",
           "One TPU v5e chip (learning cells also reproduced on host "
           "CPU); 50000 episodes per cell (the reference default, "
           "alg/config.json:44); n_envs=16 vectorized instances; eval "
           "protocol exactly the reference's (greedy, N_eval=10, every "
           "100 episodes, config.json:45,63).  Seed protocol matches "
           "the reference's multi-seed launcher "
           "(train_multiprocess.py:31-43): several seeds per cell, "
           "best gate-passing seed wins, stage-2 restores the winning "
           "stage-1 seed.  Gates use best-over-training statistics — the "
           "reference's threshold-snapshot semantics "
           "(train_offpolicy.py:385-398).  Per-seed rows in "
           "results.jsonl; per-period curves in log/<cell>_<seed>/"
           "metrics.jsonl; per-episode samples in log.csv.\n",
           "| cell | seed (tried) | minutes | eval local (final) | "
           "eval global (final/best) | reach rate (final/best) | gate |"
           " passed |",
           "|---|---|---|---|---|---|---|---|"]
    for cell in ORDER:
        if cell not in by_cell:
            continue
        cand = by_cell[cell]
        passed = [r for r in cand if r.get("passed")]
        score = SCORE.get(cell, lambda r: r.get("best_eval_global")
                          if r.get("best_eval_global") is not None
                          else -99)
        r = max(passed or cand, key=score)
        out.append(
            f"| {cell} | {r['seed']} ({len(cand)}) | {r['minutes']} | "
            f"{r['final_eval_local']} | {r['final_eval_global']} / "
            f"{r['best_eval_global']} | {r.get('final_reach_rate')} / "
            f"{r.get('best_reach_rate')} | {r['gate']} | "
            f"{'PASS' if r.get('passed') else 'FAIL'} |")

    out += ["", "## Ablation ordering (the paper's Fig. 3/4 claim)", "",
            "Best-over-seeds (mean-over-seeds, #seeds) per cell; the "
            "gate passes iff each cell's best >= the next cell's — it "
            "FAILS if any ablation beats CM3 or the paper's baseline "
            "order flips.", "",
            "| task | metric | cells (best, mean, n) | gate passed |",
            "|---|---|---|---|"]
    for task, metric, vals, passed in ordering_rows(by_cell):
        chain = " > ".join(f"{c} ({b:.3g}, {m:.3g}, n={n})"
                           for c, b, m, n in vals)
        out.append(f"| {task} | {metric} | {chain} | "
                   f"{'PASS' if passed else 'FAIL'} |")

    path = os.path.join(wd, "RESULTS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({sum(len(v) for v in by_cell.values())} runs, "
          f"{len(by_cell)} cells)")


if __name__ == "__main__":
    write_results(sys.argv[1] if len(sys.argv) > 1 else WORKDIR)
