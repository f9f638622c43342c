"""Run reproduce-matrix cells with VMAPPED multi-seed training.

Same cells/gates/results-ledger as ``scripts/reproduce_paper.py``, but
all seeds of a cell train simultaneously in ONE jitted program
(``train_multiseed`` with ``vmapped_seeds`` — the seed-axis vmap of
SURVEY.md §2.4) instead of sequentially: a 3-seed cell costs ~1.3-2x one
seed instead of 3x.  Per-seed statistics are extracted from the stacked
history and appended to ``runs/reproduce/results.jsonl`` in exactly the
per-seed row schema ``reproduce_paper.run_cell`` writes, then RESULTS.md
is regenerated.

    python scripts/ablation_vmapped.py --cells roadway_s2_retain \
        [--episodes N] [--seeds K] [--base-seed S] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cm3_tpu.train import runner  # noqa: E402
from scripts.reproduce_paper import (DEPS, GATES, SCORE, WORKDIR,  # noqa: E402
                                     _find_restore, cells)

cfgmod = runner.cfgmod


def _per_seed_stats(name, history, n_seeds, base_seed, minutes, dir_base):
    """history: list of period rows with per-seed arrays (multiseed.py
    row schema) -> one results.jsonl row per seed, mirroring
    reproduce_paper.run_cell's statistics."""
    import numpy as np

    rows = []
    for i in range(n_seeds):
        glob = [float(np.asarray(r["r_eval_global"])[i]) for r in history]
        loc = [np.asarray(r["r_eval_local"])[i] for r in history]
        min_loc = [float(np.min(x)) for x in loc]
        reach = [float(np.asarray(r["eval_reach_rate"])[i])
                 for r in history if "eval_reach_rate" in r]
        t10 = lambda xs: (round(float(np.mean(xs[-10:])), 3) if xs
                          else None)
        seed = base_seed + i
        rows.append(dict(
            cell=name, minutes=minutes,
            episodes=int(np.asarray(history[-1]["episode"])[i])
            if history else 0,
            final_eval_global=round(glob[-1], 3) if glob else None,
            best_eval_global=round(max(glob), 3) if glob else None,
            final_eval_local=[round(float(v), 3) for v in loc[-1]]
            if loc else None,
            best_min_eval_local=round(max(min_loc), 3) if min_loc
            else None,
            final10_min_eval_local=t10(min_loc),
            best_reach_rate=round(max(reach), 3) if reach else None,
            final_reach_rate=round(reach[-1], 3) if reach else None,
            final10_reach_rate=t10(reach),
            seed=seed, dir_name=f"{dir_base}_{seed}", vmapped=True))
    return rows


def run_cell_vmapped(name, overrides, n_episodes, n_seeds, base_seed):
    m = cfgmod.load_json("master.json")
    m.update(overrides)
    m.update(vmapped_seeds=True, n_seeds=n_seeds, seed=base_seed,
             # saved/log dirs named <dir>_<seed>, the sequential
             # convention (reproduce_paper main loop)
             dir_idx_start=base_seed)
    # exclusive per-cell lock: two queue scripts accidentally running
    # the same cell concurrently interleave the per-seed log streams
    # and race on the shared vmapped autosave (observed round 4)
    lock_dir = os.path.join(WORKDIR, "saved", f"{overrides['dir_name']}"
                            f"_vmapped")
    os.makedirs(lock_dir, exist_ok=True)
    lock = os.path.join(lock_dir, ".cell_lock")
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
    except FileExistsError:
        raise SystemExit(
            f"[{name}] LOCKED: another run holds {lock} (pid "
            f"{open(lock).read()}); refusing a concurrent duplicate")
    try:
        t0 = time.time()
        ts, history = runner.train_multiseed(m, workdir=WORKDIR,
                                             n_episodes=n_episodes)
        minutes = round((time.time() - t0) / 60, 2)
    finally:
        os.unlink(lock)
    return _per_seed_stats(name, history, n_seeds, base_seed, minutes,
                           overrides["dir_name"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=50000)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--base-seed", type=int, default=12341)
    ap.add_argument("--cells", required=True)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(WORKDIR, exist_ok=True)
    todo = cells(args.episodes)
    for name in args.cells.split(","):
        base = dict(todo[name])
        dep = DEPS.get(name)
        if dep is not None:
            restore = _find_restore(dep, todo[dep]["dir_name"])
            if restore is None:
                print(f"[{name}] SKIP: no {dep} checkpoint found",
                      flush=True)
                continue
            base["dir_restore"] = restore
        print(f"[{name}] {args.seeds} seeds vmapped ...", flush=True)
        rows = run_cell_vmapped(name, base, args.episodes, args.seeds,
                                args.base_seed)
        desc, fn = GATES[name]
        with open(os.path.join(WORKDIR, "results.jsonl"), "a") as f:
            for r in rows:
                r.update(gate=desc, passed=bool(fn(r)))
                f.write(json.dumps(r) + "\n")
                print(json.dumps(r), flush=True)
        from scripts.summarize_reproduce import write_results
        write_results(WORKDIR)


if __name__ == "__main__":
    main()
