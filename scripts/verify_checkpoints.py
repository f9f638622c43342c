"""Verify that every committed reproduce-matrix checkpoint restores and
still evaluates at its recorded level.

Round-4 verdict weak item 5: the end-of-round snapshot raced the
training queue, so nothing proved the committed winning-seed
checkpoints were the real artifacts.  This script turns the checkpoint
evidence into verifiable artifacts:

  * for every (cell, seed) row in ``runs/reproduce/results.jsonl`` whose
    ``saved/<dir_name>/model_final`` exists: rebuild the cell's exact
    model template (same config path as the runner), restore the
    checkpoint, and run a WIDE greedy eval (``--n-eval`` episodes,
    default 100 — 10x the training protocol's N_eval, so the statistic
    is de-noised);
  * same for the latest ``model_good_*`` threshold snapshot, when one
    exists (reference train_offpolicy.py:391-398 semantics: those were
    saved on 10-episode upper-tail draws, so their de-noised mean sits
    at the policy's plateau, BELOW the crossing draw — the assertion
    margin accounts for that, see PERF.md round-4 retention
    calibration);
  * writes ``runs/reproduce/checkpoint_verify.json`` with every restored
    eval next to the recorded one.

Assertions (--check, also used by tests/test_checkpoint_verify.py):
  1. every checkpoint restores into the rebuilt template (structural
     integrity — catches the snapshot/queue race);
  2. every restored eval is finite;
  3. model_final evals match the RECORDED final eval within an
     eval-noise tolerance (the recorded number is one 10-episode draw;
     a corrupt or swapped checkpoint lands at random-policy level,
     far outside the band);
  4. model_good snapshots still clear (threshold - margin) on the wide
     eval.

    python scripts/verify_checkpoints.py [--check] [--n-eval 100]
                                         [--cpu] [--cells a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

WORKDIR = "runs/reproduce"

# |restored - recorded| tolerance for the model_final cross-check, per
# experiment reward scale.  The recorded final eval is ONE 10-episode
# greedy draw (reference protocol, config.json:45); the restored value
# is a 100-episode mean with a different key.  Bands are set wide
# enough for that noise (checkers n=1 draws a random goal color per
# eval episode; roadway draws prob_random=0.2 goals) yet far tighter
# than the distance to random-policy level (checkers random ~0-2 vs
# trained 21; particle random ~-328 global vs trained ~-100).
FINAL_TOL = {"checkers": 8.0, "roadway": 12.0, "particle": 80.0}
# model_good gate margin: crossings were upper-tail draws of a noisy
# statistic; a true gate-level policy's de-noised mean sits ~1.0-1.5
# below the crossing (PERF.md round-4 calibration: frozen near-optimal
# roadway policy -> last-10-period mean 8.2-8.5 vs 9.5+ draws)
GOOD_MARGIN = 2.0


def _latest_good(save_dir):
    goods = [d for d in os.listdir(save_dir) if d.startswith("model_good_")]
    if not goods:
        return None
    return max(goods, key=lambda d: int(d.rsplit("_", 1)[1]))


def _build_and_restore(master, ckpt_dir):
    """Rebuild the cell's template exactly like the runner and restore
    ``ckpt_dir`` into it; returns (driver, ts)."""
    import jax

    from cm3_tpu.core import prng
    from cm3_tpu.train import checkpoint, runner
    from cm3_tpu.train.offpolicy import init_rollout

    driver, alg, hooks, train_cfg = runner.build(master)
    key = prng.root_key(master.get("seed", 12341))
    rs = init_rollout(hooks, prng.for_purpose(key, prng.RESET),
                      train_cfg.n_envs)
    template = alg.init_state(prng.for_purpose(key, prng.PARAMS),
                              rs.obs, rs.state, rs.goals)
    try:
        ts = checkpoint.restore(ckpt_dir, template)
    except ValueError:
        # optimizer-layout drift tolerance, like runner._restore_flexible
        import dataclasses as dc
        alt = dict(master)
        alt["grad_clip"] = 0.0 if master.get("grad_clip") else 10.0
        driver2, alg2, hooks2, tc2 = runner.build(alt)
        rs2 = init_rollout(hooks2, prng.for_purpose(key, prng.RESET),
                           tc2.n_envs)
        t2 = alg2.init_state(prng.for_purpose(key, prng.PARAMS),
                             rs2.obs, rs2.state, rs2.goals)
        restored = checkpoint.restore(ckpt_dir, t2)
        ts = checkpoint.merge_non_opt(template, restored)
    return driver, ts


def verify_rows(rows, n_eval=100, cells_filter=None, verbose=True):
    """-> list of per-checkpoint report dicts."""
    import jax

    from cm3_tpu.train import runner
    from scripts.reproduce_paper import cells

    todo = cells(50000)
    saved_root = os.path.join(WORKDIR, "saved")
    # latest row per (cell, seed) wins (results.jsonl is append-only)
    latest = {}
    for r in rows:
        if r.get("cell") in todo and r.get("dir_name"):
            latest[(r["cell"], r.get("seed"))] = r
    reports = []
    for (cell, seed), r in sorted(latest.items()):
        if cells_filter and cell not in cells_filter:
            continue
        save_dir = os.path.join(saved_root, r["dir_name"])
        if not os.path.isdir(os.path.join(save_dir, "model_final")):
            continue
        master = runner.cfgmod.load_json("master.json")
        master.update(todo[cell])
        master.update(seed=seed, dir_name=r["dir_name"])
        exp = master.get("experiment", "checkers")
        variants = [("model_final", r.get("final_eval_global"))]
        good = _latest_good(save_dir)
        if good:
            variants.append((good, None))
        for model_name, recorded in variants:
            ckpt = os.path.join(save_dir, model_name)
            rep = dict(cell=cell, seed=seed, dir_name=r["dir_name"],
                       model=model_name, recorded_final=recorded)
            try:
                driver, ts = _build_and_restore(master, ckpt)
                with jax.default_matmul_precision("float32"):
                    r_loc, r_glob, aux = driver._eval(
                        ts, jax.random.PRNGKey(4242), n_eval)
                rep.update(
                    restored=True,
                    eval_local=[round(float(v), 3) for v in np.asarray(r_loc)],
                    eval_global=round(float(r_glob), 3),
                    min_eval_local=round(float(np.min(np.asarray(r_loc))), 3),
                    reach_rate=(round(float(aux["eval_reach_rate"]), 3)
                                if "eval_reach_rate" in aux else None),
                    finite=bool(np.isfinite(float(r_glob))))
            except Exception as e:  # noqa: BLE001 — report, judge in --check
                rep.update(restored=False, error=f"{type(e).__name__}: {e}")
            reports.append(rep)
            if verbose:
                print(json.dumps(rep), flush=True)
    return reports


def check(reports):
    """Assertions 1-4 (docstring).  Returns list of failure strings."""
    fails = []
    for rep in reports:
        tag = f"{rep['cell']}/{rep['dir_name']}/{rep['model']}"
        if not rep.get("restored"):
            fails.append(f"{tag}: restore FAILED ({rep.get('error')})")
            continue
        if not rep.get("finite"):
            fails.append(f"{tag}: non-finite eval")
            continue
        exp = ("roadway" if rep["cell"].startswith("roadway") else
               "particle" if rep["cell"].startswith("particle") else
               "checkers")
        if rep["model"] == "model_final" and rep.get("recorded_final") \
                is not None:
            tol = FINAL_TOL[exp]
            diff = abs(rep["eval_global"] - rep["recorded_final"])
            if diff > tol:
                fails.append(f"{tag}: restored final eval "
                             f"{rep['eval_global']} vs recorded "
                             f"{rep['recorded_final']} (|diff| {diff:.1f} "
                             f"> tol {tol})")
        if rep["model"].startswith("model_good_"):
            # threshold snapshots: checkers s1 gate sum > 9.0; roadway
            # save_threshold per stage (9.5 / 18-as-per-agent)
            if exp == "checkers":
                stat, thr = sum(rep["eval_local"]), 9.0
            else:  # roadway: save_threshold applied per-agent (min);
                # stage 1 has one agent so min == global
                stat, thr = rep["min_eval_local"], 9.5
            if stat < thr - GOOD_MARGIN:
                fails.append(f"{tag}: good-snapshot stat {stat:.2f} < "
                             f"{thr} - {GOOD_MARGIN}")
    return fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-eval", type=int, default=100)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--cells", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    path = os.path.join(WORKDIR, "results.jsonl")
    rows = [json.loads(l) for l in open(path)]
    reports = verify_rows(rows, n_eval=args.n_eval,
                          cells_filter=(set(args.cells.split(","))
                                        if args.cells else None))
    out = os.path.join(WORKDIR, "checkpoint_verify.json")
    with open(out, "w") as f:
        json.dump({"n_eval": args.n_eval, "reports": reports}, f, indent=1)
    print(f"wrote {out} ({len(reports)} checkpoints)")
    if args.check:
        fails = check(reports)
        for fmsg in fails:
            print("FAIL:", fmsg)
        if fails:
            raise SystemExit(1)
        print(f"OK: all {len(reports)} checkpoints restore and evaluate "
              f"at recorded level")


if __name__ == "__main__":
    main()
