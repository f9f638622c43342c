"""Synthesize a resume ``model_autosave`` from a finished seed's
``model_final`` so a reproduce-matrix cell can be budget-extended.

The vmapped sweeps keep ONE stacked rolling autosave per cell
(runner.train_multiseed), so per-seed elastic resume state is not
retained after a sweep finishes — but every seed's final TrainState is
(``saved/<dir>_<seed>/model_final``).  This tool rebuilds the
single-seed autosave schema ``{"ts": ts, "episodes": int32}``
(runner.train_function:226-233) from that final checkpoint, after which
``reproduce_paper.py`` can continue the run with ``auto_resume`` and a
larger ``--episodes`` total (the driver treats n_episodes as a TOTAL
target and resumes the episode/epsilon schedule — offpolicy.run
docstring).  The replay buffer restarts empty and warms up with
pretrain rollouts, the documented elastic-restart semantics.

    python scripts/extend_run.py --cell checkers_s2_lrA --seed 12343 \
        --episodes-done 50000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cm3_tpu.train import runner, checkpoint
from cm3_tpu.core import prng
from cm3_tpu.train.offpolicy import init_rollout
from scripts.reproduce_paper import WORKDIR, cells


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--episodes-done", type=int, required=True,
                    help="episode count the final checkpoint represents "
                    "(the finished run's --episodes)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    base = cells(50000)[args.cell]
    m = runner.cfgmod.load_json("master.json")
    m.update(base, seed=args.seed,
             dir_name=f"{base['dir_name']}_{args.seed}")
    # template TrainState with the cell's exact architecture/config
    driver, alg, hooks, train_cfg = runner.build(m)
    key = prng.root_key(args.seed)
    rs = init_rollout(hooks, prng.for_purpose(key, prng.RESET),
                      train_cfg.n_envs)
    ts0 = alg.init_state(prng.for_purpose(key, prng.PARAMS),
                         rs.obs, rs.state, rs.goals)

    save_dir = os.path.join(WORKDIR, "saved", m["dir_name"])
    final = os.path.join(save_dir, "model_final")
    if not os.path.isdir(final):
        raise SystemExit(f"no final checkpoint at {final}")
    ts = checkpoint.restore(final, ts0)
    out = os.path.join(save_dir, "model_autosave")
    checkpoint.save(out, {"ts": ts,
                          "episodes": jnp.int32(args.episodes_done)})
    print(f"wrote {out} (episodes={args.episodes_done})")


if __name__ == "__main__":
    main()
