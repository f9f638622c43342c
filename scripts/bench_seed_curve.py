"""Seed-throughput curve + HBM ceiling for vmapped multi-seed training.

Round-4 verdict item 6: PERF.md notes 32 vmapped seeds exceed one
chip's HBM with 20k-cap replay buffers, but the curve between 8 and 32
seeds — and the buffer-size trade — was never measured.  This script
sweeps (n_seeds, buffer_size) over the full-training-path chunk
(bench.py's headline program: 256 envs/seed, replay, 8 fused stage-2
CM3 updates per 10-step chunk, f32 matmuls) and reports, per point:

  * aggregate env-steps/s (median [min-max] of 5 timed blocks);
  * per-seed env-steps/s (the marginal efficiency of adding seeds);
  * device HBM in use after state allocation (memory_stats, when the
    backend exposes it);
  * OOM points recorded as {"oom": true} instead of crashing the sweep.

Each (seeds, buffer) point runs in its OWN subprocess: an OOM kills the
child, not the sweep, and one point's compiled programs/arenas cannot
skew the next (the isolation pattern bench.py --full uses).

    python scripts/bench_seed_curve.py            # the PERF.md table
    python scripts/bench_seed_curve.py --one 16 20000   # single point
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# the sweep re-invokes THIS FILE with --one per point; running a file
# inside scripts/ puts scripts/ (not the repo root) at sys.path[0], so
# the child could not import cm3_tpu without this bootstrap
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_point_buffer(n_seeds: int, buffer_size: int, n_envs: int = 256,
                     reps: int = 10, blocks: int = 5):
    """bench.bench_train_multiseed's program with a configurable seed
    count and replay capacity, plus HBM accounting."""
    import time

    import jax
    import jax.numpy as jnp

    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig,
                                     TrainConfig)
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.replay import buffer as replay
    from cm3_tpu.train.experiments import make_hooks
    from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout

    s = n_seeds
    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2))
    cfg = TrainConfig(n_envs=n_envs, batch_size=128,
                      buffer_size=buffer_size, steps_per_train=10,
                      updates_per_chunk=8)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)

    keys = jax.random.split(jax.random.PRNGKey(0), s)
    rs = jax.vmap(lambda k: init_rollout(hooks, k, n_envs))(keys)
    ts = jax.vmap(alg.init_state)(
        jax.random.split(jax.random.PRNGKey(1), s), rs.obs, rs.state,
        rs.goals)
    rs0 = jax.tree_util.tree_map(lambda x: x[0], rs)
    dummy = jax.vmap(env.step)(rs0.env_state,
                               jnp.zeros((n_envs, 2), jnp.int32))[1]
    tr = driver._transition(rs0, jnp.zeros((n_envs, 2), jnp.int32), dummy,
                            None)
    buf1 = replay.init(jax.tree_util.tree_map(lambda x: x[0], tr),
                       cfg.buffer_size)
    buf = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (s,) + x.shape).copy(), buf1)

    chunk = jax.jit(jax.vmap(
        lambda t, b, r, k: driver._chunk(t, b, r, 0.2, k, True, False)),
        donate_argnums=(1,))
    with jax.default_matmul_precision("float32"):
        for i in range(3):
            ts, buf, rs, _ = chunk(
                ts, buf, rs, jax.random.split(jax.random.PRNGKey(2 + i), s))
        jax.block_until_ready(rs.episodes)
        hbm = None
        try:
            st = jax.local_devices()[0].memory_stats()
            if st:
                hbm = {"hbm_in_use_gb":
                       round(st.get("bytes_in_use", 0) / 2**30, 2),
                       "hbm_limit_gb":
                       round(st.get("bytes_limit", 0) / 2**30, 2)}
        except Exception:
            pass
        rates = []
        for b in range(blocks):
            t0 = time.time()
            for i in range(reps):
                ts, buf, rs, _ = chunk(
                    ts, buf, rs,
                    jax.random.split(
                        jax.random.PRNGKey(1000 * (b + 1) + i), s))
            jax.block_until_ready(rs.episodes)
            rates.append(s * n_envs * cfg.steps_per_train * reps
                         / (time.time() - t0))
    rates.sort()
    med, lo, hi = rates[len(rates) // 2], rates[0], rates[-1]
    out = {"n_seeds": s, "buffer_size": buffer_size, "n_envs": n_envs,
           "agg_steps_per_s": round(med),
           "spread": [round(lo), round(hi)],
           "per_seed_steps_per_s": round(med / s)}
    if hbm:
        out.update(hbm)
    return out


SWEEP = [(8, 20000), (16, 20000), (24, 20000), (32, 20000),
         (32, 10000), (48, 10000), (32, 5000), (64, 5000)]


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        n_seeds, buffer_size = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        print(json.dumps(run_point_buffer(n_seeds, buffer_size)))
        return

    results = []
    for n_seeds, buffer_size in SWEEP:
        out = subprocess.run(
            [sys.executable, __file__, "--one", str(n_seeds),
             str(buffer_size)],
            capture_output=True, text=True, timeout=1800)
        try:
            row = json.loads(out.stdout.strip().splitlines()[-1])
        except (IndexError, ValueError):
            # search BOTH streams in full: the OOM detail arrives as a
            # remote-compile error on stdout/stderr well before the
            # final traceback line (observed: "Ran out of memory in
            # memory space hbm. Used 19.71G of 15.75G" at 24x20k)
            full = (out.stdout or "") + (out.stderr or "")
            oom = ("RESOURCE_EXHAUSTED" in full or "Out of memory" in full
                   or "Ran out of memory" in full)
            detail = next((ln.strip() for ln in full.splitlines()
                           if "Ran out of memory" in ln
                           or "RESOURCE_EXHAUSTED" in ln), None)
            err = full[-400:]
            row = {"n_seeds": n_seeds, "buffer_size": buffer_size,
                   "oom": oom,
                   "error": detail or (err.strip().splitlines()[-1]
                                       if err.strip() else "no output")}
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"seed_curve": results}))


if __name__ == "__main__":
    main()
