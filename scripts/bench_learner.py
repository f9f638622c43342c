"""Single-seed training-path latency study (VERDICT item: attack the
201k env-steps/s single-seed figure).

Measures the fused off-policy chunk (env scan + replay + CM3 updates +
soft target updates) on stage-2 two-agent Checkers across:
  * n_envs (wider chunks amortize the update cost),
  * updates_per_chunk (8 = the round-1 bench ratio; 0/auto = the
    reference's one-update-per-10-single-env-steps ratio),
  * chunks_per_sync (K>1 scans K chunks per dispatch, removing the
    per-chunk host sync),
plus an env-scan-only and updates-only breakdown at the base config.

    python scripts/bench_learner.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import AlgConfig, CheckersEnvConfig, TrainConfig
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.replay import buffer as replay
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout


def setup(n_envs, updates_per_chunk):
    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2))
    cfg = TrainConfig(n_envs=n_envs, batch_size=128, buffer_size=20000,
                      steps_per_train=10, updates_per_chunk=updates_per_chunk,
                      episode_log=0)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)
    rs = init_rollout(hooks, jax.random.PRNGKey(0), n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    dummy = jax.vmap(env.step)(rs.env_state,
                               jnp.zeros((n_envs, 2), jnp.int32))[1]
    tr = driver._transition(rs, jnp.zeros((n_envs, 2), jnp.int32), dummy,
                            None)
    buf = replay.init(jax.tree_util.tree_map(lambda x: x[0], tr),
                      cfg.buffer_size)
    return driver, cfg, ts, buf, rs


def timed(fn, sync, reps):
    out = fn(0)
    sync(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(i + 1)
    sync(out)
    return (time.time() - t0) / reps


def bench_chunk(n_envs, updates_per_chunk, chunks_per_sync=1, reps=20):
    driver, cfg, ts, buf, rs = setup(n_envs, updates_per_chunk)
    state = {"ts": ts, "buf": buf, "rs": rs}

    if chunks_per_sync > 1:
        def fn(i):
            state["ts"], state["buf"], state["rs"], _ = \
                driver._chunk_train_k(state["ts"], state["buf"],
                                      state["rs"],
                                      jax.random.PRNGKey(i),
                                      chunks_per_sync)
            return state["rs"].episodes
    else:
        def fn(i):
            state["ts"], state["buf"], state["rs"], _ = \
                driver._chunk_train(state["ts"], state["buf"], state["rs"],
                                    0.2, jax.random.PRNGKey(i))
            return state["rs"].episodes

    dt = timed(fn, jax.block_until_ready, reps)
    steps = n_envs * cfg.steps_per_train * chunks_per_sync
    return steps / dt


def bench_parts(n_envs, reps=20):
    """env-scan-only vs update-only breakdown."""
    driver, cfg, ts, buf, rs = setup(n_envs, 8)
    state = {"buf": buf, "rs": rs}

    roll = jax.jit(lambda ts, buf, rs, key:
                   driver._chunk(ts, buf, rs, 0.2, key, False, False),
                   donate_argnums=(1,))

    def fn(i):
        _, state["buf"], state["rs"], _ = roll(ts, state["buf"],
                                               state["rs"],
                                               jax.random.PRNGKey(i))
        return state["rs"].episodes
    dt_env = timed(fn, jax.block_until_ready, reps)

    st = {"ts": ts}
    upd_jit = jax.jit(lambda ts, buf, k: driver.alg.update(
        ts, replay.sample(buf, k, cfg.batch_size), 0.2, k))

    def upd(i):
        st["ts"], m = upd_jit(st["ts"], state["buf"], jax.random.PRNGKey(i))
        return m["policy_loss"]
    dt_upd = timed(upd, jax.block_until_ready, reps)
    return dt_env, dt_upd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    reps = 5 if args.quick else 20

    out = {}
    dt_env, dt_upd = bench_parts(256, reps=reps)
    out["chunk_env_scan_ms"] = round(dt_env * 1e3, 2)
    out["single_update_ms"] = round(dt_upd * 1e3, 2)

    for n_envs in (256, 1024, 4096):
        for upc in (8,):
            v = bench_chunk(n_envs, upc, reps=reps)
            out[f"train_steps_per_s_e{n_envs}_u{upc}"] = round(v)
    # reference update ratio (updates_per_chunk = n_envs) at base width
    out["train_steps_per_s_e256_uref"] = round(bench_chunk(256, 0,
                                                           reps=reps))
    # K chunks per host sync
    for k in (8,):
        v = bench_chunk(1024, 8, chunks_per_sync=k,
                        reps=max(reps // 2, 3))
        out[f"train_steps_per_s_e1024_u8_k{k}"] = round(v)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
