"""Multi-host pod-slice benchmark harness.

Run on every host of a TPU pod slice (the arguments are auto-detected on
Cloud TPU; elsewhere pass --coordinator/--num-processes/--process-id):

    python scripts/bench_pod.py                # all three benchmarks
    python scripts/bench_pod.py --bench fused  # one

Measures, over the global ``data`` mesh spanning all hosts:

  * ``fused``  — the Pallas fused Checkers rollout, sharded over
    devices with ``shard_map`` (zero cross-device traffic: embarrassing
    data parallelism, the scaling-efficiency ceiling);
  * ``grid``   — the XLA grid-engine rollout the training path uses,
    env instances sharded over the mesh;
  * ``train``  — the full CM3 training chunk: env shards + replay
    shards per device, learner gradients psum over ICI.

Prints per-host and (host 0) aggregate env-steps/s plus scaling
efficiency vs. a single-device run of the same per-device shape —
the measurement the BASELINE.md north star asks for (≥10M aggregate
env-steps/s at ≥2 hosts, ≥80% efficiency).  This environment exposes
one chip over a tunnel, so this script's multi-host path is validated
functionally via ``tests/test_multihost.py`` (two-process loopback) and
``__graft_entry__.dryrun_multichip`` (virtual-device mesh); wall-clock
numbers require a real slice.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cm3_tpu.parallel import dist, mesh as meshmod


def bench_fused(mesh: Mesh, per_device_batch: int = 1 << 19,
                steps: int = 2048, reps: int = 3) -> float:
    from cm3_tpu.core.config import CheckersEnvConfig
    from cm3_tpu.envs import checkers_packed as cp
    from cm3_tpu.ops import checkers_rollout as cr

    spec = cp.make_spec(
        CheckersEnvConfig(n_agents=2, agents_r=(0, 2), agents_c=(8, 8),
                          max_steps=50), (True, False))
    n_dev = mesh.devices.size

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
    def run(seeds):                         # seeds: [n_dev] -> [1] local
        rew, ep = cr.rollout_prng(spec, batch=per_device_batch,
                                  n_steps=steps, seed=seeds[0], sub=64)
        return jax.lax.psum(rew.sum(), "data")[None]

    seeds = jnp.arange(n_dev, dtype=jnp.int32)
    float(run(seeds)[0])                    # compile + sync
    t0 = time.time()
    for i in range(reps):
        float(run(seeds + (i + 1) * n_dev)[0])
    dt = time.time() - t0
    return n_dev * per_device_batch * steps * reps / dt


def bench_grid(mesh: Mesh, per_device_batch: int = 8192,
               steps: int = 256, reps: int = 5) -> float:
    from cm3_tpu.core.config import CheckersEnvConfig
    from cm3_tpu.envs.checkers import Checkers

    n_dev = mesh.devices.size
    batch = n_dev * per_device_batch
    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    goals = jnp.tile(jnp.eye(2)[None], (batch, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(batch))
    state, _ = jax.jit(jax.vmap(env.reset))(keys, goals)
    state = meshmod.shard_leading_axis(state, mesh, batch)
    reset_state = jax.tree_util.tree_map(lambda x: x[:1], state)

    @jax.jit
    def rollout(state, key):
        def body(st, k):
            actions = jax.random.randint(k, (batch, 2), 0, 5)
            st, ts = jax.vmap(env.step)(st, actions)
            st = jax.tree_util.tree_map(
                lambda r, s: jnp.where(
                    ts.done.reshape((-1,) + (1,) * (s.ndim - 1)), r, s),
                reset_state, st)
            return st, ts.reward.sum()
        st, rew = jax.lax.scan(body, state, jax.random.split(key, steps))
        return st, rew.sum()

    state, r = rollout(state, jax.random.PRNGKey(0))
    float(r)
    t0 = time.time()
    for i in range(reps):
        state, r = rollout(state, jax.random.PRNGKey(i + 1))
        float(r)
    return batch * steps * reps / (time.time() - t0)


def bench_train(mesh: Mesh, per_device_envs: int = 256,
                reps: int = 10) -> float:
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig,
                                     TrainConfig)
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.replay import buffer as replay
    from cm3_tpu.train.experiments import make_hooks
    from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout

    n_dev = mesh.devices.size
    n_envs = n_dev * per_device_envs
    # shard-local replay: one ring per device, appends/samples local
    # (replay_shards; the only collective left is the gradient psum)
    capacity = ((20000 + n_dev - 1) // n_dev) * n_dev
    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2))
    cfg = TrainConfig(n_envs=n_envs, batch_size=128, buffer_size=capacity,
                      steps_per_train=10, updates_per_chunk=8,
                      replay_shards=n_dev if n_dev > 1 else 1)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)
    rs = init_rollout(hooks, jax.random.PRNGKey(0), n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    dummy = jax.vmap(env.step)(rs.env_state,
                               jnp.zeros((n_envs, 2), jnp.int32))[1]
    tr = driver._transition(rs, jnp.zeros((n_envs, 2), jnp.int32), dummy,
                            None)
    buf = driver._replay_init(jax.tree_util.tree_map(lambda x: x[0], tr))
    ts, buf, rs = meshmod.shard_driver_state(mesh, ts, buf, rs, n_envs,
                                             replay_shards=cfg.replay_shards)

    ts, buf, rs, _ = driver._chunk_train(ts, buf, rs, 0.2,
                                         jax.random.PRNGKey(2))
    float(rs.episodes)
    t0 = time.time()
    for i in range(reps):
        ts, buf, rs, _ = driver._chunk_train(ts, buf, rs, 0.2,
                                             jax.random.PRNGKey(3 + i))
        float(rs.episodes)
    return n_envs * cfg.steps_per_train * reps / (time.time() - t0)


BENCHES = {"fused": bench_fused, "grid": bench_grid, "train": bench_train}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", choices=[*BENCHES, "all"], default="all")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    dist.initialize(args.coordinator, args.num_processes, args.process_id)
    mesh = meshmod.make_mesh()
    names = list(BENCHES) if args.bench == "all" else [args.bench]
    out = {"hosts": jax.process_count(),
           "devices": jax.device_count()}
    for name in names:
        out[f"{name}_env_steps_per_s"] = round(BENCHES[name](mesh))
    if dist.is_primary():
        print(json.dumps(out))


if __name__ == "__main__":
    main()
