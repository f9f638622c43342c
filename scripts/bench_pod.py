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
  * ``train``  — the full CM3 training chunk: env shards + shard-local
    replay per device, learner gradients psum over ICI.

All state is created INSIDE jit with explicit out_shardings (the
multi-controller-safe pattern proven by tests/multihost_worker.py — no
host-side global array construction), so the script runs unchanged as a
single process, under a multi-process loopback, or on a real pod.

Host 0 prints ONE JSON line in bench.py's schema (metric/value/unit/
vs_baseline vs the >=10M aggregate north star, BASELINE.md) extended
with per-host rates and weak-scaling efficiency vs a single-LOCAL-device
run of the same per-device shape measured in-process.

Loopback validation (no pod needed): ``tests/test_multihost.py::
test_bench_pod_two_process_loopback`` runs this script end-to-end under
2 jax.distributed processes x 4 virtual CPU devices with ``--small``;
the committed capture lives in ``runs/r4/bench_pod_loopback.json``.
Wall-clock efficiency numbers from a loopback are host-core-contention
numbers; only the real-slice run measures ICI (PERF.md multichip
section).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    # per-shard seed from the mesh axis index (no host-built global
    # input array — multi-controller safe)
    @jax.jit
    def run(base):                          # base: replicated i32 scalar
        @functools.partial(shard_map, mesh=mesh, in_specs=P(),
                           out_specs=P())
        def body(b):
            seed = b + jax.lax.axis_index("data")
            rew, ep = cr.rollout_prng(spec, batch=per_device_batch,
                                      n_steps=steps, seed=seed, sub=64)
            return jax.lax.psum(rew.sum(), "data")
        return body(base)

    float(run(jnp.int32(0)))                # compile + sync
    t0 = time.time()
    for i in range(reps):
        float(run(jnp.int32((i + 1) * n_dev)))
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

    def init_state(key):
        goals = jnp.tile(jnp.eye(2)[None], (batch, 1, 1))
        keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(batch, dtype=jnp.int32))
        state, _ = jax.vmap(env.reset)(keys, goals)
        return state

    shapes = jax.eval_shape(init_state, jax.random.PRNGKey(0))
    out_sh = meshmod.leading_axis_shardings(mesh, shapes, batch)
    state = jax.jit(init_state, out_shardings=out_sh)(jax.random.PRNGKey(0))
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

    def init_all(key):
        rs = init_rollout(hooks, key, n_envs)
        ts = alg.init_state(jax.random.fold_in(key, 1), rs.obs, rs.state,
                            rs.goals)
        dummy = jax.vmap(env.step)(rs.env_state,
                                   jnp.zeros((n_envs, 2), jnp.int32))[1]
        tr = driver._transition(rs, jnp.zeros((n_envs, 2), jnp.int32),
                                dummy, None)
        buf = driver._replay_init(jax.tree_util.tree_map(lambda x: x[0], tr))
        return ts, buf, rs

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(init_all, key)
    out_sh = meshmod.driver_state_shardings(mesh, shapes, n_envs,
                                            cfg.replay_shards)
    ts, buf, rs = jax.jit(init_all, out_shardings=out_sh)(key)

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

# loopback-sized shapes: small enough for virtual CPU devices, same
# program structure as the pod shapes
SMALL = {
    "fused": dict(per_device_batch=2048, steps=128, reps=2),
    "grid": dict(per_device_batch=128, steps=32, reps=2),
    "train": dict(per_device_envs=16, reps=3),
}


def _single_device_mesh() -> Mesh:
    import numpy as np
    return Mesh(np.asarray([jax.local_devices()[0]]), ("data",))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", choices=[*BENCHES, "all"], default="all")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--small", action="store_true",
                    help="loopback-sized shapes (CI / virtual devices)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (loopback testing)")
    ap.add_argument("--out", default=None,
                    help="also write host 0's JSON line to this path")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dist.initialize(args.coordinator, args.num_processes, args.process_id)
    mesh = meshmod.make_mesh()
    n_dev = mesh.devices.size
    names = list(BENCHES) if args.bench == "all" else [args.bench]
    kw = {n: (SMALL[n] if args.small else {}) for n in names}

    rates = {n: BENCHES[n](mesh, **kw[n]) for n in names}
    # weak-scaling reference: one LOCAL device, same per-device shape
    # (runs identically on every controller; no cross-host collectives)
    base = {n: BENCHES[n](_single_device_mesh(), **kw[n]) for n in names}

    main_bench = "train" if "train" in rates else names[0]
    out = {
        "metric": f"pod_{main_bench}_env_steps_per_s",
        "value": round(rates[main_bench]),
        "unit": "env-steps/s",
        # BASELINE.md north star: >=10M aggregate env-steps/s
        "vs_baseline": round(rates[main_bench] / 1e7, 4),
        "hosts": jax.process_count(),
        "devices": n_dev,
    }
    for n in names:
        out[f"{n}_env_steps_per_s"] = round(rates[n])
        out[f"{n}_per_host_env_steps_per_s"] = round(
            rates[n] / jax.process_count())
        out[f"{n}_single_device_env_steps_per_s"] = round(base[n])
        out[f"{n}_weak_scaling_eff"] = round(
            rates[n] / (n_dev * base[n]), 4)
    if dist.is_primary():
        line = json.dumps(out)
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
