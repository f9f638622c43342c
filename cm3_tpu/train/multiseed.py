"""Vmapped multi-seed training: every seed's full training step in ONE
jitted program.

The reference's only parallelism is forking one OS process per seed
(``alg/train_multiprocess.py:31-43``), each stepping one Python env.
The TPU-native mapping promised in SURVEY.md §2.4 is a *vmap over the
seed axis*: S independent replicas — params, optimizer state, replay
buffer, and n_envs rollout instances each — advance in lockstep inside
one fused chunk, so a single chip trains all seeds of an experiment
sweep simultaneously (on a pod slice, shard the seed axis over the mesh
like any other batch axis).

Schedule semantics: each seed keeps ITS OWN epsilon schedule (driven by
its own completed-episode count, like a reference process would), while
regime switches (pretrain-fill -> train) and periodic eval fire when the
SLOWEST seed reaches the threshold — seeds stay in lockstep inside the
vmap, and episode pacing across seeds differs only by auto-reset jitter.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core import prng
from cm3_tpu.replay import buffer as replay
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout, init_stage


def _eps_schedule(cfg, episodes):
    e = np.maximum(0, episodes - cfg.pretrain_episodes)
    return np.maximum(cfg.epsilon_end,
                      cfg.epsilon_start - e * cfg.epsilon_step)


def shard_seed_axis(tree, mesh, n_seeds: int, axis: str = "seed"):
    """Place every leaf with a leading seed dim P(seed)-sharded over the
    mesh, replicating the rest — the seed-axis-over-mesh mapping: each
    device (or device group) trains its own replicas, with NO collectives
    between seeds (they are independent by construction, so XLA lowers
    this to purely local compute)."""
    import jax.sharding as shd
    data = shd.NamedSharding(mesh, shd.PartitionSpec(axis))
    repl = shd.NamedSharding(mesh, shd.PartitionSpec())

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == n_seeds:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, tree)


def train_vmapped_seeds(hooks, alg, cfg, n_seeds: int, base_seed: int,
                        n_episodes: Optional[int] = None,
                        log_fn: Optional[Callable[[Dict], None]] = None,
                        mesh=None):
    """Train ``n_seeds`` independent replicas in lockstep.  Returns
    (stacked TrainStates with a leading seed axis, per-period history).

    ``log_fn`` receives one row per period with per-seed arrays.
    ``mesh``: optional 1-axis ("seed") jax.sharding.Mesh — shards the
    seed axis over devices so a pod slice trains n_seeds x n_envs
    replicas with zero cross-seed communication."""
    driver = OffPolicyDriver(hooks, alg, cfg)
    n_episodes = n_episodes or cfg.N_train
    s = n_seeds

    keys = jnp.stack([prng.root_key(base_seed + i) for i in range(s)])
    k_reset = jax.vmap(lambda k: prng.for_purpose(k, prng.RESET))(keys)
    k_params = jax.vmap(lambda k: prng.for_purpose(k, prng.PARAMS))(keys)
    k_roll = jax.vmap(lambda k: prng.for_purpose(k, prng.ROLLOUT))(keys)

    rs = jax.vmap(lambda k: init_rollout(hooks, k, cfg.n_envs))(k_reset)
    ts = jax.vmap(alg.init_state)(k_params, rs.obs, rs.state, rs.goals)

    # one empty buffer replicated per seed
    rs0 = jax.tree_util.tree_map(lambda x: x[0], rs)
    dummy_ts = jax.vmap(hooks.env.step)(
        rs0.env_state, jnp.zeros((cfg.n_envs, hooks.n_agents), jnp.int32))[1]
    tr = driver._transition(rs0, jnp.zeros((cfg.n_envs, hooks.n_agents),
                                           jnp.int32), dummy_ts, None)
    example = jax.tree_util.tree_map(lambda x: x[0], tr)
    if cfg.dual_buffer:
        buf1 = replay.init_dual(example, cfg.buffer_size)
        rs = jax.vmap(lambda r: init_stage(r, example, cfg.n_envs,
                                           cfg.max_steps))(rs)
    else:
        buf1 = replay.init(example, cfg.buffer_size)
    buf = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (s,) + x.shape).copy()
        if hasattr(x, "shape") else x, buf1)

    if mesh is not None:
        ts = shard_seed_axis(ts, mesh, s)
        rs = shard_seed_axis(rs, mesh, s)
        buf = shard_seed_axis(buf, mesh, s)
        k_roll = shard_seed_axis(k_roll, mesh, s)

    chunk_train = jax.jit(jax.vmap(
        lambda ts, buf, rs, eps, key:
        driver._chunk(ts, buf, rs, eps, key, True, False)),
        donate_argnums=(1,))
    chunk_fill = jax.jit(jax.vmap(
        lambda ts, buf, rs, eps, key:
        driver._chunk(ts, buf, rs, eps, key, False, True)),
        donate_argnums=(1,))
    eval_v = jax.jit(jax.vmap(
        lambda ts, key: driver.evaluate(ts, key, cfg.N_eval)))

    history = []
    chunk_idx = 0
    last_period = 0
    t0 = time.time()
    episodes = np.zeros(s, np.int64)
    while episodes.min() < n_episodes:
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, chunk_idx))(k_roll)
        pretrain = episodes.min() < cfg.pretrain_episodes
        eps = jnp.asarray(_eps_schedule(cfg, episodes), jnp.float32)
        fn = chunk_fill if pretrain else chunk_train
        ts, buf, rs, metrics = fn(ts, buf, rs, eps, k)
        chunk_idx += 1
        episodes = np.asarray(rs.episodes)        # one sync per chunk

        period_idx = int(episodes.min()) // cfg.period
        if period_idx > last_period:
            last_period = period_idx
            k_eval = jax.vmap(lambda kk: jax.random.fold_in(
                kk, 10_000 + period_idx))(k_roll)
            r_local, r_global, _eval_aux = eval_v(ts, k_eval)
            row = {
                "episode": episodes.copy(),                 # [S]
                "epsilon": _eps_schedule(cfg, episodes),    # [S]
                "r_eval_local": np.asarray(r_local),        # [S, N]
                "r_eval_global": np.asarray(r_global),      # [S]
                "r_train_local": np.asarray(rs.acc_ret_local)
                / max(cfg.period, 1),                       # [S, N]
                "duration_s": time.time() - t0,
            }
            history.append(row)
            if log_fn is not None:
                log_fn(dict(row, _ts=ts))
            rs = rs.replace(
                acc_ret_local=jnp.zeros_like(rs.acc_ret_local),
                acc_ret_global=jnp.zeros_like(rs.acc_ret_global))
            t0 = time.time()

    return ts, history
