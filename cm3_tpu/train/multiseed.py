"""Vmapped multi-seed training: every seed's full training step in ONE
jitted program.

The reference's only parallelism is forking one OS process per seed
(``alg/train_multiprocess.py:31-43``), each stepping one Python env.
The TPU-native mapping promised in SURVEY.md §2.4 is a *vmap over the
seed axis*: S independent replicas — params, optimizer state, replay
buffer, and n_envs rollout instances each — advance in lockstep inside
one fused chunk, so a single chip trains all seeds of an experiment
sweep simultaneously (on a pod slice, shard the seed axis over the mesh
like any other batch axis — ``shard_seed_axis``).

Schedule semantics: each seed keeps ITS OWN epsilon schedule (driven by
its own completed-episode count, like a reference process would), while
regime switches (pretrain-fill -> train, on-policy bursts) and periodic
eval fire when the SLOWEST seed reaches the threshold — seeds stay in
lockstep inside the vmap, and episode pacing across seeds differs only
by auto-reset jitter.

Both training regimes are supported: off-policy (replay + one update
per chunk block, the reference's train_offpolicy schedule) and
on-policy (fill episodes_per_train episodes -> epochs update burst ->
DISCARD the buffer, the reference's train_onpolicy schedule,
train_onpolicy.py:359-378) via ``onpolicy=True``.

Resume: pass ``resume=(stacked_ts, episodes_vector)`` (e.g. restored
from the runner's vmapped autosave) — training restarts with the
restored parameters/episode counts and warms the empty replay buffers
with policy rollouts first, like the single-seed elastic-resume path
(runner.py auto_resume).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core import prng
from cm3_tpu.replay import buffer as replay
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout, init_stage
from cm3_tpu.train.onpolicy import OnPolicyDriver


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
                        mesh=None, onpolicy: bool = False,
                        resume: Optional[Tuple[Any, np.ndarray]] = None):
    """Train ``n_seeds`` independent replicas in lockstep.  Returns
    (stacked TrainStates with a leading seed axis, per-period history).

    ``log_fn`` receives one row per period with per-seed arrays plus the
    stacked TrainState under ``_ts`` (for per-seed snapshots/autosave).
    ``mesh``: optional 1-axis ("seed") jax.sharding.Mesh — shards the
    seed axis over devices so a pod slice trains n_seeds x n_envs
    replicas with zero cross-seed communication.
    ``onpolicy``: use the on-policy burst-and-discard regime.
    ``resume``: (stacked_ts, per-seed episode counts) from an autosave."""
    driver_cls = OnPolicyDriver if onpolicy else OffPolicyDriver
    driver = driver_cls(hooks, alg, cfg)
    n_episodes = n_episodes or cfg.N_train
    s = n_seeds

    keys = jnp.stack([prng.root_key(base_seed + i) for i in range(s)])
    k_reset = jax.vmap(lambda k: prng.for_purpose(k, prng.RESET))(keys)
    k_params = jax.vmap(lambda k: prng.for_purpose(k, prng.PARAMS))(keys)
    k_roll = jax.vmap(lambda k: prng.for_purpose(k, prng.ROLLOUT))(keys)

    rs = jax.vmap(lambda k: init_rollout(hooks, k, cfg.n_envs,
                                         cfg.episode_log))(k_reset)
    if resume is not None:
        ts, initial_episodes = resume
        initial_episodes = np.asarray(initial_episodes, np.int64)
        rs = rs.replace(episodes=jnp.asarray(initial_episodes, jnp.int32))
    else:
        ts = jax.vmap(alg.init_state)(k_params, rs.obs, rs.state, rs.goals)
        initial_episodes = np.zeros(s, np.int64)

    # one empty buffer replicated per seed
    rs0 = jax.tree_util.tree_map(lambda x: x[0], rs)
    dummy_ts = jax.vmap(hooks.env.step)(
        rs0.env_state, jnp.zeros((cfg.n_envs, hooks.n_agents), jnp.int32))[1]
    tr = driver._transition(rs0, jnp.zeros((cfg.n_envs, hooks.n_agents),
                                           jnp.int32), dummy_ts, None)
    example = jax.tree_util.tree_map(lambda x: x[0], tr)
    buf1 = driver._replay_init(example)
    if cfg.dual_buffer:
        rs = jax.vmap(lambda r: init_stage(r, example, cfg.n_envs,
                                           cfg.max_steps))(rs)
    buf = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (s,) + x.shape).copy()
        if hasattr(x, "shape") else x, buf1)

    if mesh is not None:
        ts = shard_seed_axis(ts, mesh, s)
        rs = shard_seed_axis(rs, mesh, s)
        buf = shard_seed_axis(buf, mesh, s)
        k_roll = shard_seed_axis(k_roll, mesh, s)

    if onpolicy:
        # rollout-only chunks + separate update bursts with buffer
        # discard (train_onpolicy.py:359-378)
        roll_pol = jax.jit(jax.vmap(
            lambda ts, buf, rs, eps, key:
            driver._rollout_chunk(ts, buf, rs, key, False, eps)),
            donate_argnums=(1,))
        roll_rand = jax.jit(jax.vmap(
            lambda ts, buf, rs, eps, key:
            driver._rollout_chunk(ts, buf, rs, key, True, eps)),
            donate_argnums=(1,))
        burst = jax.jit(jax.vmap(driver._train_burst))
        reset_buf = jax.jit(jax.vmap(
            (lambda b: replay.reset_dual(b)) if cfg.dual_buffer else
            (lambda b: b.replace(insert=jnp.zeros_like(b.insert),
                                 size=jnp.zeros_like(b.size)))))
    else:
        chunk_train = jax.jit(jax.vmap(
            lambda ts, buf, rs, eps, key:
            driver._chunk(ts, buf, rs, eps, key, True, False)),
            donate_argnums=(1,))
        chunk_fill = jax.jit(jax.vmap(
            lambda ts, buf, rs, eps, key:
            driver._chunk(ts, buf, rs, eps, key, False, True)),
            donate_argnums=(1,))
        chunk_warm = jax.jit(jax.vmap(
            lambda ts, buf, rs, eps, key:
            driver._chunk(ts, buf, rs, eps, key, False, False)),
            donate_argnums=(1,))
    eval_v = jax.jit(jax.vmap(
        lambda ts, key: driver.evaluate(ts, key, cfg.N_eval)))
    # per-seed gradient observability (cfg.summarize): vmapped
    # non-applied update returning raw grad pytrees, like the
    # single-seed driver's _grad_snap (alg_credit.py:384-403)
    grad_v = jax.jit(jax.vmap(driver._grad_snapshot)) if cfg.summarize \
        else None

    history = []
    chunk_idx = 0
    last_ep_flushed = np.asarray(initial_episodes, np.int64).copy()
    start_min = int(initial_episodes.min())
    last_period = start_min // cfg.period
    last_train_eps = start_min
    # on-policy epsilon decays once per training BURST
    # (train_onpolicy.py:369-370); reconstruct burst count on resume
    eps_scalar = max(cfg.epsilon_end, cfg.epsilon_start
                     - (max(0, start_min - cfg.pretrain_episodes)
                        // max(cfg.episodes_per_train, 1))
                     * cfg.epsilon_step)
    t0 = time.time()
    episodes = initial_episodes.copy()
    while episodes.min() < n_episodes:
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, chunk_idx))(k_roll)
        emin = episodes.min()
        fill = emin < cfg.pretrain_episodes
        warm = (not fill) and (emin < initial_episodes.min()
                               + cfg.pretrain_episodes)
        metrics = {}
        if onpolicy:
            eps_v = jnp.full((s,), eps_scalar, jnp.float32)
            fn = roll_rand if fill else roll_pol
            buf, rs = fn(ts, buf, rs, eps_v, k)
            episodes = np.asarray(rs.episodes)
            if (not fill and episodes.min() - last_train_eps
                    >= cfg.episodes_per_train):
                kb = jax.vmap(lambda kk: jax.random.fold_in(kk, 1))(k)
                ts, metrics = burst(ts, buf, eps_v, kb)
                last_train_eps = int(episodes.min())
                buf = reset_buf(buf)
                if eps_scalar > cfg.epsilon_end:
                    eps_scalar = max(cfg.epsilon_end,
                                     eps_scalar - cfg.epsilon_step)
        else:
            eps = jnp.asarray(_eps_schedule(cfg, episodes), jnp.float32)
            fn = chunk_fill if fill else (chunk_warm if warm
                                          else chunk_train)
            ts, buf, rs, metrics = fn(ts, buf, rs, eps, k)
            episodes = np.asarray(rs.episodes)    # one sync per chunk
        chunk_idx += 1

        period_idx = int(episodes.min()) // cfg.period
        if period_idx > last_period:
            last_period = period_idx
            k_eval = jax.vmap(lambda kk: jax.random.fold_in(
                kk, 10_000 + period_idx))(k_roll)
            r_local, r_global, eval_aux = eval_v(ts, k_eval)
            row = {
                "episode": episodes.copy(),                 # [S]
                "epsilon": (np.full(s, eps_scalar) if onpolicy
                            else _eps_schedule(cfg, episodes)),  # [S]
                "r_eval_local": np.asarray(r_local),        # [S, N]
                "r_eval_global": np.asarray(r_global),      # [S]
                "eval_action_dist":
                np.asarray(eval_aux["act_dist"]).reshape(s, -1),  # [S, N*A]
                "r_train_local": np.asarray(rs.acc_ret_local)
                / max(cfg.period, 1),                       # [S, N]
                "r_train_global": np.asarray(rs.acc_ret_global)
                / max(cfg.period, 1),                       # [S]
                "duration_s": time.time() - t0,
            }
            # experiment eval metrics (reach rate, traffic metrics):
            # per-seed vectors
            row.update({kk: np.asarray(v) for kk, v in eval_aux.items()
                        if kk != "act_dist"})
            # last chunk's learning metrics (losses), per-seed [S] —
            # parity with the single-seed driver's period row
            row.update({kk: np.asarray(v) for kk, v in metrics.items()
                        if kk != "grads"})
            if cfg.episode_log:
                # per-seed sampled episode stream (single-seed driver's
                # log.csv ring): list of (ids, returns) tuples
                eplog = np.asarray(rs.eplog)
                eplog_ep = np.asarray(rs.eplog_ep)
                flushes = []
                for i in range(s):
                    from cm3_tpu.train.offpolicy import flush_eplog
                    flushes.append(flush_eplog(
                        eplog[i], eplog_ep[i], int(last_ep_flushed[i]),
                        int(episodes[i])))
                    last_ep_flushed[i] = int(episodes[i])
                row["_episodes"] = flushes
            filled = int(np.sum(np.asarray(buf.bad.size))
                         + np.sum(np.asarray(buf.good.size))) \
                if cfg.dual_buffer else int(np.sum(np.asarray(buf.size)))
            if grad_v is not None and not fill and (not onpolicy
                                                   or filled > 0):
                kg = jax.vmap(lambda kk: jax.random.fold_in(
                    kk, 1_000_000 + period_idx))(k_roll)
                row["_grads"] = grad_v(
                    ts, buf, jnp.asarray(row["epsilon"], jnp.float32), kg)
            history.append(row)
            if log_fn is not None:
                log_fn(dict(row, _ts=ts))
            rs = rs.replace(
                acc_ret_local=jnp.zeros_like(rs.acc_ret_local),
                acc_ret_global=jnp.zeros_like(rs.acc_ret_global))
            t0 = time.time()

    return ts, history
