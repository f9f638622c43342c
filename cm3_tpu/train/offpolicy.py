"""Off-policy trainer.

TPU-native re-design of the reference ``alg/train_offpolicy.py``: instead
of stepping ONE Python env and paying a feed_dict round-trip per action,
the driver steps ``n_envs`` vectorized instances in lockstep inside a
jitted "chunk" that fuses ``steps_per_train`` env steps, the replay
insertions, the auto-resets, and one full learning update.  The host loop
only handles schedule bookkeeping (epsilon decay per completed episode,
periodic eval, CSV logging) — one scalar sync per chunk.

Schedule semantics preserved from the reference:
  * random actions while episode_count < pretrain_episodes (:311-313)
  * one update every steps_per_train env steps (:346-356)
  * epsilon decays per completed episode after pretraining (:376-377)
  * greedy eval of N_eval episodes every `period` episodes (:385-398)
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cm3_tpu.core import prng
from cm3_tpu.core.config import TrainConfig
from cm3_tpu.replay import buffer as replay
from cm3_tpu.train.experiments import Hooks


@struct.dataclass
class RolloutState:
    env_state: Any
    obs: Any
    state: Any
    goals: jax.Array          # [E, N, G]
    a_prev: jax.Array         # [E, N]
    ep_ret_local: jax.Array   # [E, N]
    ep_ret_global: jax.Array  # [E]
    # running century accumulators (reset by host each period)
    acc_ret_local: jax.Array  # [N]
    acc_ret_global: jax.Array
    episodes: jax.Array       # i32 completed episodes
    # dual-buffer episode staging (None unless cfg.dual_buffer): each env
    # instance accumulates its in-flight episode here; at auto-reset the
    # completed episode is routed whole into the bad or good memory
    # (the vectorized equivalent of the reference's per-episode
    # buf_episode list, train_offpolicy.py:335-344,370-374)
    stage: Any = None         # pytree, leaves [E, T_max, ...]
    stage_t: Any = None       # [E] i32 current episode length
    # sampled per-episode return ring: eplog [K, N+1] holds
    # (r_local..., r_global) of recently completed episodes, eplog_ep
    # [K] i32 the matching episode numbers (kept integer — a float32
    # id loses integer precision past 2^24 episodes); flushed to
    # log.csv per period (the reference's per-episode log.csv stream,
    # train_offpolicy.py:208-218,399-403)
    eplog: Any = None
    eplog_ep: Any = None


def init_rollout(hooks: Hooks, key, n_envs: int,
                 episode_log: int = 0) -> RolloutState:
    keys = prng.split_batch(key, n_envs)
    env_state, ts, goals = jax.vmap(hooks.episode_init)(keys)
    n = hooks.n_agents
    return RolloutState(
        env_state=env_state, obs=ts.obs, state=ts.state, goals=goals,
        a_prev=jnp.zeros((n_envs, n), jnp.int32),
        ep_ret_local=jnp.zeros((n_envs, n)),
        ep_ret_global=jnp.zeros(n_envs),
        acc_ret_local=jnp.zeros(n), acc_ret_global=jnp.float32(0.0),
        episodes=jnp.int32(0),
        eplog=(jnp.zeros((episode_log, n + 1)) if episode_log else None),
        eplog_ep=(jnp.zeros(episode_log, jnp.int32) if episode_log
                  else None))


def flush_eplog(eplog, eplog_ep, last_flushed: int, episodes_done: int):
    """Extract completed-episode rows newer than ``last_flushed`` from
    the device ring, sorted by episode number: -> (ids [M] i64,
    returns [M, N+1] = r_local..., r_global).  Episodes overwritten by
    the ring before a flush are lost — a documented sampling cap (the
    full stream at vectorized rates would be pure host overhead)."""
    arr = np.asarray(eplog)
    ep_no = np.asarray(eplog_ep, np.int64)
    keep = (ep_no > last_flushed) & (ep_no <= episodes_done)
    order = np.argsort(ep_no[keep])
    return ep_no[keep][order], arr[keep][order]


def init_stage(rs: RolloutState, example_transition, n_envs: int,
               max_steps: int) -> RolloutState:
    """Attach the dual-buffer staging slab ([E, T_max] per transition
    leaf) to a rollout state."""
    stage = jax.tree_util.tree_map(
        lambda x: jnp.zeros((n_envs, max_steps) + jnp.shape(x),
                            jnp.asarray(x).dtype),
        example_transition)
    return rs.replace(stage=stage, stage_t=jnp.zeros(n_envs, jnp.int32))


class OffPolicyDriver:

    def __init__(self, hooks: Hooks, alg, cfg: TrainConfig,
                 eval_hooks: Optional[Hooks] = None):
        self.hooks = hooks
        self.alg = alg
        self.cfg = cfg
        self.eval_hooks = eval_hooks or hooks
        self.n_envs = cfg.n_envs
        # clipped-IS PG correction (AlgConfig.pg_is_clip): transitions
        # additionally store "bp", the behavior-policy probability of
        # the STORED action at collection time
        self._store_bp = (getattr(getattr(alg, "cfg", None), "pg_is_clip",
                                  0.0) > 0 and hasattr(alg, "act_bp"))
        # donate the replay store (multi-MB) so it updates in place;
        # params/rollout leaves may alias shared zero buffers -> not donatable
        self._chunk_train = jax.jit(
            lambda ts, buf, rs, eps, key:
            self._chunk(ts, buf, rs, eps, key, True, False),
            donate_argnums=(1,))
        self._chunk_fill = jax.jit(
            lambda ts, buf, rs, eps, key:
            self._chunk(ts, buf, rs, eps, key, False, True),
            donate_argnums=(1,))
        # policy rollouts without training: replay warm-up after a resume
        self._chunk_warm = jax.jit(
            lambda ts, buf, rs, eps, key:
            self._chunk(ts, buf, rs, eps, key, False, False),
            donate_argnums=(1,))
        self._eval = jax.jit(self.evaluate, static_argnums=(2,))
        # K training chunks per dispatch with ON-DEVICE epsilon decay:
        # eliminates the per-chunk host sync (cfg.chunks_per_sync)
        self._chunk_train_k = jax.jit(self._chunks_scanned,
                                      static_argnums=(4,),
                                      donate_argnums=(1,))
        # gradient observability (cfg.summarize): one extra non-applied
        # update on a fresh sample, returning the raw grad pytrees for
        # per-gradient histograms (reference alg_credit.py:384-403)
        self._grad_snap = jax.jit(self._grad_snapshot)

    # ---- replay dispatch: plain / dual x single-ring / shard-local ---- #

    def _replay_init(self, example):
        cfg = self.cfg
        d = cfg.replay_shards
        if cfg.dual_buffer:
            return (replay.init_dual_sharded(example, cfg.buffer_size, d)
                    if d > 1 else replay.init_dual(example, cfg.buffer_size))
        return (replay.init_sharded(example, cfg.buffer_size, d)
                if d > 1 else replay.init(example, cfg.buffer_size))

    def _replay_add(self, buf, tr):
        d = self.cfg.replay_shards
        if d > 1:
            return replay.add_batch_sharded(buf, tr, d)
        return replay.add_batch(buf, tr)

    def _replay_flush(self, buf, stage, valid, is_bad):
        d = self.cfg.replay_shards
        if d > 1:
            return replay.flush_episodes_sharded(buf, stage, valid,
                                                 is_bad, d)
        return replay.flush_episodes(buf, stage, valid, is_bad)

    def _replay_sample(self, buf, key):
        cfg = self.cfg
        d = cfg.replay_shards
        if cfg.dual_buffer:
            if d > 1:
                return replay.sample_dual_sharded(buf, key, cfg.batch_size,
                                                  d)
            return replay.sample_dual(buf, key, cfg.batch_size)
        if d > 1:
            return replay.sample_sharded(buf, key, cfg.batch_size, d)
        return replay.sample(buf, key, cfg.batch_size)

    def _grad_snapshot(self, ts_alg, buf, epsilon, key):
        k_s, k_u = jax.random.split(key)
        batch = self._replay_sample(buf, k_s)
        _, metrics = self.alg.update(ts_alg, batch, epsilon, k_u,
                                     with_grads=True)
        return metrics["grads"]

    def _chunks_scanned(self, ts, buf, rs, key, k_chunks: int):
        """K chunks per dispatch with ON-DEVICE schedule: both the
        epsilon decay AND the pretrain->train regime switch are
        evaluated per chunk from the live episode count, so a dispatch
        that straddles the fill/train boundary behaves exactly like K
        separate host-synced chunks (random actions + no update applied
        while episodes < pretrain_episodes)."""
        cfg = self.cfg

        def one(carry, k):
            ts, buf, rs = carry
            gate = rs.episodes >= cfg.pretrain_episodes
            eps = jnp.maximum(
                cfg.epsilon_end,
                cfg.epsilon_start - jnp.maximum(
                    0, rs.episodes - cfg.pretrain_episodes).astype(jnp.float32)
                * cfg.epsilon_step)
            ts, buf, rs, metrics = self._chunk(ts, buf, rs, eps, k,
                                               True, False, gate=gate)
            return (ts, buf, rs), metrics

        (ts, buf, rs), ms = jax.lax.scan(
            one, (ts, buf, rs), jax.random.split(key, k_chunks))
        metrics = jax.tree_util.tree_map(lambda m: m[-1], ms)
        metrics["trained_chunks"] = jnp.sum(ms["trained"])
        return ts, buf, rs, metrics

    # -------------------------------------------------------------- #

    def _transition(self, rs: RolloutState, actions, ts_next, state_next_obs,
                    bp=None):
        tr = {
            "obs": rs.obs, "state": rs.state,
            "a": actions, "a_prev": rs.a_prev,
            "r": ts_next.reward, "rl": ts_next.reward_local,
            "obs_next": ts_next.obs, "state_next": ts_next.state,
            "done": ts_next.done, "goals": rs.goals,
        }
        if not self.hooks.has_a_prev:
            tr.pop("a_prev")
        if self._store_bp:
            tr["bp"] = bp if bp is not None else jnp.full(
                actions.shape, 1.0 / self.alg.n_actions, jnp.float32)
        return tr

    def _step_once(self, ts_alg, rs: RolloutState, buf, epsilon, key,
                   random_actions: bool, policy_gate=None):
        """One lockstep env transition for all instances + buffer add +
        auto-reset.  ``policy_gate`` (traced bool, optional): when
        False, act randomly regardless of ``random_actions`` — the
        on-device pretrain-fill regime inside a K-chunk dispatch."""
        hooks, env = self.hooks, self.hooks.env
        e = self.n_envs
        n = hooks.n_agents
        k_act, k_rand, k_reset = jax.random.split(key, 3)

        probs_b = None
        if random_actions:
            actions = jax.random.randint(k_rand, (e, n), 0,
                                         self.alg.n_actions)
        else:
            if self._store_bp:
                actions, probs_b = self.alg.act_bp(
                    ts_alg, rs.obs, rs.goals, rs.a_prev, epsilon, k_act)
            else:
                actions = self.alg.act(ts_alg, rs.obs, rs.goals, rs.a_prev,
                                       epsilon, k_act)
            if policy_gate is not None:
                actions = jnp.where(
                    policy_gate, actions,
                    jax.random.randint(k_rand, (e, n), 0,
                                       self.alg.n_actions))
        if hasattr(env, "check_actions"):
            # feasibility filter before stepping; the REPLACED actions are
            # what gets stored (train_offpolicy.py:322-325)
            actions = jax.vmap(env.check_actions)(rs.env_state, actions)

        bp = None
        if self._store_bp and probs_b is not None:
            # behavior prob of the STORED action (post-replacement; a
            # feasibility-replaced action's policy prob may be small —
            # the ratio pi_now/bp then tracks policy drift on exactly
            # the action the PG trains on).  Random-fill actions (and
            # gated-off instances) store the uniform 1/A.
            bp = jnp.take_along_axis(probs_b, actions[..., None],
                                     axis=-1)[..., 0]
            if policy_gate is not None:
                bp = jnp.where(policy_gate, bp,
                               1.0 / self.alg.n_actions)
        env_state2, ts2 = jax.vmap(env.step)(rs.env_state, actions)

        tr = self._transition(rs, actions, ts2, None, bp=bp)
        done = ts2.done
        ep_ret_local = rs.ep_ret_local + ts2.reward_local
        ep_ret_global = rs.ep_ret_global + ts2.reward

        stage, stage_t = rs.stage, rs.stage_t
        if self.cfg.dual_buffer:
            # stage the transition at [env, episode_step]; episodes are
            # capped at max_steps so the slab never overflows (writes past
            # the slab are dropped defensively)
            t_max = self.cfg.max_steps
            e_idx = jnp.arange(e)
            t_idx = jnp.minimum(stage_t, t_max)
            stage = jax.tree_util.tree_map(
                lambda s, r: s.at[e_idx, t_idx].set(r, mode="drop"),
                stage, tr)
            stage_len = jnp.minimum(stage_t + 1, t_max)
            # route every episode that terminated this step, whole
            # (train_offpolicy.py:370-374; routing predicate per
            # experiment via hooks.is_bad_episode)
            is_bad = jax.vmap(hooks.is_bad_episode)(env_state2, ep_ret_local)
            valid = done[:, None] & (jnp.arange(t_max)[None, :]
                                     < stage_len[:, None])
            buf = self._replay_flush(buf, stage, valid, is_bad)
            stage_t = jnp.where(done, 0, stage_len)
        else:
            buf = self._replay_add(buf, tr)

        # auto-reset finished instances with fresh goals
        keys = prng.split_batch(k_reset, e)
        new_state, new_ts, new_goals = jax.vmap(hooks.episode_init)(keys)

        sel = lambda a, b: jax.vmap(jnp.where)(done, a, b)
        env_state3 = jax.tree_util.tree_map(sel, new_state, env_state2)
        obs3 = jax.tree_util.tree_map(sel, new_ts.obs, ts2.obs)
        state3 = jax.tree_util.tree_map(sel, new_ts.state, ts2.state)
        goals3 = sel(new_goals, rs.goals)
        a_prev3 = jnp.where(done[:, None], 0, actions)

        eplog, eplog_ep = rs.eplog, rs.eplog_ep
        if eplog is not None:
            # write each completed episode's returns into the ring at
            # (episode# - 1) mod K; non-done rows target index K which
            # mode="drop" discards
            k_ring = eplog.shape[0]
            rank = jnp.cumsum(done.astype(jnp.int32)) - 1
            ep_no = rs.episodes + 1 + rank
            idx = jnp.where(done, (ep_no - 1) % k_ring, k_ring)
            rows = jnp.concatenate(
                [ep_ret_local, ep_ret_global[:, None]], axis=1)
            eplog = eplog.at[idx].set(rows, mode="drop")
            eplog_ep = eplog_ep.at[idx].set(ep_no, mode="drop")

        d = done.astype(jnp.float32)
        rs2 = rs.replace(
            env_state=env_state3, obs=obs3, state=state3, goals=goals3,
            a_prev=a_prev3, stage=stage, stage_t=stage_t, eplog=eplog,
            eplog_ep=eplog_ep,
            ep_ret_local=ep_ret_local * (1.0 - d[:, None]),
            ep_ret_global=ep_ret_global * (1.0 - d),
            acc_ret_local=rs.acc_ret_local
            + jnp.sum(ep_ret_local * d[:, None], axis=0),
            acc_ret_global=rs.acc_ret_global + jnp.sum(ep_ret_global * d),
            episodes=rs.episodes + jnp.sum(done.astype(jnp.int32)))
        return rs2, buf

    def _chunk(self, ts_alg, buf, rs, epsilon, key, do_train: bool,
               random_actions: bool, gate=None):
        """steps_per_train lockstep env steps, then one learning update.
        ``gate`` (traced bool, optional): when False this chunk is a
        pretrain-fill chunk — actions are random and the update is
        computed but NOT applied (params/metrics fall back to the
        incoming state) — so a K-chunk dispatch can cross the
        pretrain->train boundary on-device."""
        spt = self.cfg.steps_per_train

        def body(carry, k):
            rs, buf = carry
            rs, buf = self._step_once(ts_alg, rs, buf, epsilon, k,
                                      random_actions=random_actions,
                                      policy_gate=gate)
            return (rs, buf), ()

        (rs, buf), _ = jax.lax.scan(body, (rs, buf),
                                    jax.random.split(key, spt))
        metrics = {}
        if do_train:
            n_upd = self.cfg.updates_per_chunk or self.n_envs

            def upd_body(ts_alg, k):
                k_sample, k_update = jax.random.split(k)
                batch = self._replay_sample(buf, k_sample)
                return self.alg.update(ts_alg, batch, epsilon, k_update)

            ts_new, metrics = jax.lax.scan(
                upd_body, ts_alg,
                jax.random.split(jax.random.fold_in(key, 7), n_upd))
            metrics = {k: v[-1] for k, v in metrics.items()}
            if gate is None:
                ts_alg = ts_new
            else:
                ts_alg = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(gate, n, o), ts_new, ts_alg)
                metrics = {k: jnp.where(gate, v, jnp.zeros_like(v))
                           for k, v in metrics.items()}
                metrics["trained"] = gate.astype(jnp.float32)
        return ts_alg, buf, rs, metrics

    # -------------------------------------------------------------- #

    def evaluate(self, ts_alg, key, n_eval: int):
        """Greedy (eps=0) policy rollouts (alg/evaluate.py): returns
        (mean per-agent return [N], mean global return, aux dict).  The
        aux dict carries "act_dist" — the per-agent action distribution
        [N, A] the reference prints for checkers (evaluate.py:193-200) —
        plus any experiment eval metrics (roadway traffic metrics via
        hooks.eval_metrics_*, reference multicar_simple.py:117-255)."""
        hooks = self.eval_hooks
        env = hooks.env
        n = hooks.n_agents
        keys = prng.split_batch(key, n_eval)
        env_state, ts, goals = jax.vmap(hooks.episode_init)(keys)

        max_steps = self.cfg.max_steps
        n_act = self.alg.n_actions

        def body(carry, k):
            env_state, obs, a_prev, alive, ret_l, ret_g, acts, acc = carry
            actions = self.alg.act(ts_alg, obs, goals, a_prev, 0.0, k)
            if hasattr(env, "check_actions"):
                actions = jax.vmap(env.check_actions)(env_state, actions)
            env_state2, ts2 = jax.vmap(env.step)(env_state, actions)
            m = alive.astype(jnp.float32)
            ret_l = ret_l + ts2.reward_local * m[:, None]
            ret_g = ret_g + ts2.reward * m
            acts = acts + jnp.sum(
                jax.nn.one_hot(actions, n_act) * m[:, None, None], axis=0)
            acc = hooks.eval_metrics_step(acc, env_state2, ts2, alive)
            alive2 = alive & ~ts2.done
            obs2 = ts2.obs
            return (env_state2, obs2, actions, alive2, ret_l, ret_g,
                    acts, acc), ()

        init = (env_state, ts.obs, jnp.zeros((n_eval, n), jnp.int32),
                jnp.ones(n_eval, bool), jnp.zeros((n_eval, n)),
                jnp.zeros(n_eval), jnp.zeros((n, n_act)),
                hooks.eval_metrics_init())
        (_, _, _, _, ret_l, ret_g, acts, acc), _ = jax.lax.scan(
            body, init, jax.random.split(key, max_steps))
        act_dist = acts / jnp.maximum(jnp.sum(acts, -1, keepdims=True), 1.0)
        aux = dict(hooks.eval_metrics_final(acc, n_eval), act_dist=act_dist)
        return jnp.mean(ret_l, axis=0), jnp.mean(ret_g), aux

    # -------------------------------------------------------------- #

    def run(self, ts_alg, key, n_episodes: Optional[int] = None,
            log_fn: Optional[Callable[[Dict[str, Any]], None]] = None,
            example_transition=None, initial_episodes: int = 0):
        """Host training loop until `n_episodes` completed episodes.
        ``initial_episodes`` resumes the episode/epsilon schedule after an
        elastic restart (the replay buffer restarts empty and is warmed
        with policy rollouts for pretrain_episodes first).
        Returns (ts_alg, final stats dict)."""
        cfg = self.cfg
        n_episodes = n_episodes or cfg.N_train
        k_init, k_loop, k_eval = jax.random.split(key, 3)
        rs = init_rollout(self.hooks, k_init, self.n_envs, cfg.episode_log)
        if initial_episodes:
            rs = rs.replace(episodes=jnp.int32(initial_episodes))

        if example_transition is None:
            # build one transition template from the live rollout state
            e = self.n_envs
            n = self.hooks.n_agents
            dummy_ts = jax.vmap(self.hooks.env.step)(
                rs.env_state, jnp.zeros((e, n), jnp.int32))[1]
            tr = self._transition(rs, jnp.zeros((e, n), jnp.int32), dummy_ts,
                                  None)
            example_transition = jax.tree_util.tree_map(lambda x: x[0], tr)
        buf = self._replay_init(example_transition)
        if cfg.dual_buffer:
            rs = init_stage(rs, example_transition, self.n_envs,
                            cfg.max_steps)

        epsilon = max(cfg.epsilon_end, cfg.epsilon_start
                      - max(0, initial_episodes - cfg.pretrain_episodes)
                      * cfg.epsilon_step)
        last_logged_period = initial_episodes // cfg.period
        last_ep_flushed = initial_episodes
        chunk_idx = 0
        history = []
        t0 = time.time()
        episodes_done = initial_episodes
        while episodes_done < n_episodes:
            k = jax.random.fold_in(k_loop, chunk_idx)
            if episodes_done < cfg.pretrain_episodes:
                pretrain, fn = True, self._chunk_fill       # random fill
            elif episodes_done < initial_episodes + cfg.pretrain_episodes:
                pretrain, fn = True, self._chunk_warm       # resume warm-up
            else:
                pretrain, fn = False, self._chunk_train
            # the K-chunk dispatch evaluates the fill/train regime AND
            # epsilon on-device per chunk, so it is safe in the fill
            # phase and across the pretrain->train boundary; only the
            # resume warm-up (policy actions, no updates, episode count
            # already past pretrain) needs the host-paced path
            if cfg.chunks_per_sync > 1 and fn is not self._chunk_warm:
                ts_alg, buf, rs, metrics = self._chunk_train_k(
                    ts_alg, buf, rs, k, cfg.chunks_per_sync)
            else:
                ts_alg, buf, rs, metrics = fn(ts_alg, buf, rs, epsilon, k)
            chunk_idx += 1
            episodes_done = int(rs.episodes)  # one host sync per chunk
            if not pretrain:
                eps_decayed = (episodes_done - cfg.pretrain_episodes)
                epsilon = max(cfg.epsilon_end,
                              cfg.epsilon_start
                              - eps_decayed * cfg.epsilon_step)

            period_idx = episodes_done // cfg.period
            if period_idx > last_logged_period:
                last_logged_period = period_idx
                r_eval_local, r_eval_global, eval_aux = self._eval(
                    ts_alg, jax.random.fold_in(k_eval, period_idx),
                    cfg.N_eval)
                row = {
                    "episode": episodes_done,
                    "epsilon": epsilon,
                    "r_eval_local": np.asarray(r_eval_local),
                    "r_eval_global": float(r_eval_global),
                    "eval_action_dist":
                    np.asarray(eval_aux["act_dist"]).ravel(),
                    "r_train_local": np.asarray(rs.acc_ret_local)
                    / max(cfg.period, 1),
                    "r_train_global": float(rs.acc_ret_global)
                    / max(cfg.period, 1),
                    "duration_s": time.time() - t0,
                }
                if cfg.episode_log:
                    row["_episodes"] = flush_eplog(
                        rs.eplog, rs.eplog_ep, last_ep_flushed,
                        episodes_done)
                    last_ep_flushed = episodes_done
                if cfg.dual_buffer:
                    # dual-memory occupancy (reference stdout print,
                    # train_offpolicy.py:405-410); summed over shards
                    row["n_bad"] = int(np.sum(buf.bad.size))
                    row["n_good"] = int(np.sum(buf.good.size))
                if cfg.summarize and not pretrain:
                    row["_grads"] = self._grad_snap(
                        ts_alg, buf, epsilon,
                        jax.random.fold_in(k_eval, 1_000_000 + period_idx))
                row.update({k: float(v) for k, v in eval_aux.items()
                            if k != "act_dist"})
                row.update({k: float(v) for k, v in metrics.items()})
                history.append(row)
                if log_fn is not None:
                    log_fn(dict(row, _ts=ts_alg))
                rs = rs.replace(acc_ret_local=jnp.zeros_like(rs.acc_ret_local),
                                acc_ret_global=jnp.float32(0.0))
                t0 = time.time()

        return ts_alg, dict(episodes=episodes_done, history=history,
                            buffer=buf, rollout=rs, epsilon=epsilon)
