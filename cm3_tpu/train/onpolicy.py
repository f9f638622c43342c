"""On-policy trainer.

Mirrors the reference ``alg/train_onpolicy.py``: transitions accumulate
for ``episodes_per_train`` episodes, then ``epochs`` minibatch updates run
back-to-back and the buffer is DISCARDED (:359-378); epsilon decays once
per training burst (:369-370).  Used for particle CM3 / IAC / COMA.

The vectorized version counts completed episodes across all lockstep
instances; rollout chunks and the update burst are each one jitted
program.  The env-vs-train wall-clock split the reference logs
(train_onpolicy.py:304,324,358,378) is kept in the stats rows.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core.config import TrainConfig
from cm3_tpu.replay import buffer as replay
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout, init_stage


class OnPolicyDriver(OffPolicyDriver):

    def __init__(self, hooks, alg, cfg: TrainConfig, eval_hooks=None):
        super().__init__(hooks, alg, cfg, eval_hooks)
        self._rollout = jax.jit(self._rollout_chunk, static_argnums=(4,),
                                donate_argnums=(1,))
        self._burst = jax.jit(self._train_burst)

    def _rollout_chunk(self, ts_alg, buf, rs, key, random_actions: bool,
                       epsilon=0.0):
        def body(carry, k):
            rs, buf = carry
            rs, buf = self._step_once(ts_alg, rs, buf, epsilon, k,
                                      random_actions=random_actions)
            return (rs, buf), ()

        (rs, buf), _ = jax.lax.scan(
            body, (rs, buf), jax.random.split(key, self.cfg.steps_per_train))
        return buf, rs

    def _train_burst(self, ts_alg, buf, epsilon, key):
        """epochs back-to-back minibatch updates (train_onpolicy.py:360-368)."""

        def body(ts_alg, k):
            k_s, k_u = jax.random.split(k)
            batch = self._replay_sample(buf, k_s)
            return self.alg.update(ts_alg, batch, epsilon, k_u)

        ts_alg, metrics = jax.lax.scan(
            body, ts_alg, jax.random.split(key, self.cfg.epochs))
        return ts_alg, {k: v[-1] for k, v in metrics.items()}

    def run(self, ts_alg, key, n_episodes: Optional[int] = None,
            log_fn: Optional[Callable[[Dict[str, Any]], None]] = None):
        cfg = self.cfg
        n_episodes = n_episodes or cfg.N_train
        k_init, k_loop, k_eval = jax.random.split(key, 3)
        rs = init_rollout(self.hooks, k_init, self.n_envs, cfg.episode_log)

        e, n = self.n_envs, self.hooks.n_agents
        dummy_ts = jax.vmap(self.hooks.env.step)(
            rs.env_state, jnp.zeros((e, n), jnp.int32))[1]
        tr = self._transition(rs, jnp.zeros((e, n), jnp.int32), dummy_ts, None)
        example = jax.tree_util.tree_map(lambda x: x[0], tr)
        buf = self._replay_init(example)
        if cfg.dual_buffer:
            rs = init_stage(rs, example, self.n_envs, cfg.max_steps)

        epsilon = cfg.epsilon_start
        episodes_done, last_train_eps, last_logged_period = 0, 0, 0
        last_ep_flushed = 0
        chunk_idx = 0
        history = []
        num_bad = num_good = 0  # cumulative routed counts (train_onpolicy.py:373-374)
        t_env = t_train = 0.0
        t0 = time.time()
        while episodes_done < n_episodes:
            k = jax.random.fold_in(k_loop, chunk_idx)
            chunk_idx += 1
            pretrain = episodes_done < cfg.pretrain_episodes
            te = time.time()
            buf, rs = self._rollout(ts_alg, buf, rs, k, pretrain, epsilon)
            episodes_done = int(rs.episodes)
            t_env += time.time() - te

            if (not pretrain and
                    episodes_done - last_train_eps >= cfg.episodes_per_train):
                tt = time.time()
                ts_alg, metrics = self._burst(ts_alg, buf,
                                              epsilon, jax.random.fold_in(k, 1))
                t_train += time.time() - tt
                last_train_eps = episodes_done
                # discard the on-policy buffer (train_onpolicy.py:372-377)
                if cfg.dual_buffer:
                    num_bad += int(np.sum(buf.bad.size))
                    num_good += int(np.sum(buf.good.size))
                    buf = replay.reset_dual(buf)
                else:
                    buf = buf.replace(insert=jnp.zeros_like(buf.insert),
                                      size=jnp.zeros_like(buf.size))
                if epsilon > cfg.epsilon_end:
                    epsilon = max(cfg.epsilon_end, epsilon - cfg.epsilon_step)

            period_idx = episodes_done // cfg.period
            if period_idx > last_logged_period:
                last_logged_period = period_idx
                r_eval_local, r_eval_global, eval_aux = self._eval(
                    ts_alg, jax.random.fold_in(k_eval, period_idx),
                    cfg.N_eval)
                row = {
                    "episode": episodes_done, "epsilon": epsilon,
                    "r_eval_local": np.asarray(r_eval_local),
                    "r_eval_global": float(r_eval_global),
                    "eval_action_dist":
                    np.asarray(eval_aux["act_dist"]).ravel(),
                    "r_train_local": np.asarray(rs.acc_ret_local)
                    / max(cfg.period, 1),
                    "r_train_global": float(rs.acc_ret_global)
                    / max(cfg.period, 1),
                    "t_env": t_env, "t_train": t_train,
                    "duration_s": time.time() - t0,
                }
                if cfg.episode_log:
                    from cm3_tpu.train.offpolicy import flush_eplog
                    row["_episodes"] = flush_eplog(
                        rs.eplog, rs.eplog_ep, last_ep_flushed,
                        episodes_done)
                    last_ep_flushed = episodes_done
                if cfg.dual_buffer:
                    row["n_bad"] = num_bad
                    row["n_good"] = num_good
                filled = ((int(np.sum(buf.bad.size))
                           + int(np.sum(buf.good.size)))
                          if cfg.dual_buffer else int(np.sum(buf.size)))
                if (cfg.summarize and filled > 0
                        and episodes_done > cfg.pretrain_episodes):
                    row["_grads"] = self._grad_snap(
                        ts_alg, buf, epsilon,
                        jax.random.fold_in(k_eval, 1_000_000 + period_idx))
                row.update({k: float(v) for k, v in eval_aux.items()
                            if k != "act_dist"})
                history.append(row)
                if log_fn is not None:
                    log_fn(dict(row, _ts=ts_alg))
                rs = rs.replace(
                    acc_ret_local=jnp.zeros_like(rs.acc_ret_local),
                    acc_ret_global=jnp.float32(0.0))
                t0 = time.time()

        return ts_alg, dict(episodes=episodes_done, history=history,
                            epsilon=epsilon, t_env=t_env, t_train=t_train)
