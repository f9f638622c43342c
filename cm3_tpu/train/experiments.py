"""Per-experiment episode hooks: env construction, per-episode goal
sampling, and batch assembly.

Mirrors the reference's per-experiment branches in
``alg/train_offpolicy.py:89-127`` (env construction) and ``:243-300``
(per-episode goal/env setup), as pure functions usable inside jit.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from cm3_tpu.core import config as cfgmod
from cm3_tpu.envs import base


class Hooks:
    """Experiment adapter consumed by the drivers."""

    experiment: str
    env: base.Env
    n_agents: int
    l_goal: int
    has_a_prev: bool = False

    def episode_init(self, key):
        """-> (env_state, timestep, goals [N, l_goal])"""
        raise NotImplementedError

    # dual-buffer routing threshold (reference master config "threshold";
    # only the roadway/SUMO predicate uses it)
    threshold: float = 16.0

    def is_bad_episode(self, env_state, ep_return_local):
        """Dual-buffer routing predicate, evaluated per env instance on
        the POST-step (pre-reset) env state and the episode's accumulated
        local returns (train_offpolicy.py:370-374).  The reference only
        routes sumo/particle episodes; everything else lands in the
        "good" memory (checkers episodes are silently never added there —
        a latent reference bug we do not preserve)."""
        return jnp.bool_(False)

    # ---- eval-time auxiliary metrics (roadway traffic metrics; the
    # reference computes them in multicar_simple.py:117-255 during SUMO
    # eval rollouts) ----

    def eval_metrics_init(self):
        """-> dict of scalar accumulators threaded through the eval scan."""
        return {}

    def eval_metrics_step(self, acc, env_state, ts, alive):
        """Accumulate one lockstep eval transition.  ``env_state``/``ts``
        are post-step, ``alive`` [E] is the pre-step liveness mask."""
        return acc

    def eval_metrics_final(self, acc, n_eval: int):
        """-> dict of scalar metrics for the eval row."""
        return {}


class CheckersHooks(Hooks):
    """Goals: random green/orange for n=1, identity for n>1
    (train_offpolicy.py:291-298)."""

    experiment = "checkers"
    has_a_prev = True

    def __init__(self, env):
        self.env = env
        self.n_agents = env.cfg.n_agents
        self.l_goal = 2

    def episode_init(self, key):
        k_goal, k_env = jax.random.split(key)
        n = self.n_agents
        if n == 1:
            idx = jax.random.randint(k_goal, (), 0, 2)
            goals = jax.nn.one_hot(idx, 2, dtype=jnp.float32)[None]
        else:
            goals = jnp.eye(n, 2, dtype=jnp.float32)
        state, ts = self.env.reset(k_env, goals)
        return state, ts, goals


class ParticleHooks(Hooks):
    """Goals are the landmark positions chosen by reset
    (train_offpolicy.py:286-290)."""

    experiment = "particle"

    def __init__(self, env):
        self.env = env
        self.n_agents = env.cfg.n_agents
        self.l_goal = 2

    def episode_init(self, key):
        state, ts = self.env.reset(key, None)
        return state, ts, state.landmarks

    def is_bad_episode(self, env_state, ep_return_local):
        # scenario.collisions != 0 (train_offpolicy.py:373-374); the env
        # state's counter is cumulative over the episode and cleared on
        # reset, exactly the scenario attribute the reference reads
        return env_state.collisions != 0

    def eval_metrics_init(self):
        z = jnp.float32(0.0)
        return dict(reached=z, episodes=z)

    def eval_metrics_step(self, acc, env_state, ts, alive):
        """Goal-reach rate at episode end — the scenario's success
        criterion (multi-goal_spread.py:126-129: dist <= 0.05)."""
        done_now = (alive & ts.done).astype(jnp.float32)
        frac = jnp.mean(env_state.reached.astype(jnp.float32), axis=-1)
        return dict(reached=acc["reached"] + jnp.sum(frac * done_now),
                    episodes=acc["episodes"] + jnp.sum(done_now))

    def eval_metrics_final(self, acc, n_eval: int):
        return {"eval_reach_rate": acc["reached"]
                / jnp.maximum(acc["episodes"], 1.0)}


class RoadwayHooks(Hooks):
    """Goal lane one-hot; with prob_random the initial lane and goal lane
    are uniform random (train_offpolicy.py:252-277)."""

    experiment = "roadway"

    def __init__(self, env):
        self.env = env
        self.n_agents = env.cfg.n_agents
        self.l_goal = 4

    def episode_init(self, key):
        k_rand, k_lane, k_goal, k_env = jax.random.split(key, 4)
        c = self.env.cfg
        n = self.n_agents
        use_random = jax.random.uniform(k_rand) < c.prob_random
        lanes_rand = jax.random.randint(k_lane, (n,), 0, c.n_lanes)
        goal_rand = jax.random.randint(k_goal, (n,), 0, self.l_goal)
        lanes = jnp.where(use_random, lanes_rand,
                          jnp.asarray(c.lane, jnp.int32))
        goal_lanes = jnp.where(use_random, goal_rand,
                               jnp.asarray(c.goal_lane, jnp.int32))
        goals = jax.nn.one_hot(goal_lanes, self.l_goal, dtype=jnp.float32)
        state, ts = self.env.reset(k_env, dict(lanes=lanes,
                                               goal_lanes=goal_lanes))
        return state, ts, goals

    def is_bad_episode(self, env_state, ep_return_local):
        # sum(r_local) < threshold (train_offpolicy.py:372)
        return jnp.sum(ep_return_local) < self.threshold

    def eval_metrics_init(self):
        z = jnp.float32(0.0)
        return dict(speed_sum=z, speed_n=z, close=z, success=z)

    def eval_metrics_step(self, acc, env_state, ts, alive):
        """Traffic metrics over the eval rollouts: normalized average
        speed (multicar_simple.py:158-166), close-follower pair count
        (:170-225) summed per step, and merge-success count (:227-239)
        snapshotted at episode end."""
        m = alive.astype(jnp.float32)
        speed = jax.vmap(self.env.avg_speed)(env_state)
        close = jax.vmap(self.env.count_close)(env_state)
        success = jax.vmap(self.env.count_success)(env_state)
        done_now = (alive & ts.done).astype(jnp.float32)
        return dict(
            speed_sum=acc["speed_sum"] + jnp.sum(speed * m),
            speed_n=acc["speed_n"] + jnp.sum(m),
            close=acc["close"] + jnp.sum(close.astype(jnp.float32) * m),
            success=acc["success"]
            + jnp.sum(success.astype(jnp.float32) * done_now))

    def eval_metrics_final(self, acc, n_eval: int):
        return {
            "eval_avg_speed": acc["speed_sum"]
            / jnp.maximum(acc["speed_n"], 1.0),
            "eval_count_close": acc["close"] / n_eval,
            "eval_count_success": acc["success"] / n_eval,
        }


def make_hooks(experiment: str, env, threshold: float = 16.0) -> Hooks:
    hooks = {"checkers": CheckersHooks, "particle": ParticleHooks,
             "roadway": RoadwayHooks}[experiment](env)
    hooks.threshold = threshold
    return hooks
