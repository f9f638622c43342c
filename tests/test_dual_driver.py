"""Dual (bad/good) replay buffer wired into the drivers.

The reference stages each episode in a Python list and routes it whole
into memory_1 (bad) or memory_2 (good) at episode end
(``alg/train_offpolicy.py:335-344,370-374``;
``alg/train_onpolicy.py:355-357``; ``alg/replay_buffer_dual.py``).  The
vectorized drivers stage per-instance episode slabs and flush at
auto-reset; these tests prove the routing is episode-exact.
"""

import pytest

pytestmark = [pytest.mark.slow]


import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cm3_tpu.core.config import (AlgConfig, ParticleEnvConfig,
                                 RoadwayEnvConfig, TrainConfig)
from cm3_tpu.envs import base
from cm3_tpu.train.experiments import Hooks, make_hooks
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout


# --------------------------------------------------------------------- #
# a deterministic toy env: every episode lasts exactly T steps and pays
# its reset-drawn value `val` per step, so bad/good membership of every
# stored transition is decidable from the transition itself
# --------------------------------------------------------------------- #

EP_LEN = 4


@struct.dataclass
class ToyState:
    val: jax.Array
    t: jax.Array


class ToyEnv(base.Env):

    def spec(self):
        return {"n_agents": 1, "n_actions": 3}

    def reset(self, key, goals):
        val = jax.random.uniform(key)
        state = ToyState(val=val, t=jnp.int32(0))
        return state, self._ts(state, reward=jnp.float32(0.0),
                               done=jnp.bool_(False))

    def step(self, state, actions):
        t2 = state.t + 1
        state2 = state.replace(t=t2)
        return state2, self._ts(state2, reward=state.val,
                                done=t2 >= EP_LEN)

    def _ts(self, state, reward, done):
        return base.TimeStep(
            obs={"o": state.val[None, None]},
            state={"s": state.val[None]},
            reward=reward, reward_local=reward[None], done=done)


class ToyHooks(Hooks):
    experiment = "toy"

    def __init__(self, env):
        self.env = env
        self.n_agents = 1
        self.l_goal = 1

    def episode_init(self, key):
        state, ts = self.env.reset(key, None)
        return state, ts, jnp.zeros((1, 1))

    def is_bad_episode(self, env_state, ep_return_local):
        # episode return = EP_LEN * val; bad iff val < 0.5
        return jnp.sum(ep_return_local) < 0.5 * EP_LEN


class _RandomOnlyAlg:
    """Just enough alg surface for the random-action fill path."""

    n_actions = 3


def _toy_driver(n_envs=16):
    cfg = TrainConfig(n_envs=n_envs, dual_buffer=True, buffer_size=4096,
                      max_steps=EP_LEN, steps_per_train=8,
                      pretrain_episodes=10**9, period=10**9, batch_size=16)
    hooks = ToyHooks(ToyEnv())
    return OffPolicyDriver(hooks, _RandomOnlyAlg(), cfg), hooks, cfg


def test_episode_exact_routing():
    driver, hooks, cfg = _toy_driver()
    ts, stats = driver.run(None, jax.random.PRNGKey(0), n_episodes=60)
    buf = stats["buffer"]
    n_bad, n_good = int(buf.bad.size), int(buf.good.size)

    # every completed episode flushed whole: EP_LEN rows each
    assert n_bad + n_good == stats["episodes"] * EP_LEN
    assert n_bad % EP_LEN == 0 and n_good % EP_LEN == 0
    # with uniform val both memories should be populated
    assert n_bad > 0 and n_good > 0

    # membership decidable per row: rl == val, bad iff val < 0.5
    bad_rl = np.asarray(buf.bad.data["rl"])[:n_bad]
    good_rl = np.asarray(buf.good.data["rl"])[:n_good]
    assert (bad_rl < 0.5).all(), bad_rl.max()
    assert (good_rl >= 0.5).all(), good_rl.min()


def test_routing_respects_in_flight_episodes():
    """Transitions of UNFINISHED episodes must not be in either memory."""
    driver, hooks, cfg = _toy_driver(n_envs=8)
    ts, stats = driver.run(None, jax.random.PRNGKey(3), n_episodes=16)
    buf = stats["buffer"]
    total = int(buf.bad.size) + int(buf.good.size)
    # flushed count is a multiple of the fixed episode length even though
    # the driver ran a partial chunk past the episode target
    assert total == stats["episodes"] * EP_LEN


# --------------------------------------------------------------------- #
# real-env integration: the full off-policy train path with dual
# sampling (roadway predicate: sum(r_local) < threshold)
# --------------------------------------------------------------------- #


def test_roadway_offpolicy_dual_trains():
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.envs.roadway import Roadway

    env_cfg = RoadwayEnvConfig(
        n_agents=1, goal_lane=(0,), goal_pos=(190.0,), speed=(30.0,),
        lane=(0,), init_position=(0.0,), depart_mean=(0.0,),
        depart_stdev=0.4, prob_random=1.0)
    env = Roadway(env_cfg)
    alg = CM3("roadway", env.spec(), AlgConfig(n_agents=1, stage=1))
    cfg = TrainConfig(n_envs=8, dual_buffer=True, threshold=9.0,
                      batch_size=32, buffer_size=4096,
                      pretrain_episodes=16, steps_per_train=10,
                      period=64, N_eval=4, max_steps=env_cfg.max_step + 2,
                      epsilon_div=100.0, updates_per_chunk=2)
    hooks = make_hooks("roadway", env, threshold=cfg.threshold)
    driver = OffPolicyDriver(hooks, alg, cfg)

    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    ts, stats = driver.run(ts, key, n_episodes=160)

    buf = stats["buffer"]
    assert int(buf.bad.size) + int(buf.good.size) > 0
    # log rows surface the dual occupancy
    assert "n_bad" in stats["history"][-1]
    assert stats["history"][-1]["n_bad"] + stats["history"][-1]["n_good"] > 0


def test_particle_onpolicy_dual_collision_routing():
    """On-policy particle: collision episodes route bad; the burst
    discard resets BOTH memories (train_onpolicy.py:372-377)."""
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.envs.particle import Particle
    from cm3_tpu.train.onpolicy import OnPolicyDriver

    env_cfg = ParticleEnvConfig(n_agents=2, agents_x=(-0.2, 0.2),
                                agents_y=(0.0, 0.0),
                                landmarks_x=(0.2, -0.2),
                                landmarks_y=(0.0, 0.0),
                                prob_random=0.0, max_steps=12)
    env = Particle(env_cfg)
    alg = CM3("particle", env.spec(), AlgConfig(n_agents=2, stage=2))
    cfg = TrainConfig(n_envs=8, dual_buffer=True, batch_size=32,
                      buffer_size=2048, pretrain_episodes=8,
                      steps_per_train=12, episodes_per_train=16, epochs=2,
                      period=48, N_eval=4, max_steps=12, epsilon_div=100.0)
    hooks = make_hooks("particle", env)
    driver = OnPolicyDriver(hooks, alg, cfg)

    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    ts, stats = driver.run(ts, key, n_episodes=96)

    row = stats["history"][-1]
    # crossing agents collide: some episodes must have routed bad, and
    # the cumulative counters only grow via pre-discard snapshots
    assert row["n_bad"] + row["n_good"] > 0
    assert row["n_bad"] > 0


def test_roadway_eval_rows_carry_traffic_metrics():
    """Eval rows surface avg_speed / count_close / count_success
    (reference multicar_simple.py:117-255)."""
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.envs.roadway import Roadway

    env_cfg = RoadwayEnvConfig(
        n_agents=2, goal_lane=(3, 0), goal_pos=(190.0, 190.0),
        speed=(30.0, 30.0), lane=(1, 2), init_position=(0.0, 0.0),
        depart_mean=(0.0, 0.0), depart_stdev=0.5, prob_random=0.2)
    env = Roadway(env_cfg)
    alg = CM3("roadway", env.spec(), AlgConfig(n_agents=2, stage=2))
    cfg = TrainConfig(n_envs=4, batch_size=16, buffer_size=1024,
                      pretrain_episodes=4, steps_per_train=10, period=16,
                      N_eval=8, max_steps=env_cfg.max_step + 2,
                      updates_per_chunk=1)
    hooks = make_hooks("roadway", env)
    driver = OffPolicyDriver(hooks, alg, cfg)

    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)

    r_l, r_g, aux = driver._eval(ts, jax.random.PRNGKey(7), 8)
    for k in ("eval_avg_speed", "eval_count_close", "eval_count_success"):
        assert k in aux, aux.keys()
        assert np.isfinite(float(aux[k]))
    # normalized average speed of live cars is positive and sane
    assert 0.0 < float(aux["eval_avg_speed"]) < 3.0

    ts, stats = driver.run(ts, key, n_episodes=40)
    row = stats["history"][-1]
    assert "eval_avg_speed" in row and "eval_count_success" in row
