"""End-to-end CM3 training on the roadway engine (stage 1)."""

import pytest

pytestmark = [pytest.mark.slow]


import jax
import jax.numpy as jnp

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import AlgConfig, RoadwayEnvConfig, TrainConfig
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout


def test_roadway_stage1_cm3_learns():
    env_cfg = RoadwayEnvConfig(
        n_agents=1, goal_lane=(0,), goal_pos=(190.0,), speed=(30.0,),
        lane=(0,), init_position=(0.0,), depart_mean=(0.0,),
        depart_stdev=0.4, prob_random=1.0)
    env = Roadway(env_cfg)
    alg = CM3("roadway", env.spec(), AlgConfig(n_agents=1, stage=1))
    cfg = TrainConfig(n_envs=8, batch_size=64, buffer_size=8192,
                      pretrain_episodes=16, steps_per_train=10,
                      period=400, N_eval=16, max_steps=env_cfg.max_step + 2,
                      epsilon_div=400.0)
    hooks = make_hooks("roadway", env)
    driver = OffPolicyDriver(hooks, alg, cfg)

    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)

    r_l0, r_g0, _ = driver._eval(ts, jax.random.PRNGKey(7), 16)
    ts, stats = driver.run(ts, key, n_episodes=2000)
    r_l1, r_g1, _ = driver._eval(ts, jax.random.PRNGKey(7), 16)

    # fully-random start/goal lanes: an untrained policy averages ~7
    # (shaped partial-goal rewards); trained CM3 must clear ~9 —
    # the reference's stage-1 save_threshold region
    # (config_sumo_stage1.json:14)
    assert float(r_g1) > 8.5 and float(r_g1) > float(r_g0), (
        f"insufficient learning: {float(r_g0):.2f} -> {float(r_g1):.2f}")
