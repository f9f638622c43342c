"""On-policy driver integration: particle stage-1 CM3 learns to approach
its landmark (reward = -distance, so less negative is better)."""

import pytest

pytestmark = [pytest.mark.slow]


import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import AlgConfig, ParticleEnvConfig, TrainConfig
from cm3_tpu.envs.particle import Particle
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.onpolicy import OnPolicyDriver
from cm3_tpu.train.offpolicy import init_rollout


def test_onpolicy_particle_stage1_learns():
    env_cfg = ParticleEnvConfig(
        n_agents=1, agents_x=(-1.0,), agents_y=(-1.0,), landmarks_x=(1.0,),
        landmarks_y=(1.0,), initial_std=0.0, prob_random=0.2, max_steps=33)
    env = Particle(env_cfg)
    alg = CM3("particle", env.spec(), AlgConfig(n_agents=1, stage=1))
    cfg = TrainConfig(n_envs=8, batch_size=64, buffer_size=8192,
                      pretrain_episodes=16, steps_per_train=16,
                      episodes_per_train=10, epochs=24, period=400,
                      N_eval=16, max_steps=33, epsilon_div=300.0)
    hooks = make_hooks("particle", env)
    driver = OnPolicyDriver(hooks, alg, cfg)

    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)

    r_l0, r_g0, _ = driver._eval(ts, jax.random.PRNGKey(7), 16)
    ts, stats = driver.run(ts, key, n_episodes=1600)
    r_l1, r_g1, _ = driver._eval(ts, jax.random.PRNGKey(7), 16)

    # random policy wanders: return ~ -(dist ~2.8)*33 ~ -90; trained policy
    # drives toward the landmark so the return must improve substantially
    assert float(r_g1) > float(r_g0) + 10.0, (
        f"no improvement: {float(r_g0):.1f} -> {float(r_g1):.1f}")
    assert stats["t_env"] > 0 and stats["t_train"] > 0
