"""End-to-end CM3 curriculum: stage-1 single-agent training -> stage-2
graft -> two-agent training (SURVEY.md §7 build-order item 3)."""

import pytest

pytestmark = [pytest.mark.slow]


import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig, NNConfig,
                                 TrainConfig)
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.train import checkpoint
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout


def _nn():
    return NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32, A_n_h2=32)


def _driver(stage, n_agents, max_steps=20):
    if n_agents == 1:
        env_cfg = CheckersEnvConfig(n_columns=4, agents_r=(0,), agents_c=(4,),
                                    n_agents=1, max_steps=max_steps)
    else:
        env_cfg = CheckersEnvConfig(n_columns=4, agents_r=(0, 2),
                                    agents_c=(4, 4), n_agents=2,
                                    max_steps=max_steps)
    env = Checkers(env_cfg)
    alg = CM3("checkers", env.spec(),
              AlgConfig(n_agents=n_agents, stage=stage), _nn())
    cfg = TrainConfig(n_envs=8, batch_size=32, buffer_size=4000,
                      pretrain_episodes=20, steps_per_train=10,
                      period=1000, N_eval=16, max_steps=max_steps,
                      epsilon_div=500.0)
    hooks = make_hooks("checkers", env)
    return OffPolicyDriver(hooks, alg, cfg), alg, cfg, hooks


def test_full_curriculum():
    key = jax.random.PRNGKey(0)

    # ---- stage 1: single agent ----
    d1, alg1, cfg1, hooks1 = _driver(stage=1, n_agents=1)
    rs1 = init_rollout(hooks1, key, cfg1.n_envs)
    ts1 = alg1.init_state(jax.random.PRNGKey(1), rs1.obs, rs1.state,
                          rs1.goals)
    ts1, _ = d1.run(ts1, key, n_episodes=2500)
    r_l1, r_g1, _ = d1._eval(ts1, jax.random.PRNGKey(7), 32)
    assert float(r_g1) > 2.0, f"stage-1 did not learn: {float(r_g1):.2f}"

    # ---- graft into stage 2 ----
    d2, alg2, cfg2, hooks2 = _driver(stage=2, n_agents=2)
    rs2 = init_rollout(hooks2, jax.random.PRNGKey(2), cfg2.n_envs)
    ts2_fresh = alg2.init_state(jax.random.PRNGKey(3), rs2.obs, rs2.state,
                                rs2.goals)
    ts2 = checkpoint.stage2_init_cm3(ts2_fresh, ts1.actor, ts1.qg)

    # the grafted policy transfers: the 2-agent eval with the stage-1
    # policy per agent should already beat a fresh random policy clearly
    r_fresh_l, r_fresh, _ = d2._eval(ts2_fresh, jax.random.PRNGKey(8), 32)
    r_graft_l, r_graft, _ = d2._eval(ts2, jax.random.PRNGKey(8), 32)
    # (the tiny 3x4 test board makes two agents interfere heavily, so
    # the transfer margin is modest but must be clearly positive)
    assert float(r_graft) > float(r_fresh) + 0.3, (
        f"graft did not transfer: fresh {float(r_fresh):.2f} vs "
        f"grafted {float(r_graft):.2f}")

    # ---- stage 2 training continues to improve ----
    ts2, _ = d2.run(ts2, jax.random.PRNGKey(4), n_episodes=2500)
    r_l2, r_g2, _ = d2._eval(ts2, jax.random.PRNGKey(8), 32)
    assert float(r_g2) > float(r_graft), (
        f"stage-2 training regressed: {float(r_graft):.2f} -> "
        f"{float(r_g2):.2f}")
