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


def _eval_eps(driver, hooks, ts, key, n_eval, epsilon, n_steps=20):
    """Stochastic-policy evaluation (mean global return over n_eval
    instances at exploration rate epsilon).

    The greedy evaluator is the WRONG transfer statistic here: checkers
    resets are deterministic given goals, so 32 greedy eval episodes are
    32 copies of ONE trajectory — a knife-edge number that flips whole
    points when a single argmax changes.  Epsilon-noise averaging makes
    the transfer margin continuous in policy quality."""
    from cm3_tpu.core import prng

    env = hooks.env
    keys = prng.split_batch(key, n_eval)
    env_state, tstep, goals = jax.vmap(hooks.episode_init)(keys)
    n = hooks.n_agents

    def body(carry, k):
        env_state, obs, a_prev, alive, ret_g = carry
        actions = driver.alg.act(ts, obs, goals, a_prev, epsilon, k)
        env_state2, ts2 = jax.vmap(env.step)(env_state, actions)
        ret_g = ret_g + ts2.reward * alive.astype(jnp.float32)
        return (env_state2, ts2.obs, actions, alive & ~ts2.done, ret_g), ()

    init = (env_state, tstep.obs, jnp.zeros((n_eval, n), jnp.int32),
            jnp.ones(n_eval, bool), jnp.zeros(n_eval))
    (_, _, _, _, ret_g), _ = jax.lax.scan(body, init,
                                          jax.random.split(key, n_steps))
    return float(jnp.mean(ret_g))


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

    # the grafted policy transfers: the 2-agent stochastic eval with the
    # stage-1 policy per agent must clearly beat a fresh random policy
    r_fresh = _eval_eps(d2, hooks2, ts2_fresh, jax.random.PRNGKey(8), 64,
                        0.2)
    r_graft = _eval_eps(d2, hooks2, ts2, jax.random.PRNGKey(8), 64, 0.2)
    assert r_graft > r_fresh + 0.5, (
        f"graft did not transfer: fresh {r_fresh:.2f} vs "
        f"grafted {r_graft:.2f}")

    # ---- stage 2 training continues to improve ----
    ts2, _ = d2.run(ts2, jax.random.PRNGKey(4), n_episodes=2500)
    r_s2 = _eval_eps(d2, hooks2, ts2, jax.random.PRNGKey(8), 64, 0.2)
    assert r_s2 > r_graft, (
        f"stage-2 training regressed: {r_graft:.2f} -> {r_s2:.2f}")
