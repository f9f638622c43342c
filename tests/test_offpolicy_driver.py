"""Off-policy driver integration tests on Checkers.

The full reference budget (50k episodes) is a hardware run; here we check
the minimum end-to-end slice: the driver trains stage-1 CM3 on vectorized
Checkers and the greedy eval return moves well above the random-policy
baseline (SURVEY.md §7 build order item 2).
"""

import pytest

pytestmark = [pytest.mark.slow]


import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig, NNConfig,
                                 TrainConfig)
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout


def _small_nn():
    # shrink nets so the CPU test is quick; architecture unchanged
    return NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32, A_n_h2=32)


def _setup(n_envs=8, max_steps=20):
    env_cfg = CheckersEnvConfig(n_columns=4, agents_r=(0,), agents_c=(4,),
                                n_agents=1, max_steps=max_steps)
    env = Checkers(env_cfg)
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=1, stage=1),
              _small_nn())
    cfg = TrainConfig(n_envs=n_envs, batch_size=32, buffer_size=2000,
                      pretrain_episodes=20, steps_per_train=10,
                      period=100, N_eval=8, max_steps=max_steps,
                      epsilon_div=200.0)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)
    return env, alg, cfg, hooks, driver


def test_rollout_state_and_chunk():
    env, alg, cfg, hooks, driver = _setup()
    rs = init_rollout(hooks, jax.random.PRNGKey(0), cfg.n_envs)
    assert rs.goals.shape == (cfg.n_envs, 1, 2)
    # goals one-hot
    np.testing.assert_allclose(np.asarray(rs.goals.sum(-1)), 1.0)


def test_driver_short_run_improves_over_random():
    env, alg, cfg, hooks, driver = _setup()
    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)

    r_local0, r_global0, _ = driver._eval(ts, jax.random.PRNGKey(7), 16)
    ts, stats = driver.run(ts, key, n_episodes=2000)
    r_local1, r_global1, _ = driver._eval(ts, jax.random.PRNGKey(7), 16)

    # single-agent 3x4 Checkers: 6 collectible greens (max +6); random
    # policy scores ~<1, the trained greedy policy must be clearly better
    assert float(r_global1) > 2.0, (
        f"insufficient learning: {float(r_global0):.2f} -> "
        f"{float(r_global1):.2f}")
    assert stats["episodes"] >= 2000
    assert len(stats["history"]) >= 1
    # epsilon decayed
    assert stats["epsilon"] < cfg.epsilon_start


def test_chunks_per_sync_scanned_path():
    """chunks_per_sync>1 runs K chunks per dispatch with on-device
    epsilon decay; schedule and learning signals stay sane."""
    import dataclasses

    env, alg, cfg, hooks, driver = _setup()
    cfg = dataclasses.replace(cfg, chunks_per_sync=4)
    driver = OffPolicyDriver(hooks, alg, cfg)
    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    ts, stats = driver.run(ts, key, n_episodes=400)
    assert stats["episodes"] >= 400
    # epsilon decayed on device past the pretrain threshold
    expected = max(cfg.epsilon_end, cfg.epsilon_start
                   - (stats["episodes"] - cfg.pretrain_episodes)
                   * cfg.epsilon_step)
    assert abs(stats["epsilon"] - expected) < cfg.epsilon_step * \
        cfg.chunks_per_sync * cfg.n_envs * 5
    assert len(stats["history"]) >= 1


def test_chunks_scanned_respects_pretrain_boundary():
    """A K-chunk dispatch that straddles the pretrain->train boundary
    must fill (random actions, no update applied) while
    episodes < pretrain_episodes and only train afterwards — evaluated
    ON DEVICE per chunk (VERDICT r2 item 8)."""
    import dataclasses

    from cm3_tpu.replay import buffer as replay

    env, alg, cfg, hooks, driver = _setup(n_envs=4, max_steps=10)
    # ~4 episodes complete per chunk (4 envs x 10 steps / max_steps 10),
    # so pretrain_episodes=8 is crossed inside a 6-chunk dispatch
    cfg = dataclasses.replace(cfg, chunks_per_sync=6, pretrain_episodes=8,
                              updates_per_chunk=1, steps_per_train=10)
    driver = OffPolicyDriver(hooks, alg, cfg)
    key = jax.random.PRNGKey(0)
    rs = init_rollout(hooks, key, cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    zeros = jnp.zeros((cfg.n_envs, 1), jnp.int32)
    dummy = jax.vmap(env.step)(rs.env_state, zeros)[1]
    example = jax.tree_util.tree_map(
        lambda x: x[0], driver._transition(rs, zeros, dummy, None))

    # boundary mid-dispatch: some chunks fill, some train
    buf = replay.init(example, cfg.buffer_size)
    ts2, _, rs2, metrics = driver._chunk_train_k(ts, buf, rs, key, 6)
    trained = int(metrics["trained_chunks"])
    assert 0 < trained < 6, f"boundary not inside dispatch: {trained}"
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(ts),
                        jax.tree_util.tree_leaves(ts2)))
    assert changed, "post-boundary chunks must apply updates"

    # entirely below the boundary: params must be untouched bit-exactly
    cfg3 = dataclasses.replace(cfg, pretrain_episodes=10_000)
    driver3 = OffPolicyDriver(hooks, alg, cfg3)
    buf3 = replay.init(example, cfg.buffer_size)
    ts3, _, _, m3 = driver3._chunk_train_k(ts, buf3, rs, key, 6)
    assert int(m3["trained_chunks"]) == 0
    for a, b in zip(jax.tree_util.tree_leaves(ts),
                    jax.tree_util.tree_leaves(ts3)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
