"""Multi-device (8 virtual CPU) sharding tests: the full training chunk
runs SPMD over a data mesh and matches single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig, NNConfig,
                                 TrainConfig)
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.parallel import mesh as meshlib
from cm3_tpu.replay import buffer as replay
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout

pytestmark = [pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices"),
              pytest.mark.slow]


def _setup(n_envs):
    env = Checkers(CheckersEnvConfig(n_columns=4, agents_r=(0, 2),
                                     agents_c=(4, 4), n_agents=2,
                                     max_steps=20))
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2),
              NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32,
                       A_n_h2=32))
    cfg = TrainConfig(n_envs=n_envs, batch_size=32, buffer_size=512,
                      steps_per_train=5, updates_per_chunk=2, max_steps=20)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)
    rs = init_rollout(hooks, jax.random.PRNGKey(0), n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    e, n = n_envs, 2
    dummy_ts = jax.vmap(env.step)(rs.env_state, jnp.zeros((e, n), jnp.int32))[1]
    tr = driver._transition(rs, jnp.zeros((e, n), jnp.int32), dummy_ts, None)
    example = jax.tree_util.tree_map(lambda x: x[0], tr)
    buf = replay.init(example, cfg.buffer_size)
    return driver, ts, buf, rs


def test_sharded_chunk_matches_single_device():
    n_envs = 16
    driver, ts, buf, rs = _setup(n_envs)
    key = jax.random.PRNGKey(5)

    # single-device baseline
    ts1, buf1, rs1, m1 = driver._chunk_train(ts, buf, rs, 0.3, key)

    # sharded over an 8-device data mesh
    m = meshlib.make_mesh(8)
    driver2, ts_s, buf_s, rs_s = _setup(n_envs)
    ts_s, buf_s, rs_s = meshlib.shard_driver_state(m, ts_s, buf_s, rs_s,
                                                   n_envs)
    ts2, buf2, rs2, m2 = driver2._chunk_train(ts_s, buf_s, rs_s, 0.3, key)

    # same numerics (same program, different layout)
    np.testing.assert_allclose(float(m1["loss_Q_global"]),
                               float(m2["loss_Q_global"]), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(rs1.episodes),
                                  np.asarray(rs2.episodes))
    for a, b in zip(jax.tree_util.tree_leaves(ts1.actor),
                    jax.tree_util.tree_leaves(ts2.actor)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-5)

    # outputs keep the data sharding (no silent full-replication)
    env_leaf = jax.tree_util.tree_leaves(rs2.env_state)[0]
    assert not env_leaf.sharding.is_fully_replicated


def test_eval_under_mesh():
    n_envs = 16
    driver, ts, buf, rs = _setup(n_envs)
    m = meshlib.make_mesh(8)
    ts_r = meshlib.replicate(ts, m)
    r_l, r_g, _ = driver._eval(ts_r, jax.random.PRNGKey(3), 16)
    assert np.isfinite(float(r_g))


def test_mesh_helpers():
    m = meshlib.make_mesh(4)
    assert m.shape["data"] == 4
    x = jnp.zeros((8, 3))
    t = meshlib.shard_leading_axis({"a": x, "b": jnp.zeros(5)}, m, 8)
    assert not t["a"].sharding.is_fully_replicated
    assert t["b"].sharding.is_fully_replicated
