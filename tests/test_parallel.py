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


def _setup_sharded(n_envs, shards):
    import dataclasses
    driver, ts, buf, rs = _setup(n_envs)
    driver.cfg = dataclasses.replace(driver.cfg, replay_shards=shards)
    e, n = n_envs, 2
    env = driver.hooks.env
    dummy_ts = jax.vmap(env.step)(rs.env_state,
                                  jnp.zeros((e, n), jnp.int32))[1]
    tr = driver._transition(rs, jnp.zeros((e, n), jnp.int32), dummy_ts, None)
    example = jax.tree_util.tree_map(lambda x: x[0], tr)
    buf = driver._replay_init(example)
    return driver, ts, buf, rs


def test_sharded_replay_membership_and_cursors():
    """Shard-local replay: rows from env block d land in ring shard d,
    and each sampled row comes from its own shard's contents."""
    shards = 8
    key = jax.random.PRNGKey(0)
    example = {"x": jnp.zeros((), jnp.float32)}
    buf = replay.init_sharded(example, 64 * shards, shards)
    # distinct values per env: env i writes value i; envs 0..15 -> shard
    # i // 2
    vals = jnp.arange(16, dtype=jnp.float32)
    buf = replay.add_batch_sharded(buf, {"x": vals}, shards)
    np.testing.assert_array_equal(np.asarray(buf.size),
                                  np.full(shards, 2, np.int32))
    stored = np.asarray(buf.data["x"])[:, :2]          # [D, 2]
    np.testing.assert_array_equal(stored.ravel(), np.arange(16))
    batch = replay.sample_sharded(buf, key, 32, shards)
    got = np.asarray(batch["x"]).reshape(shards, 4)    # rows per shard
    for d in range(shards):
        assert set(got[d]).issubset({2 * d, 2 * d + 1}), (d, got[d])


def test_sharded_sample_lowers_without_gather_collectives():
    """The whole point of shard-local replay (SURVEY §7): sampling must
    not gather across devices.  Lower the sharded sample with the
    multi-chip shardings and assert the optimized HLO has no gather/
    all-to-all collectives (the legacy capacity-sharded ring does)."""
    shards = 8
    m = meshlib.make_mesh(8)
    example = {"x": jnp.zeros((7,), jnp.float32)}
    buf = replay.init_sharded(example, 64 * shards, shards)
    from jax.sharding import NamedSharding, PartitionSpec as P
    data = NamedSharding(m, P("data"))
    buf = jax.tree_util.tree_map(lambda x: jax.device_put(x, data), buf)

    fn = jax.jit(lambda b, k: replay.sample_sharded(b, k, 64, shards))
    txt = fn.lower(buf, jax.random.PRNGKey(0)).compile().as_text()
    for coll in ("all-gather", "all-to-all", "collective-permute"):
        assert coll not in txt, f"sharded sample lowered a {coll}"

    # contrast: the legacy capacity-sharded single ring must gather
    buf1 = replay.init(example, 64 * shards)
    cap = 64 * shards
    buf1 = buf1.replace(
        data=meshlib.shard_leading_axis(buf1.data, m, cap),
        insert=jax.device_put(buf1.insert, NamedSharding(m, P())),
        size=jax.device_put(buf1.size, NamedSharding(m, P())))
    fn1 = jax.jit(lambda b, k: replay.sample(b, k, 64))
    txt1 = fn1.lower(buf1, jax.random.PRNGKey(0)).compile().as_text()
    assert any(c in txt1 for c in ("all-gather", "all-to-all",
                                   "collective-permute", "all-reduce")), \
        "expected the legacy path to need cross-device traffic"


def test_sharded_replay_driver_chunk():
    """Full train chunk with shard-local replay over the 8-device mesh:
    executes, trains, and the only collective left in the train path is
    the gradient all-reduce (no all-gather / all-to-all)."""
    n_envs = 16
    shards = 8
    m = meshlib.make_mesh(8)
    driver, ts, buf, rs = _setup_sharded(n_envs, shards)
    ts, buf, rs = meshlib.shard_driver_state(m, ts, buf, rs, n_envs,
                                             replay_shards=shards)
    key = jax.random.PRNGKey(5)
    lowered = jax.jit(
        lambda t, b, r, e, k: driver._chunk(t, b, r, e, k, True, False)
    ).lower(ts, buf, rs, 0.3, key)
    txt = lowered.compile().as_text()
    # no all-to-all anywhere, and no all-gather attributable to the
    # replay/sample path.  (The CPU SPMD partitioner does choose to
    # all-gather the TINY batch-64 grouped-conv input of the actor
    # forward instead of partitioning the conv — a cost-model call on
    # toy shapes, unrelated to replay; allow all-gathers whose metadata
    # names a conv op, reject any other.)
    assert "all-to-all" not in txt
    for line in txt.splitlines():
        if "all-gather" in line and "metadata=" in line:
            assert "conv" in line, f"non-conv all-gather: {line[:300]}"

    ts2, buf2, rs2, metrics = driver._chunk_train(ts, buf, rs, 0.3, key)
    assert np.isfinite(float(metrics["loss_Q_global"]))
    assert int(np.asarray(rs2.episodes)) >= 0
    np.testing.assert_array_equal(
        np.asarray(buf2.size) if not hasattr(buf2, "bad")
        else np.asarray(buf2.good.size),
        np.full(shards, min(driver.cfg.steps_per_train * n_envs // shards,
                            driver.cfg.buffer_size // shards), np.int32))
