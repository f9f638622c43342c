"""Replay buffer unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.replay import buffer


def _ex():
    return {"x": jnp.zeros((3,)), "a": jnp.int32(0)}


def test_add_sample_roundtrip():
    st = buffer.init(_ex(), capacity=8)
    tr = {"x": jnp.arange(12, dtype=jnp.float32).reshape(4, 3),
          "a": jnp.arange(4, dtype=jnp.int32)}
    st = buffer.add_batch(st, tr)
    assert int(st.size) == 4 and int(st.insert) == 4
    batch = buffer.sample(st, jax.random.PRNGKey(0), 16)
    assert batch["x"].shape == (16, 3)
    # all sampled rows must be among the 4 inserted
    assert set(np.asarray(batch["a"]).tolist()) <= {0, 1, 2, 3}


def test_ring_wraparound():
    st = buffer.init(_ex(), capacity=4)
    for i in range(3):
        tr = {"x": jnp.full((3, 3), i, jnp.float32),
              "a": jnp.full((3,), i, jnp.int32)}
        st = buffer.add_batch(st, tr)
    assert int(st.size) == 4
    assert int(st.insert) == 9 % 4
    vals = set(np.asarray(st.data["a"]).tolist())
    assert vals <= {1, 2}  # oldest rows overwritten


def test_valid_mask_packs_rows():
    st = buffer.init(_ex(), capacity=8)
    tr = {"x": jnp.arange(15, dtype=jnp.float32).reshape(5, 3),
          "a": jnp.arange(5, dtype=jnp.int32)}
    valid = jnp.array([True, False, True, False, True])
    st = buffer.add_batch(st, tr, valid)
    assert int(st.size) == 3
    assert np.asarray(st.data["a"][:3]).tolist() == [0, 2, 4]


def test_dual_routing_and_mix():
    st = buffer.init_dual(_ex(), capacity=64)
    t_bad = {"x": jnp.zeros((10, 3)), "a": jnp.full((10,), 1, jnp.int32)}
    t_good = {"x": jnp.ones((10, 3)), "a": jnp.full((10,), 2, jnp.int32)}
    st = buffer.add_episode(st, t_bad, jnp.ones(10, bool), jnp.bool_(True))
    st = buffer.add_episode(st, t_good, jnp.ones(10, bool), jnp.bool_(False))
    assert int(st.bad.size) == 10 and int(st.good.size) == 10
    batch = buffer.sample_dual(st, jax.random.PRNGKey(1), 8)
    a = np.asarray(batch["a"])
    assert (a[:4] == 1).all() and (a[4:] == 2).all()  # 50/50 split


def test_dual_fallback_when_one_empty():
    st = buffer.init_dual(_ex(), capacity=64)
    t_good = {"x": jnp.ones((6, 3)), "a": jnp.full((6,), 2, jnp.int32)}
    st = buffer.add_episode(st, t_good, jnp.ones(6, bool), jnp.bool_(False))
    batch = buffer.sample_dual(st, jax.random.PRNGKey(1), 8)
    assert (np.asarray(batch["a"]) == 2).all()


def test_sharded_dual_flush_and_sample():
    """flush_episodes_sharded routes each env block's episodes into ITS
    shard's bad/good memory; sample_dual_sharded draws the 50/50 mix per
    shard."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cm3_tpu.replay import buffer as replay

    shards, e, t = 4, 8, 3
    example = {"x": jnp.zeros((), jnp.float32)}
    buf = replay.init_dual_sharded(example, 16 * shards, shards)
    # env i writes values i*10+t; envs 0..7 -> shard i//2; odd envs bad
    stage = {"x": (jnp.arange(e, dtype=jnp.float32)[:, None] * 10
                   + jnp.arange(t, dtype=jnp.float32)[None, :])}
    valid = jnp.ones((e, t), bool)
    is_bad = (jnp.arange(e) % 2).astype(bool)
    buf = replay.flush_episodes_sharded(buf, stage, valid, is_bad, shards)

    np.testing.assert_array_equal(np.asarray(buf.bad.size),
                                  np.full(shards, t))
    np.testing.assert_array_equal(np.asarray(buf.good.size),
                                  np.full(shards, t))
    for d in range(shards):
        good_env, bad_env = 2 * d, 2 * d + 1
        np.testing.assert_array_equal(
            np.asarray(buf.good.data["x"])[d, :t], good_env * 10
            + np.arange(t))
        np.testing.assert_array_equal(
            np.asarray(buf.bad.data["x"])[d, :t], bad_env * 10
            + np.arange(t))

    batch = replay.sample_dual_sharded(buf, jax.random.PRNGKey(0), 8 * shards,
                                       shards)
    got = np.asarray(batch["x"]).reshape(shards, 8)
    for d in range(shards):
        allowed = set((2 * d) * 10 + np.arange(t)) | set(
            (2 * d + 1) * 10 + np.arange(t))
        assert set(got[d]).issubset(allowed), (d, got[d])
        # 50/50 mix with fallback (replay_buffer_dual.py:39-63): bad
        # holds only t=3 rows < half=4, so exactly 3 rows come from bad
        assert set(got[d][:t]).issubset(
            set((2 * d + 1) * 10 + np.arange(t))), got[d]
        assert set(got[d][t:]).issubset(
            set((2 * d) * 10 + np.arange(t))), got[d]
