"""On-device replay buffers.

The reference keeps Python lists of object-dtype transition rows and
samples with ``random.sample`` (``alg/replay_buffer.py``,
``replay_buffer_dual.py``).  Here a buffer is a pytree of fixed-capacity
device arrays plus integer cursors, so adds and samples are pure jitted
ops: thousands of vectorized env instances append in one scatter, and a
minibatch is one gather — no host round-trips.

Deviation (documented): sampling is uniform WITH replacement within each
memory (the reference uses without-replacement ``random.sample``); with
capacity 2e4 and batch 128 the collision probability is negligible.  The
dual buffer's fallback proportions mirror ``replay_buffer_dual.py:39-63``,
except that when both memories together hold fewer than ``batch`` rows we
fill the fixed-size batch with replacement instead of returning a short
batch (jit requires static shapes).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    data: Any            # pytree, leaves [capacity, ...]
    insert: jax.Array    # i32 cursor
    size: jax.Array      # i32 current fill


def init(example_transition, capacity: int) -> ReplayState:
    """example_transition: pytree with leaves shaped [...] (no batch dim)."""
    data = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        example_transition)
    return ReplayState(data=data, insert=jnp.int32(0), size=jnp.int32(0))


def capacity_of(state: ReplayState) -> int:
    return jax.tree_util.tree_leaves(state.data)[0].shape[0]


def add_batch(state: ReplayState, transitions, valid=None) -> ReplayState:
    """Append E transitions (leaves [E, ...]).  ``valid`` is an optional
    [E] bool mask — invalid rows are dropped (used by the dual buffer's
    episode routing).  Ring semantics match replay_buffer.py:11-16."""
    cap = capacity_of(state)
    e = jax.tree_util.tree_leaves(transitions)[0].shape[0]
    if valid is None:
        offsets = jnp.arange(e, dtype=jnp.int32)
        n_added = jnp.int32(e)
    else:
        valid = valid.astype(jnp.int32)
        # pack valid rows densely: offsets = prefix-sum of valid flags
        offsets = jnp.cumsum(valid) - valid
        n_added = jnp.sum(valid)
    idx = (state.insert + offsets) % cap
    if valid is not None:
        idx = jnp.where(valid == 1, idx, cap)  # out of bounds -> dropped

    def write(buf, rows):
        return buf.at[idx].set(rows, mode="drop")

    data = jax.tree_util.tree_map(write, state.data, transitions)
    return ReplayState(
        data=data,
        insert=(state.insert + n_added) % cap,
        size=jnp.minimum(state.size + n_added, cap))


def sample(state: ReplayState, key, batch_size: int):
    """Uniform minibatch, leaves [batch_size, ...]
    (replay_buffer.py:28-37)."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(state.size, 1))
    return jax.tree_util.tree_map(lambda buf: buf[idx], state.data)


def sample_subsequence(state: ReplayState, key, length: int):
    """Contiguous window of ``length`` transitions starting at a uniform
    position (the reference's unused episode-subsequence sampler,
    replay_buffer.py:18-26, adapted to the flat ring layout: windows may
    span episode boundaries — mask on the stored ``done`` flags when
    consuming)."""
    start = jax.random.randint(key, (), 0,
                               jnp.maximum(state.size - length + 1, 1))
    idx = (start + jnp.arange(length)) % capacity_of(state)
    return jax.tree_util.tree_map(lambda buf: buf[idx], state.data)


# --------------------------------------------------------------------- #
# dual (bad/good episode) buffer
# --------------------------------------------------------------------- #


@struct.dataclass
class DualReplayState:
    bad: ReplayState     # memory_1: collision / below-threshold episodes
    good: ReplayState    # memory_2


def init_dual(example_transition, capacity: int) -> DualReplayState:
    return DualReplayState(bad=init(example_transition, capacity),
                           good=init(example_transition, capacity))


def add_episode(state: DualReplayState, transitions, valid, is_bad
                ) -> DualReplayState:
    """Route one episode's transitions (leaves [T, ...], mask ``valid``)
    into the bad or good memory (replay_buffer_dual.py:14-24).  ``is_bad``
    is a traced bool scalar."""
    bad = add_batch(state.bad, transitions,
                    valid & jnp.broadcast_to(is_bad, valid.shape))
    good = add_batch(state.good, transitions,
                     valid & jnp.broadcast_to(~is_bad, valid.shape))
    return DualReplayState(bad=bad, good=good)


def flush_episodes(state: DualReplayState, stage, valid, is_bad
                   ) -> DualReplayState:
    """Batched episode routing for lockstep-vectorized rollouts: flush
    E staged episodes at once (stage leaves [E, T, ...], ``valid`` [E, T]
    bool marking the real transitions of episodes that just terminated,
    ``is_bad`` [E] bool).  Rows land densely in (env, t) order — the
    per-episode equivalent of ``replay_buffer_dual.py:14-24`` applied to
    every instance whose episode ended this step."""
    e, t = valid.shape
    flat = jax.tree_util.tree_map(
        lambda x: x.reshape((e * t,) + x.shape[2:]), stage)
    vflat = valid.reshape(e * t)
    bflat = jnp.broadcast_to(is_bad[:, None], (e, t)).reshape(e * t)
    return DualReplayState(
        bad=add_batch(state.bad, flat, vflat & bflat),
        good=add_batch(state.good, flat, vflat & ~bflat))


def reset_dual(state: DualReplayState) -> DualReplayState:
    """Empty both memories (the on-policy burst discard,
    train_onpolicy.py:372-377).  Each cursor gets its OWN zero array —
    sharing one buffer across fields breaks donation (the same device
    buffer may not be donated twice)."""
    return DualReplayState(
        bad=state.bad.replace(insert=jnp.zeros_like(state.bad.insert),
                              size=jnp.zeros_like(state.bad.size)),
        good=state.good.replace(insert=jnp.zeros_like(state.good.insert),
                                size=jnp.zeros_like(state.good.size)))


def sample_dual(state: DualReplayState, key, batch_size: int):
    """50/50 mix with fallback proportions (replay_buffer_dual.py:39-63)."""
    half = batch_size // 2
    s1, s2 = state.bad.size, state.good.size
    from1 = jnp.where(s2 < half, batch_size - s2, half)
    from1 = jnp.minimum(from1, jnp.maximum(s1, 0))
    from1 = jnp.where(s2 == 0, batch_size, from1)
    from1 = jnp.where(s1 == 0, 0, from1)

    k1, k2 = jax.random.split(key)
    idx1 = jax.random.randint(k1, (batch_size,), 0, jnp.maximum(s1, 1))
    idx2 = jax.random.randint(k2, (batch_size,), 0, jnp.maximum(s2, 1))
    use1 = (jnp.arange(batch_size) < from1)

    def pick(b1, b2):
        r1, r2 = b1[idx1], b2[idx2]
        mask = use1.reshape((-1,) + (1,) * (r1.ndim - 1))
        return jnp.where(mask, r1, r2)

    return jax.tree_util.tree_map(pick, state.bad.data, state.good.data)


# --------------------------------------------------------------------- #
# shard-local replay: leaves carry a leading shard axis
# --------------------------------------------------------------------- #
#
# At scale the capacity-sharded single ring is wrong: every sample of
# B rows gathers across the whole mesh (SURVEY.md §7 "keep per-host
# buffers to avoid cross-host gathers").  The sharded layout gives each
# device its OWN ring — leaves [D, capacity/D, ...], cursors [D] — and
# every operation is a vmap of the single-ring op over the shard axis:
# env instances append to their local shard (env axis and shard axis
# are aligned blocks of the same data-parallel sharding) and each
# device samples batch/D rows locally, so the lowered program contains
# no gather collectives; the learner's gradient psum is the only
# cross-device traffic (tests/test_parallel.py asserts this on the
# compiled HLO).
#
# Distribution deviation (documented): sampling is uniform per shard
# (batch/D rows from each shard) rather than uniform over the union —
# identical when shards fill at the same rate, which lockstep
# vectorized rollouts guarantee to within auto-reset jitter.


def _shard_leading(tree, shards: int):
    """[E, ...] leaves -> [D, E/D, ...]."""
    def r(x):
        e = x.shape[0]
        assert e % shards == 0, (e, shards)
        return x.reshape((shards, e // shards) + x.shape[1:])
    return jax.tree_util.tree_map(r, tree)


def _merge_leading(tree):
    """[D, b, ...] leaves -> [D*b, ...]."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), tree)


def init_sharded(example_transition, capacity: int,
                 shards: int) -> ReplayState:
    assert capacity % shards == 0, (capacity, shards)
    one = init(example_transition, capacity // shards)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (shards,) + x.shape).copy(), one)


def add_batch_sharded(state: ReplayState, transitions, shards: int,
                      valid=None) -> ReplayState:
    tr = _shard_leading(transitions, shards)
    v = None if valid is None else _shard_leading(valid, shards)
    if v is None:
        return jax.vmap(add_batch)(state, tr)
    return jax.vmap(add_batch)(state, tr, v)


def sample_sharded(state: ReplayState, key, batch_size: int, shards: int):
    assert batch_size % shards == 0, (batch_size, shards)
    keys = jax.random.split(key, shards)
    out = jax.vmap(sample, in_axes=(0, 0, None))(state, keys,
                                                 batch_size // shards)
    return _merge_leading(out)


def init_dual_sharded(example_transition, capacity: int,
                      shards: int) -> DualReplayState:
    return DualReplayState(
        bad=init_sharded(example_transition, capacity, shards),
        good=init_sharded(example_transition, capacity, shards))


def flush_episodes_sharded(state: DualReplayState, stage, valid, is_bad,
                           shards: int) -> DualReplayState:
    return jax.vmap(flush_episodes)(
        state, _shard_leading(stage, shards),
        _shard_leading(valid, shards), _shard_leading(is_bad, shards))


def sample_dual_sharded(state: DualReplayState, key, batch_size: int,
                        shards: int):
    assert batch_size % shards == 0, (batch_size, shards)
    keys = jax.random.split(key, shards)
    out = jax.vmap(sample_dual, in_axes=(0, 0, None))(state, keys,
                                                      batch_size // shards)
    return _merge_leading(out)
