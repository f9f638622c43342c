"""Mesh construction and sharding helpers.

The reference's only parallelism is forking seed processes
(``train_multiprocess.py:31-43``).  Here scaling is data-parallel over a
``jax.sharding.Mesh``: env instances, replay rows and learner minibatches
shard over the ``data`` axis; parameters and schedule scalars replicate.
XLA inserts the gradient/metric collectives (psum over ICI within a
slice) — nothing in the driver changes, inputs just carry shardings
(see ``__graft_entry__.dryrun_multichip`` and
tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.asarray(devs[:n]), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh, leading: int, axis: str = "data"):
    """device_put every leaf whose leading dim == ``leading`` with a
    data-axis sharding; replicate everything else.  ``leading`` must be
    divisible by the mesh size."""
    data = data_sharding(mesh, axis)
    repl = replicated(mesh)

    def place(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == leading:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, tree)


def replicate(tree, mesh: Mesh):
    repl = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), tree)


def shard_driver_state(mesh: Mesh, ts, buf, rs, n_envs: int,
                       replay_shards: int = 1):
    """Place a (TrainState, ReplayState, RolloutState) triple for
    data-parallel execution: rollout over env axis, learner replicated.

    ``replay_shards == 1``: the single ring shards over its capacity
    axis (every sample then gathers across the mesh — legacy mode).
    ``replay_shards == mesh size``: shard-local replay — every buffer
    leaf (data rings AND [D] cursors) leads with the shard axis, placed
    so shard d lives with env block d; appends and samples are then
    device-local (buffer.py sharded ops; no gather collectives in the
    lowered program, tests/test_parallel.py)."""
    ts = replicate(ts, mesh)
    rs = shard_leading_axis(rs, mesh, n_envs)
    if replay_shards > 1:
        def place_buf(b):
            return b.replace(
                data=shard_leading_axis(b.data, mesh, replay_shards),
                insert=jax.device_put(b.insert, data_sharding(mesh)),
                size=jax.device_put(b.size, data_sharding(mesh)))
    else:
        def place_buf(b):
            cap = jax.tree_util.tree_leaves(b.data)[0].shape[0]
            return b.replace(
                data=shard_leading_axis(b.data, mesh, cap),
                insert=jax.device_put(b.insert, replicated(mesh)),
                size=jax.device_put(b.size, replicated(mesh)))
    if hasattr(buf, "bad"):  # dual buffer
        buf = buf.replace(bad=place_buf(buf.bad), good=place_buf(buf.good))
    else:
        buf = place_buf(buf)
    return ts, buf, rs


# ---- multi-controller-safe state construction -------------------------- #
# Under multi-process execution, building GLOBAL arrays on the host and
# device_put-ing them is not controller-safe; the safe pattern is to
# create state INSIDE jit with explicit out_shardings (every controller
# runs the same program; XLA materializes each shard on its owner).
# These helpers compute the out_shardings pytrees from jax.eval_shape
# results, mirroring shard_leading_axis / shard_driver_state placement.


def leading_axis_shardings(mesh: Mesh, shapes, leading: int,
                           axis: str = "data"):
    """shapes (eval_shape pytree) -> NamedSharding pytree: leaves whose
    leading dim == ``leading`` are data-sharded, the rest replicated."""
    data, repl = data_sharding(mesh, axis), replicated(mesh)
    return jax.tree_util.tree_map(
        lambda s: data if (getattr(s, "ndim", 0) >= 1
                           and s.shape[0] == leading) else repl, shapes)


def driver_state_shardings(mesh: Mesh, shapes, n_envs: int,
                           replay_shards: int = 1):
    """Shardings for an eval_shape of ``(ts, buf, rs)`` under the same
    placement rules as ``shard_driver_state``."""
    ts_s, buf_s, rs_s = shapes
    repl = replicated(mesh)
    data = data_sharding(mesh)
    ts_sh = jax.tree_util.tree_map(lambda _: repl, ts_s)
    rs_sh = leading_axis_shardings(mesh, rs_s, n_envs)

    def ring(b):
        if replay_shards > 1:
            return b.replace(
                data=leading_axis_shardings(mesh, b.data, replay_shards),
                insert=data, size=data)
        cap = jax.tree_util.tree_leaves(b.data)[0].shape[0]
        return b.replace(data=leading_axis_shardings(mesh, b.data, cap),
                         insert=repl, size=repl)

    if hasattr(buf_s, "bad"):
        buf_sh = buf_s.replace(bad=ring(buf_s.bad), good=ring(buf_s.good))
    else:
        buf_sh = ring(buf_s)
    return ts_sh, buf_sh, rs_sh
