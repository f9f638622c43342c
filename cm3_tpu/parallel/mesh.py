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


def shard_driver_state(mesh: Mesh, ts, buf, rs, n_envs: int):
    """Place a (TrainState, ReplayState, RolloutState) triple for
    data-parallel execution: rollout over env axis, replay over the
    capacity axis, learner replicated."""
    ts = replicate(ts, mesh)
    rs = shard_leading_axis(rs, mesh, n_envs)
    from cm3_tpu.replay.buffer import ReplayState  # local import, no cycle
    cap = jax.tree_util.tree_leaves(buf.data)[0].shape[0]
    buf = buf.replace(
        data=shard_leading_axis(buf.data, mesh, cap),
        insert=jax.device_put(buf.insert, replicated(mesh)),
        size=jax.device_put(buf.size, replicated(mesh)))
    return ts, buf, rs
