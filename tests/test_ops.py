"""Pallas ops tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.common import soft_update
from cm3_tpu.ops.polyak import polyak_update


def test_polyak_matches_tree_map():
    key = jax.random.PRNGKey(0)
    mk = lambda i, *s: jax.random.normal(jax.random.fold_in(key, i), s)
    tree_t = {"w": mk(0, 33, 17), "b": mk(1, 9), "nest": {"x": mk(2, 5, 3)}}
    tree_m = {"w": mk(3, 33, 17), "b": mk(4, 9), "nest": {"x": mk(5, 5, 3)}}
    out = polyak_update(tree_t, tree_m, 0.01)
    ref = soft_update(tree_t, tree_m, 0.01)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_polyak_tau_extremes():
    t = {"a": jnp.ones((4, 4))}
    m = {"a": jnp.full((4, 4), 7.0)}
    np.testing.assert_allclose(np.asarray(polyak_update(t, m, 0.0)["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(polyak_update(t, m, 1.0)["a"]), 7.0)


def test_polyak_odd_sizes():
    # sizes that don't divide the (64,128) tile exercise the padding path
    t = {"a": jnp.arange(1001, dtype=jnp.float32)}
    m = {"a": jnp.zeros(1001)}
    out = polyak_update(t, m, 0.5)
    np.testing.assert_allclose(np.asarray(out["a"]),
                               np.arange(1001, dtype=np.float32) * 0.5)
