"""Round-4 ordering-ablation knobs: init schemes + actor-freeze retention.

Init audit context: the only layer class whose default init here differs
from the reference's TF1 graph is the h2 combination bias ``b``
(reference ``tf.get_variable('b', [n_h2])`` -> TF1 rank-1 glorot; here
zeros) — see the audit table in ``cm3_tpu/models/nets.py``.  The "tf1"
scheme restores exact parity; "trunc001" is the blanket perturbation
from the round-3 verdict's ablation plan.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.algs.qmix import QMIX
from cm3_tpu.core.config import AlgConfig
from tests.test_cm3_alg import _make_alg, _particle_batch


def _leaf(tree, *path):
    for p in path:
        tree = tree[p]
    return tree


def _cm3(scheme, freeze=0):
    cfg = AlgConfig(n_agents=2, stage=2, init_scheme=scheme,
                    actor_freeze_updates=freeze)
    return CM3("particle", dict(l_action=5, l_goal=2), cfg)


def test_ref_scheme_unchanged_and_tf1_b_bias():
    batch = _particle_batch(jax.random.PRNGKey(0), 8, 2, 2)
    args = (batch["obs"], batch["state"], batch["goals"])
    ts_ref = _cm3("ref").init_state(jax.random.PRNGKey(1), *args)
    ts_tf1 = _cm3("tf1").init_state(jax.random.PRNGKey(1), *args)

    b_ref = _leaf(ts_ref.actor, "params", "b")
    b_tf1 = _leaf(ts_tf1.actor, "params", "b")
    assert np.all(np.asarray(b_ref) == 0.0)
    # TF1 rank-1 glorot: U(-sqrt(3/n), sqrt(3/n)), n=64 -> limit ~0.2165
    b = np.asarray(b_tf1)
    assert np.any(b != 0.0)
    assert np.max(np.abs(b)) <= (3.0 / b.shape[0]) ** 0.5 + 1e-6
    # kernels are identical between ref and tf1 (only b differs)
    k_ref = _leaf(ts_ref.actor, "params", "out", "kernel")
    k_tf1 = _leaf(ts_tf1.actor, "params", "out", "kernel")
    assert np.allclose(np.asarray(k_ref), np.asarray(k_tf1))


def test_trunc001_scheme_narrows_all_kernels():
    batch = _particle_batch(jax.random.PRNGKey(0), 8, 2, 2)
    args = (batch["obs"], batch["state"], batch["goals"])
    ts_ref = _cm3("ref").init_state(jax.random.PRNGKey(1), *args)
    ts_tn = _cm3("trunc001").init_state(jax.random.PRNGKey(1), *args)
    k_ref = np.asarray(_leaf(ts_ref.actor, "params", "self_branch",
                             "dense", "kernel"))
    k_tn = np.asarray(_leaf(ts_tn.actor, "params", "self_branch",
                            "dense", "kernel"))
    assert k_ref.std() > 0.05          # glorot on small fan-in is wide
    assert 0.005 < k_tn.std() < 0.015  # truncated normal sigma=0.01
    # W_h2 combination matrices are trunc001 under EVERY scheme
    w_ref = np.asarray(_leaf(ts_ref.actor, "params", "self_branch", "W_h2"))
    assert 0.005 < w_ref.std() < 0.015


def test_qmix_init_scheme_wires_through():
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.core.config import CheckersEnvConfig
    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    from cm3_tpu.train.experiments import make_hooks
    key = jax.random.PRNGKey(0)
    hooks = make_hooks("checkers", env)
    _, ts0, goals0 = hooks.episode_init(key)
    obs = jax.tree_util.tree_map(lambda x: x[None], ts0.obs)
    state = jax.tree_util.tree_map(lambda x: x[None], ts0.state)
    goals = goals0[None]
    mk = lambda s: QMIX("checkers", env.spec(),
                        AlgConfig(alg_name="qmix", n_agents=2, stage=2,
                                  init_scheme=s))
    ts_ref = mk("ref").init_state(key, obs, state, goals)
    ts_tf1 = mk("tf1").init_state(key, obs, state, goals)
    b_ref = np.asarray(_leaf(ts_ref.agent, "params", "b"))
    b_tf1 = np.asarray(_leaf(ts_tf1.agent, "params", "b"))
    assert np.all(b_ref == 0.0) and np.any(b_tf1 != 0.0)


def test_actor_freeze_holds_actor_then_releases():
    alg = _cm3("ref", freeze=2)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)
    ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"], batch["state"],
                        batch["goals"])
    update = jax.jit(alg.update)
    actor0 = jax.tree_util.tree_map(np.asarray, ts.actor)
    qg0 = jax.tree_util.tree_map(np.asarray, ts.qg)

    ts1, _ = update(ts, batch, 0.1, jax.random.PRNGKey(2))
    # step 0 -> frozen: actor identical, critic moved
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts1.actor, actor0))
    assert same
    moved = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts1.qg, qg0))
    assert moved

    ts2, _ = update(ts1, batch, 0.1, jax.random.PRNGKey(3))  # step 1: frozen
    ts3, _ = update(ts2, batch, 0.1, jax.random.PRNGKey(4))  # step 2: live
    still = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts2.actor, actor0))
    assert still
    released = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts3.actor, actor0))
    assert released
    assert int(ts3.step) == 3


def test_actor_lr_anneal_scales_then_stops_actor():
    """actor_lr_anneal_updates linearly scales the actor step to zero
    (AlgConfig docstring).  With anneal=2 and no freeze: step 0 runs at
    scale 1.0, step 1 at 0.5 (exactly half the step-0-Adam-equivalent
    step is hard to assert across moments, so assert strict shrink),
    step 2+ at 0.0 (actor bit-frozen while critics keep training)."""
    cfg = AlgConfig(n_agents=2, stage=2, actor_lr_anneal_updates=2)
    alg = CM3("particle", dict(l_action=5, l_goal=2), cfg)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)
    ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"],
                        batch["state"], batch["goals"])
    update = jax.jit(alg.update)

    def dist(a, b):
        return float(sum(jnp.sum(jnp.abs(x - y)) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))))

    ts1, _ = update(ts, batch, 0.1, jax.random.PRNGKey(2))   # scale 1.0
    d0 = dist(ts1.actor, ts.actor)
    assert d0 > 0.0
    ts2, _ = update(ts1, batch, 0.1, jax.random.PRNGKey(3))  # scale 0.5
    d1 = dist(ts2.actor, ts1.actor)
    assert 0.0 < d1 < d0
    ts3, _ = update(ts2, batch, 0.1, jax.random.PRNGKey(4))  # scale 0.0
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts3.actor, ts2.actor))
    assert same
    qg_moved = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts3.qg, ts2.qg))
    assert qg_moved


def test_actor_lr_anneal_counts_from_freeze_end():
    """With freeze=1 and anneal=2: step 0 is frozen (the actor does not
    move); step 1 is the FIRST live update and the anneal counts from
    the freeze end, so lived = step - freeze = 0 and the scale is
    1 - 0/2 = 1.0 — the actor moves at full rate.  (Guards against the
    anneal clock starting at step 0 and eating the freeze window.)"""
    cfg = AlgConfig(n_agents=2, stage=2, actor_freeze_updates=1,
                    actor_lr_anneal_updates=2)
    alg = CM3("particle", dict(l_action=5, l_goal=2), cfg)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)
    ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"],
                        batch["state"], batch["goals"])
    update = jax.jit(alg.update)
    ts1, _ = update(ts, batch, 0.1, jax.random.PRNGKey(2))   # frozen
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts1.actor, ts.actor))
    assert same
    # step counter is 1 at this update: the freeze gate releases at
    # step >= freeze (=1), lived = 1 - 1 = 0, scale = 1 - 0/2 = 1.0
    ts2, _ = update(ts1, batch, 0.1, jax.random.PRNGKey(3))
    moved = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), ts2.actor, ts1.actor))
    assert moved
