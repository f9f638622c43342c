"""Curriculum graft + orbax persistence tests (reference semantics:
train_offpolicy.py:155-198, alg_credit.py:227-246)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import AlgConfig, CheckersEnvConfig, NNConfig
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.train import checkpoint


def _small_nn():
    return NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32, A_n_h2=32)


def _init(stage, n_agents, key=0):
    if n_agents == 1:
        env = Checkers(CheckersEnvConfig(agents_r=(0,), agents_c=(8,),
                                         n_agents=1))
        goals = jnp.array([[[1.0, 0.0]]] * 4)
    else:
        env = Checkers(CheckersEnvConfig(agents_r=(0, 2), agents_c=(8, 8),
                                         n_agents=2))
        goals = jnp.tile(jnp.eye(2)[None], (4, 1, 1))
    alg = CM3("checkers", env.spec(),
              AlgConfig(n_agents=n_agents, stage=stage), _small_nn())
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(4))
    st, ts_env = jax.vmap(env.reset)(keys, goals)
    ts = alg.init_state(jax.random.PRNGKey(key), ts_env.obs, ts_env.state,
                        goals)
    return alg, ts


def _leaves_by_path(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {tuple(str(k) for k in p): l for p, l in flat}


@pytest.mark.slow
def test_graft_copies_shared_and_keeps_stage2():
    alg1, ts1 = _init(stage=1, n_agents=1, key=11)
    alg2, ts2 = _init(stage=2, n_agents=2, key=22)

    ts2g = checkpoint.stage2_init_cm3(ts2, ts1.actor, ts1.qg)

    src_actor = _leaves_by_path(ts1.actor)
    for path, leaf in _leaves_by_path(ts2g.actor).items():
        if any("stage2" in p for p in path):
            # stage-2 branch untouched (fresh init from ts2)
            orig = _leaves_by_path(ts2.actor)[path]
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(orig))
        else:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(src_actor[path]),
                                          err_msg=str(path))

    # Q_credit shared leaves == grafted Q_global leaves
    qg = _leaves_by_path(ts2g.qg)
    for path, leaf in _leaves_by_path(ts2g.qc).items():
        if not any("stage2" in p for p in path):
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(qg[path]),
                                          err_msg=str(path))

    # targets hard-equal mains
    for t, m in [(ts2g.actor_tgt, ts2g.actor), (ts2g.qg_tgt, ts2g.qg),
                 (ts2g.qc_tgt, ts2g.qc)]:
        eq = jax.tree_util.tree_map(
            lambda a, b: bool(jnp.array_equal(a, b)), t, m)
        assert all(jax.tree_util.tree_leaves(eq))


def test_grafted_stage2_forward_matches_stage1_on_shared_path():
    """With zeroed stage-2 branches, the stage-2 Q_global on (s, g, a)
    must equal the stage-1 net (the add-on branch contributes 0)."""
    alg1, ts1 = _init(stage=1, n_agents=1, key=3)
    alg2, ts2 = _init(stage=2, n_agents=2, key=4)
    ts2g = checkpoint.stage2_init_cm3(ts2, ts1.actor, ts1.qg)

    # zero the stage-2 subtrees of the grafted Q_global
    def zero_stage2(tree):
        def visit(path, leaf):
            key = tuple(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path)
            return jnp.zeros_like(leaf) if any(
                p == "stage2" for p in key) else leaf
        return jax.tree_util.tree_map_with_path(visit, tree)

    qg2 = zero_stage2(ts2g.qg)

    b = 6
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (b, 3, 9, 2))
    vec = jax.random.normal(key, (b, 4))
    g = jax.random.normal(key, (b, 2))
    a = jax.nn.one_hot(jnp.zeros(b, jnp.int32), 5)
    t_obs = jax.random.normal(key, (b, 5, 5, 3))
    v_obs = jax.random.normal(key, (b, 4))
    s_oth2 = jnp.zeros((b, 4))
    a_oth2 = jnp.zeros((b, 1, 5))

    q1 = alg1.qg_mod.apply(ts1.qg, grid, vec, g, a,
                           jnp.zeros((b, 0)), jnp.zeros((b, 0, 5)),
                           t_obs, v_obs)
    q2 = alg2.qg_mod.apply(qg2, grid, vec, g, a, s_oth2, a_oth2, t_obs, v_obs)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-5)


def test_orbax_roundtrip(tmp_path):
    alg, ts = _init(stage=2, n_agents=2, key=7)
    path = os.path.join(str(tmp_path), "ckpt")
    checkpoint.save(path, ts)
    alg2, ts_like = _init(stage=2, n_agents=2, key=8)  # different init
    restored = checkpoint.restore(path, ts_like)
    for a, b in zip(jax.tree_util.tree_leaves(ts),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graft_shape_mismatch_raises():
    alg1, ts1 = _init(stage=1, n_agents=1)
    bad = jax.tree_util.tree_map(lambda x: jnp.zeros(x.shape + (2,)),
                                 ts1.actor)
    with pytest.raises(ValueError, match="graft shape mismatch"):
        checkpoint.graft_params(ts1.actor, bad)


def test_stage2_graft_across_grad_clip_structures(tmp_path):
    """A stage-1 checkpoint trained WITHOUT grad clipping must restore
    into a stage-2 run configured WITH grad_clip (and vice versa): the
    flattened Adam chain's state layout differs, so the runner falls
    back to a params/targets graft with a fresh optimizer
    (runner._restore_flexible + checkpoint.merge_non_opt)."""
    from cm3_tpu.train import runner

    wd = str(tmp_path)
    m = runner.cfgmod.load_json("master.json")
    m.update(experiment="checkers", n_envs=8, seed=5, N_train=60,
             period=30, N_eval=2, pretrain_episodes=8, batch_size=16,
             buffer_size=256, steps_per_train=4, updates_per_chunk=1,
             episode_log=0)
    m1 = dict(m, stage=1, dir_name="s1nc", grad_clip=0.0)
    runner.train_function(m1, workdir=wd, verbose=False)
    # no-clip ckpt -> clip config
    m2 = dict(m, stage=2, dir_name="s2c", dir_restore="s1nc",
              train_from_nothing=0, grad_clip=10.0)
    ts, stats = runner.train_function(m2, workdir=wd, verbose=False)
    assert stats["episodes"] >= 60
    # clip ckpt -> no-clip config (same-stage warm start)
    m3 = dict(m, stage=2, dir_name="s2nc", dir_restore="s2c",
              train_from_nothing=0, restore_same_stage=1, grad_clip=0.0)
    ts3, stats3 = runner.train_function(m3, workdir=wd, verbose=False)
    assert stats3["episodes"] >= 60
