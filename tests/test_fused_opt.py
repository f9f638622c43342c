"""Fused Adam+apply+Polyak kernel == the optax path, bit-for-bit-ish."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cm3_tpu.algs import common
from cm3_tpu.ops import fused_opt


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"a": {"kernel": jax.random.normal(k1, (37, 53)),
                  "bias": jax.random.normal(k2, (53,))},
            "b": jax.random.normal(k3, (129,))}


@pytest.mark.parametrize("lr,tau", [(1e-3, 0.01), (1e-4, 0.05)])
def test_fused_matches_optax_over_steps(lr, tau):
    key = jax.random.PRNGKey(0)
    params = _tree(key)
    tgt = jax.tree_util.tree_map(lambda x: x + 0.1, params)
    tx = common.adam(lr)
    opt = tx.init(params)

    p_ref, t_ref, o_ref = params, tgt, opt
    p_f, t_f, o_f = params, tgt, opt
    for i in range(5):
        grads = _tree(jax.random.PRNGKey(100 + i))
        upd, o_ref = tx.update(grads, o_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
        t_ref = common.soft_update(t_ref, p_ref, tau)

        p_f, t_f, o_f = fused_opt.adam_polyak(o_f, p_f, t_f, grads, lr, tau)

        for ref, got in ((p_ref, p_f), (t_ref, t_f)):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
                ref, got)
        assert int(o_f[0].count) == int(o_ref[0].count) == i + 1
        np.testing.assert_allclose(np.asarray(o_ref[0].mu),
                                   np.asarray(o_f[0].mu), rtol=2e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(o_ref[0].nu),
                                   np.asarray(o_f[0].nu), rtol=2e-5,
                                   atol=1e-7)


def test_cm3_update_fused_matches_default():
    """The full CM3 update with fused_opt=True produces the same new
    parameters/targets as the optax path."""
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import AlgConfig
    from tests.test_cm3_alg import _particle_batch

    spec = dict(l_action=5, l_goal=2)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)
    algs = [CM3("particle", spec, AlgConfig(n_agents=2, stage=2,
                                            fused_opt=f))
            for f in (False, True)]
    outs = []
    for alg in algs:
        ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"],
                            batch["state"], batch["goals"])
        for i in range(3):
            ts, metrics = jax.jit(alg.update)(ts, batch, 0.1,
                                              jax.random.PRNGKey(2 + i))
        outs.append((ts, metrics))
    (ts0, m0), (ts1, m1) = outs
    for fld in ("actor", "actor_tgt", "qg", "qg_tgt", "qc", "qc_tgt"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
            getattr(ts0, fld), getattr(ts1, fld))
    np.testing.assert_allclose(float(m0["loss_Q_global"]),
                               float(m1["loss_Q_global"]), rtol=1e-5)


def test_fused_opt_rejects_grad_clip():
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import AlgConfig

    with pytest.raises(ValueError):
        CM3("particle", dict(l_action=5, l_goal=2),
            AlgConfig(n_agents=2, stage=2, fused_opt=True, grad_clip=10.0))
