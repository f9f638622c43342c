"""Entropy floor on the policy loss (AlgConfig.pg_ent_coef).

The round-5 completion of the retention dissection: with bounded
targets, clipped gradients, and clipped importance weighting
(pg_is_clip), the remaining stage-2 erosion is ON-policy — once the
replay buffer refills with near-greedy data the mean IS weight returns
to ~1 and the vanilla PG (``alg_credit.py:314-360``, which has no
entropy term) drives the softmax to the simplex corners, where the
policy flips between near-equivalent optima under critic noise.  The
opt-in bonus ``-coef * mean(H(pi))`` is computed on the PURE softmax
(an eps=0 actor forward), not the eps-mixed behavior probs, so the
epsilon floor cannot mask a collapsed softmax.  Tests:
  * coef=0 is the reference-exact path (no ``policy_entropy`` metric,
    update bitwise-identical to the default config);
  * coef>0 emits the metric and, over repeated updates on fixed data,
    keeps the policy strictly higher-entropy than the uncorrected
    actor;
  * composes with pg_is_clip (the retain7 recipe) and with the n=1
    stage-1 path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import AlgConfig
from tests.test_cm3_alg import _particle_batch


def _mk(n, stage, **kw):
    cfg = AlgConfig(n_agents=n, stage=stage, **kw)
    return CM3("particle", dict(l_action=5, l_goal=2), cfg)


def _tree_allclose(a, b):
    return jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: bool(jnp.array_equal(x, y)), a, b))


def _pure_entropy(alg, actor, batch):
    probs = alg.actor_probs(actor, batch["obs"], batch["goals"], None, 0.0)
    return float(jnp.mean(
        -jnp.sum(probs * jnp.log(probs + 1e-15), axis=-1)))


def test_ent_coef_zero_is_reference_exact():
    alg0 = _mk(2, 2)
    alg1 = _mk(2, 2, pg_ent_coef=0.0)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)
    ts = alg0.init_state(jax.random.PRNGKey(1), batch["obs"],
                         batch["state"], batch["goals"])
    ts0, m0 = jax.jit(alg0.update)(ts, batch, 0.2, jax.random.PRNGKey(2))
    ts1, m1 = jax.jit(alg1.update)(ts, batch, 0.2, jax.random.PRNGKey(2))
    assert "policy_entropy" not in m0 and "policy_entropy" not in m1
    assert _tree_allclose(ts0.actor, ts1.actor)


def test_ent_bonus_keeps_policy_higher_entropy():
    """Same init, same data stream: after K updates the entropy-floored
    actor's pure-softmax entropy strictly exceeds the uncorrected
    actor's.  A large coef makes the separation unambiguous."""
    alg0 = _mk(2, 2)
    alg1 = _mk(2, 2, pg_ent_coef=0.5)
    batch = _particle_batch(jax.random.PRNGKey(3), 32, 2, 2)
    ts0 = alg0.init_state(jax.random.PRNGKey(4), batch["obs"],
                          batch["state"], batch["goals"])
    ts1 = ts0
    up0 = jax.jit(alg0.update)
    up1 = jax.jit(alg1.update)
    for i in range(25):
        k = jax.random.PRNGKey(100 + i)
        ts0, _ = up0(ts0, batch, 0.05, k)
        ts1, m1 = up1(ts1, batch, 0.05, k)
    h0 = _pure_entropy(alg0, ts0.actor, batch)
    h1 = _pure_entropy(alg1, ts1.actor, batch)
    assert h1 > h0
    # the metric is the pure-softmax entropy, consistent with the probe
    np.testing.assert_allclose(float(m1["policy_entropy"]), h1, atol=0.15)
    # bounded above by log(A)
    assert h1 <= np.log(5) + 1e-5


def test_ent_composes_with_is_clip():
    """The retain7 recipe: pg_is_clip + pg_ent_coef in one update —
    both metrics emitted, loss finite, actor differs from the
    is-clip-only update (the bonus contributes gradient)."""
    eps = 0.05
    alg_is = _mk(2, 2, pg_is_clip=1.0)
    alg_both = _mk(2, 2, pg_is_clip=1.0, pg_ent_coef=0.05)
    batch = _particle_batch(jax.random.PRNGKey(5), 16, 2, 2)
    ts = alg_is.init_state(jax.random.PRNGKey(6), batch["obs"],
                           batch["state"], batch["goals"])
    b = dict(batch, bp=jnp.full_like(batch["a"], 0.2, jnp.float32))
    ts_is, m_is = jax.jit(alg_is.update)(ts, b, eps, jax.random.PRNGKey(7))
    ts_b, m_b = jax.jit(alg_both.update)(ts, b, eps, jax.random.PRNGKey(7))
    assert np.isfinite(float(m_b["policy_loss"]))
    assert "is_weight_mean" in m_b and "policy_entropy" in m_b
    assert not _tree_allclose(ts_is.actor, ts_b.actor)
    # critics are untouched by both corrections
    assert _tree_allclose(ts_is.qg, ts_b.qg)


def test_ent_stage1_single_agent():
    alg = _mk(1, 1, pg_ent_coef=0.01)
    batch = _particle_batch(jax.random.PRNGKey(8), 8, 1, 1)
    ts = alg.init_state(jax.random.PRNGKey(9), batch["obs"],
                        batch["state"], batch["goals"])
    ts2, m = jax.jit(alg.update)(ts, batch, 0.2, jax.random.PRNGKey(10))
    assert np.isfinite(float(m["policy_loss"]))
    assert 0.0 <= float(m["policy_entropy"]) <= np.log(5) + 1e-5
