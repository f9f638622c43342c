"""Clipped importance-weighted policy gradient (AlgConfig.pg_is_clip).

The round-5 off-policy correction for the stage-2 retention erosion
dissected in PERF.md (the reference's uncorrected vanilla PG on stale
replayed actions, ``alg_credit.py:314-360``): each replayed action's PG
term is weighted by w = min(pi_now(a)/mu(a), c) with mu the stored
behavior probability.  Tests:
  * exact no-op when the data is on-policy (bp == current taken probs,
    c >= 1) — the correction only fires under drift;
  * stale actions are damped: bp >> pi_now shrinks the actor step;
  * the driver stores ``bp`` in replay transitions and the values are
    the behavior policy's taken-action probabilities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig, NNConfig,
                                 TrainConfig)
from tests.test_cm3_alg import _particle_batch


def _mk(n, stage, **kw):
    cfg = AlgConfig(n_agents=n, stage=stage, **kw)
    return CM3("particle", dict(l_action=5, l_goal=2), cfg)


def _tree_allclose(a, b, atol=0.0):
    return jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: bool(jnp.allclose(x, y, atol=atol)), a, b))


def test_is_clip_exact_noop_on_policy():
    """bp == pi_now(a) => w == 1 exactly (c=1), update identical to the
    uncorrected path."""
    eps = 0.3
    alg0 = _mk(2, 2)
    alg1 = _mk(2, 2, pg_is_clip=1.0)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)
    ts = alg0.init_state(jax.random.PRNGKey(1), batch["obs"], batch["state"],
                         batch["goals"])
    probs = alg0.actor_probs(ts.actor, batch["obs"], batch["goals"], None,
                             eps)
    bp = jnp.take_along_axis(probs, batch["a"][..., None], axis=-1)[..., 0]
    b1 = dict(batch, bp=bp)

    ts0, m0 = jax.jit(alg0.update)(ts, batch, eps, jax.random.PRNGKey(2))
    ts1, m1 = jax.jit(alg1.update)(ts, b1, eps, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["is_weight_mean"]), 1.0, atol=1e-6)
    assert _tree_allclose(ts0.actor, ts1.actor)
    # critics untouched by the correction
    assert _tree_allclose(ts0.qg, ts1.qg)


def test_is_clip_damps_stale_actions():
    """bp = 1.0 (actions certain under the behavior policy, now unlikely)
    => w = pi_now(a) < 1 and the actor step shrinks vs uncorrected."""
    eps = 0.05
    alg0 = _mk(2, 2)
    alg1 = _mk(2, 2, pg_is_clip=1.0)
    batch = _particle_batch(jax.random.PRNGKey(3), 16, 2, 2)
    ts = alg0.init_state(jax.random.PRNGKey(4), batch["obs"], batch["state"],
                         batch["goals"])
    b1 = dict(batch, bp=jnp.ones_like(batch["a"], jnp.float32))
    _, m1 = jax.jit(alg1.update)(ts, b1, eps, jax.random.PRNGKey(5))
    w = float(m1["is_weight_mean"])
    # near-uniform fresh policy: pi(a) ~ 0.2 per action
    assert 0.0 < w < 0.5

    # tiny bp (stale behavior prob) clips at c
    b2 = dict(batch, bp=jnp.full_like(batch["a"], 1e-6, jnp.float32))
    _, m2 = jax.jit(alg1.update)(ts, b2, eps, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m2["is_weight_mean"]), 1.0, atol=1e-6)


def test_is_clip_stage1_single_agent():
    """n=1 path: weight shape [B,1] aligns with sum_a."""
    alg = _mk(1, 1, pg_is_clip=1.0)
    batch = _particle_batch(jax.random.PRNGKey(6), 8, 1, 1)
    ts = alg.init_state(jax.random.PRNGKey(7), batch["obs"], batch["state"],
                        batch["goals"])
    b = dict(batch, bp=jnp.full_like(batch["a"], 0.2, jnp.float32))
    ts2, m = jax.jit(alg.update)(ts, b, 0.2, jax.random.PRNGKey(8))
    assert np.isfinite(float(m["policy_loss"]))
    assert 0.0 < float(m["is_weight_mean"]) <= 1.0


@pytest.mark.slow
def test_driver_stores_behavior_probs():
    """OffPolicyDriver with pg_is_clip stores bp = behavior taken-action
    prob in the replay transition; fill-phase rows store 1/A."""
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.train.experiments import make_hooks
    from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout

    env = Checkers(CheckersEnvConfig(n_columns=4, agents_r=(0,),
                                     agents_c=(4,), n_agents=1,
                                     max_steps=20))
    alg = CM3("checkers", env.spec(),
              AlgConfig(n_agents=1, stage=1, pg_is_clip=1.0),
              NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32,
                       A_n_h2=32))
    cfg = TrainConfig(n_envs=4, batch_size=16, buffer_size=512,
                      pretrain_episodes=2, steps_per_train=10,
                      max_steps=20)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)
    assert driver._store_bp

    rs = init_rollout(hooks, jax.random.PRNGKey(0), cfg.n_envs)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)
    e, n = cfg.n_envs, hooks.n_agents
    dummy_ts = jax.vmap(hooks.env.step)(rs.env_state,
                                        jnp.zeros((e, n), jnp.int32))[1]
    tr = driver._transition(rs, jnp.zeros((e, n), jnp.int32), dummy_ts, None)
    assert "bp" in tr
    example = jax.tree_util.tree_map(lambda x: x[0], tr)
    buf = driver._replay_init(example)

    # fill chunk: random actions -> bp = 1/A
    ts_, buf, rs, _ = driver._chunk_fill(ts, buf, rs, 0.5,
                                         jax.random.PRNGKey(2))
    rows = np.asarray(buf.data["bp"])[:int(buf.size)]
    np.testing.assert_allclose(rows, 1.0 / alg.n_actions)

    # policy chunk: bp in (0, 1], generally != 1/A
    ts_, buf, rs, _ = driver._chunk_train(ts, buf, rs, 0.5,
                                          jax.random.PRNGKey(3))
    rows = np.asarray(buf.data["bp"])[:int(buf.size)]
    assert rows.min() > 0.0 and rows.max() <= 1.0 + 1e-6
    assert np.abs(rows - 1.0 / alg.n_actions).max() > 1e-4
