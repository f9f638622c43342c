"""CM3 algorithm unit tests: init, fused update, target dynamics,
counterfactual math on hand-computed minibatches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.algs import common
from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import AlgConfig, CheckersEnvConfig, NNConfig
from cm3_tpu.envs.checkers import Checkers


def _particle_batch(key, b, n, stage):
    ks = jax.random.split(key, 8)
    mk = lambda k, *s: jax.random.normal(k, s)
    obs = {"others": mk(ks[0], b, n, 4 * max(n - 1, 1)),
           "self_v": mk(ks[1], b, n, 4)}
    obs_next = {"others": mk(ks[2], b, n, 4 * max(n - 1, 1)),
                "self_v": mk(ks[3], b, n, 4)}
    state = {"vec": mk(ks[4], b, n, 4)}
    state_next = {"vec": mk(ks[5], b, n, 4)}
    return {
        "obs": obs, "obs_next": obs_next,
        "state": state, "state_next": state_next,
        "a": jax.random.randint(ks[6], (b, n), 0, 5),
        "r": jnp.zeros(b), "rl": mk(ks[7], b, n),
        "done": jnp.zeros(b, bool),
        "goals": jnp.tile(jnp.eye(n, 2)[None] if n <= 2
                          else jnp.zeros((n, 2))[None], (b, 1, 1)),
    }


def _make_alg(n, stage, use_Q_credit=True, use_V=False):
    cfg = AlgConfig(n_agents=n, stage=stage, use_Q_credit=use_Q_credit,
                    use_V=use_V)
    spec = dict(l_action=5, l_goal=2)
    return CM3("particle", spec, cfg)


@pytest.mark.parametrize("n,stage,use_qc,use_v", [
    (1, 1, True, False),
    (2, 2, True, False),
    (2, 2, False, True),
    (2, 2, False, False),
])
@pytest.mark.slow
def test_update_runs_and_moves_targets(n, stage, use_qc, use_v):
    alg = _make_alg(n, stage, use_qc, use_v)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, n, stage)
    ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"], batch["state"],
                        batch["goals"])
    # targets start equal to mains
    for t, m in [(ts.actor_tgt, ts.actor), (ts.qg_tgt, ts.qg)]:
        chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b)), t, m))
        assert chex_equal

    update = jax.jit(alg.update)
    ts2, metrics = update(ts, batch, 0.3, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_Q_global"]))
    assert np.isfinite(float(metrics["policy_loss"]))
    if alg.use_credit:
        assert np.isfinite(float(metrics["loss_Q_credit"]))
    if alg.use_v:
        assert np.isfinite(float(metrics["loss_V"]))

    # soft update: tgt2 == tau*main_new + (1-tau)*tgt_old
    tau = alg.cfg.tau
    got = jax.tree_util.tree_leaves(ts2.qg_tgt)[0]
    want = tau * jax.tree_util.tree_leaves(ts2.qg)[0] + \
        (1 - tau) * jax.tree_util.tree_leaves(ts.qg_tgt)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    # params actually changed
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.actor, ts2.actor)
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.slow
def test_counterfactual_advantage_matches_reference_formula():
    """Check einsum layout against an explicit loop over (m, n) pairs."""
    n, b = 3, 4
    alg = _make_alg(n, 2, True, False)
    batch = _particle_batch(jax.random.PRNGKey(3), b, n, 2)
    ts = alg.init_state(jax.random.PRNGKey(4), batch["obs"], batch["state"],
                        batch["goals"])
    q_cf = alg._q_credit_cf(ts.qc, batch["state"], batch["obs"],
                            batch["goals"])  # [B,M,N,A]
    probs = alg.actor_probs(ts.actor, batch["obs"], batch["goals"], None, 0.1)
    cf = jnp.einsum("bma,bmna->bmn", probs, q_cf)
    # explicit loop
    for bi in range(b):
        for m in range(n):
            for ni in range(n):
                want = float(jnp.sum(probs[bi, m] * q_cf[bi, m, ni]))
                assert abs(float(cf[bi, m, ni]) - want) < 1e-5

    # pair forward vs cf forward consistency: Q(s, a^m=actual) must equal
    # the cf tensor gathered at the actual action
    a_1h = common.one_hot(batch["a"], 5)
    q_pairs = alg._q_credit_pairs(ts.qc, batch["state"], batch["obs"],
                                  batch["goals"], a_1h)
    gathered = jnp.einsum("bmna,bma->bmn", q_cf, a_1h)
    np.testing.assert_allclose(np.asarray(q_pairs), np.asarray(gathered),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_stage1_policy_gradient_direction():
    """With a single agent and a known-positive advantage on action k, a
    gradient step must increase pi(k)."""
    cfg = AlgConfig(n_agents=1, stage=1, lr_actor=1e-3)
    alg = CM3("particle", dict(l_action=5, l_goal=2), cfg)
    b = 32
    batch = _particle_batch(jax.random.PRNGKey(5), b, 1, 1)
    batch["a"] = jnp.full((b, 1), 2, jnp.int32)
    batch["rl"] = jnp.full((b, 1), 10.0)  # big positive reward
    ts = alg.init_state(jax.random.PRNGKey(6), batch["obs"], batch["state"],
                        batch["goals"])
    p0 = alg.actor_probs(ts.actor, batch["obs"], batch["goals"], None, 0.0)
    update = jax.jit(alg.update)
    # train with epsilon like the reference does — the eps-mix floors the
    # probabilities and keeps log pi well-conditioned
    for i in range(300):
        ts, _ = update(ts, batch, 0.2, jax.random.PRNGKey(i))
    p1 = alg.actor_probs(ts.actor, batch["obs"], batch["goals"], None, 0.0)
    assert float(p1[:, 0, 2].mean()) > float(p0[:, 0, 2].mean())


@pytest.mark.slow
def test_checkers_experiment_update():
    cfg_env = CheckersEnvConfig(agents_r=(0, 2), agents_c=(8, 8), n_agents=2)
    env = Checkers(cfg_env)
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2),
              NNConfig())
    B = 4
    goals = jnp.tile(jnp.eye(2)[None], (B, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    st, ts_env = jax.vmap(env.reset)(keys, goals)
    st2, ts_env2 = jax.vmap(env.step)(st, jnp.zeros((B, 2), jnp.int32))
    batch = {
        "obs": ts_env.obs, "obs_next": ts_env2.obs,
        "state": ts_env.state, "state_next": ts_env2.state,
        "a": jnp.ones((B, 2), jnp.int32),
        "a_prev": jnp.zeros((B, 2), jnp.int32),
        "r": ts_env2.reward, "rl": ts_env2.reward_local,
        "done": ts_env2.done, "goals": goals,
    }
    ts = alg.init_state(jax.random.PRNGKey(0), batch["obs"], batch["state"],
                        goals)
    ts2, metrics = jax.jit(alg.update)(ts, batch, 0.5, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    a = alg.act(ts2, ts_env.obs, goals, batch["a_prev"], 0.5,
                jax.random.PRNGKey(2))
    assert a.shape == (B, 2) and int(a.max()) < 5


def test_grad_clip_bounds_update_magnitude():
    """grad_clip > 0 prepends global-norm clipping (a documented
    deviation, common.adam): with a near-zero clip norm the parameter
    step must shrink to ~lr * clip-scale, far below the unclipped step."""
    import dataclasses

    import numpy as np

    cfg = AlgConfig(n_agents=2, stage=2)
    spec = dict(l_action=5, l_goal=2)
    batch = _particle_batch(jax.random.PRNGKey(0), 32, 2, 2)

    def step_norm(alg_cfg):
        alg = CM3("particle", spec, alg_cfg)
        ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"],
                            batch["state"], batch["goals"])
        ts2, _ = alg.update(ts, batch, 0.1, jax.random.PRNGKey(2))
        return float(sum(
            np.abs(np.asarray(a) - np.asarray(b)).sum()
            for a, b in zip(jax.tree_util.tree_leaves(ts.qg),
                            jax.tree_util.tree_leaves(ts2.qg))))

    free = step_norm(cfg)
    clipped = step_norm(dataclasses.replace(cfg, grad_clip=1e-6))
    assert clipped < free * 0.5, (clipped, free)
    assert clipped > 0.0


@pytest.mark.slow
def test_target_clip_bounds_td_targets():
    """cfg.target_clip clamps TD targets (round-4 divergence fix): with
    a pathologically large reward the clipped critic loss is orders of
    magnitude smaller after one update (its target is bounded); with
    in-range rewards the clamp is exactly inert."""
    spec = dict(l_action=5, l_goal=2)
    batch = _particle_batch(jax.random.PRNGKey(0), 16, 2, 2)

    def one_update(clip, rl_scale):
        alg = CM3("particle", spec, AlgConfig(n_agents=2, stage=2,
                                              target_clip=clip))
        b = dict(batch, rl=batch["rl"] * rl_scale)
        ts = alg.init_state(jax.random.PRNGKey(1), b["obs"], b["state"],
                            b["goals"])
        ts, m = jax.jit(alg.update)(ts, b, 0.1, jax.random.PRNGKey(7))
        return ts, m

    _, m_un = one_update(0.0, 1000.0)
    _, m_cl = one_update(25.0, 1000.0)
    assert float(m_cl["loss_Q_global"]) < float(m_un["loss_Q_global"]) / 100
    assert float(m_cl["loss_Q_credit"]) < float(m_un["loss_Q_credit"]) / 100

    ts_ref, m_ref = one_update(0.0, 1.0)
    ts_noop, m_noop = one_update(25.0, 1.0)
    assert float(m_ref["loss_Q_global"]) == float(m_noop["loss_Q_global"])
    for a, b in zip(jax.tree_util.tree_leaves(ts_ref.qg),
                    jax.tree_util.tree_leaves(ts_noop.qg)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_adv_norm_standardizes_policy_gradient():
    """cfg.adv_norm: the policy update is invariant to a uniform
    scaling of the critic's output (the round-4 degraded-signal
    erosion lever); the default path is scale-sensitive."""
    import flax

    spec = dict(l_action=5, l_goal=2)
    batch = _particle_batch(jax.random.PRNGKey(0), 32, 2, 2)

    def actor_after(adv_norm, q_scale):
        alg = CM3("particle", spec,
                  AlgConfig(n_agents=2, stage=2, use_Q_credit=False,
                            use_V=False, adv_norm=adv_norm,
                            lr_Q=0.0))  # critic frozen at (scaled) init
        ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"],
                            batch["state"], batch["goals"])
        qg = flax.core.unfreeze(ts.qg) if hasattr(flax.core, "unfreeze") \
            else dict(ts.qg)
        qg["params"]["out"]["kernel"] = qg["params"]["out"]["kernel"] \
            * q_scale
        ts = ts.replace(qg=qg, qg_tgt=qg)
        ts2, _ = jax.jit(alg.update)(ts, batch, 0.1, jax.random.PRNGKey(7))
        return jax.tree_util.tree_leaves(ts2.actor)

    a_norm_1 = actor_after(True, 1.0)
    a_norm_2 = actor_after(True, 100.0)
    for x, y in zip(a_norm_1, a_norm_2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
    # the default (reference-exact) path IS scale-sensitive
    a_raw_1 = actor_after(False, 1.0)
    a_raw_2 = actor_after(False, 100.0)
    assert any(not np.allclose(np.asarray(x), np.asarray(y), atol=1e-7)
               for x, y in zip(a_raw_1, a_raw_2))
