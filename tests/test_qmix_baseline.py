"""QMIX and COMA/IAC baseline algorithm tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.algs import common
from cm3_tpu.algs.baseline import Baseline
from cm3_tpu.algs.qmix import QMIX
from cm3_tpu.core.config import AlgConfig, CheckersEnvConfig, NNConfig
from cm3_tpu.envs.checkers import Checkers


def _particle_batch(key, b, n):
    ks = jax.random.split(key, 8)
    mk = lambda k, *s: jax.random.normal(k, s)
    return {
        "obs": {"others": mk(ks[0], b, n, 4 * max(n - 1, 1)),
                "self_v": mk(ks[1], b, n, 4)},
        "obs_next": {"others": mk(ks[2], b, n, 4 * max(n - 1, 1)),
                     "self_v": mk(ks[3], b, n, 4)},
        "state": {"vec": mk(ks[4], b, n, 4)},
        "state_next": {"vec": mk(ks[5], b, n, 4)},
        "a": jax.random.randint(ks[6], (b, n), 0, 5),
        "r": jnp.zeros(b), "rl": mk(ks[7], b, n),
        "done": jnp.zeros(b, bool),
        "goals": jnp.tile(jnp.eye(n, 2)[None], (b, 1, 1)),
    }


def test_qmix_update_and_monotonicity():
    n, b = 2, 16
    alg = QMIX("particle", dict(l_action=5, l_goal=2),
               AlgConfig(alg_name="qmix", n_agents=n, stage=2))
    batch = _particle_batch(jax.random.PRNGKey(0), b, n)
    ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"], batch["state"],
                        batch["goals"])
    ts2, m = jax.jit(alg.update)(ts, batch, 0.1, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss_mixer"]))

    # monotonicity: Q_tot must be nondecreasing in each agent's q
    q0 = jnp.zeros((b, n))
    base = alg._mix(ts.mixer, q0, batch["state"], batch["goals"])
    for i in range(n):
        up = alg._mix(ts.mixer, q0.at[:, i].add(1.0), batch["state"],
                      batch["goals"])
        assert np.all(np.asarray(up) >= np.asarray(base) - 1e-6)

    # epsilon-greedy: eps=0 is argmax, eps=1 uniform-random per agent
    a0 = alg.act(ts, batch["obs"], batch["goals"], None, 0.0,
                 jax.random.PRNGKey(3))
    q = alg._agent_qs(ts.agent, batch["obs"], batch["goals"], None)
    np.testing.assert_array_equal(np.asarray(a0),
                                  np.asarray(jnp.argmax(q, -1)))


@pytest.mark.parametrize("use_Q,use_V,IAC", [
    (True, False, False),   # COMA
    (False, True, True),    # IAC
    (False, True, False),   # central-V
    (True, True, False),    # blended
])
def test_baseline_update(use_Q, use_V, IAC):
    n, b = 2, 16
    alg = Baseline("particle", dict(l_action=5, l_goal=2),
                   AlgConfig(n_agents=n, stage=2, use_Q=use_Q, use_V=use_V,
                             IAC=IAC))
    batch = _particle_batch(jax.random.PRNGKey(0), b, n)
    ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"], batch["state"],
                        batch["goals"])
    ts2, m = jax.jit(alg.update)(ts, batch, 0.1, jax.random.PRNGKey(2))
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # params moved
    d = jax.tree_util.tree_map(lambda a, c: float(jnp.abs(a - c).max()),
                               ts.actor, ts2.actor)
    assert max(jax.tree_util.tree_leaves(d)) > 0


@pytest.mark.slow
def test_qmix_checkers_variant():
    env = Checkers(CheckersEnvConfig(agents_r=(0, 2), agents_c=(8, 8),
                                     n_agents=2))
    alg = QMIX("checkers", env.spec(),
               AlgConfig(alg_name="qmix", n_agents=2, stage=2), NNConfig())
    B = 4
    goals = jnp.tile(jnp.eye(2)[None], (B, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    st, ts_env = jax.vmap(env.reset)(keys, goals)
    st2, ts_env2 = jax.vmap(env.step)(st, jnp.ones((B, 2), jnp.int32))
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
    ts2, m = jax.jit(alg.update)(ts, batch, 0.2, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss_mixer"]))
    a = alg.act(ts2, ts_env.obs, goals, batch["a_prev"], 0.2,
                jax.random.PRNGKey(2))
    assert a.shape == (B, 2)


def test_baseline_checkers_coma():
    env = Checkers(CheckersEnvConfig(agents_r=(0, 2), agents_c=(8, 8),
                                     n_agents=2))
    alg = Baseline("checkers", env.spec(),
                   AlgConfig(n_agents=2, stage=2, use_Q=True), NNConfig())
    B = 4
    goals = jnp.tile(jnp.eye(2)[None], (B, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    st, ts_env = jax.vmap(env.reset)(keys, goals)
    st2, ts_env2 = jax.vmap(env.step)(st, jnp.ones((B, 2), jnp.int32))
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
    ts2, m = jax.jit(alg.update)(ts, batch, 0.2, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss_Q"]))
    assert np.isfinite(float(m["policy_loss"]))


@pytest.mark.slow
def test_qmix_learns_simple_signal():
    """One-step bandit check: identical states, action 2 pays +5/agent and
    action 0 pays -5/agent.  The state-conditioned hypernet bias cannot
    explain the difference, so the AGENT nets must separate the actions."""
    n, b = 2, 32
    alg = QMIX("particle", dict(l_action=5, l_goal=2),
               AlgConfig(alg_name="qmix", n_agents=n, stage=2, lr_Q=1e-2))
    half = _particle_batch(jax.random.PRNGKey(4), b // 2, n)
    dup = lambda x: jnp.concatenate([x, x], axis=0)
    batch = jax.tree_util.tree_map(dup, half)
    batch["a"] = jnp.concatenate([jnp.full((b // 2, n), 2, jnp.int32),
                                  jnp.full((b // 2, n), 0, jnp.int32)])
    batch["rl"] = jnp.concatenate([jnp.full((b // 2, n), 5.0),
                                   jnp.full((b // 2, n), -5.0)])
    batch["done"] = jnp.ones(b, bool)  # one-step episodes
    ts = alg.init_state(jax.random.PRNGKey(5), batch["obs"], batch["state"],
                        batch["goals"])
    update = jax.jit(alg.update)
    for i in range(300):
        ts, _ = update(ts, batch, 0.0, jax.random.PRNGKey(i))
    q = alg._agent_qs(ts.agent, batch["obs"], batch["goals"], None)
    assert float(q[..., 2].mean()) > float(q[..., 0].mean()), (
        float(q[..., 2].mean()), float(q[..., 0].mean()))
    # and the greedy joint action is 2 for most rows
    a = alg.act(ts, batch["obs"], batch["goals"], None, 0.0,
                jax.random.PRNGKey(9))
    assert float((a == 2).mean()) > 0.8


@pytest.mark.slow
def test_qmix_and_coma_roadway_update():
    """The roadway variants of QMIX / COMA execute a fused update with
    finite losses and produce valid actions (the reference ran these
    algs on the SUMO experiment: alg_qmix.py / alg_baseline.py)."""
    from cm3_tpu.core.config import RoadwayEnvConfig
    from cm3_tpu.envs.roadway import Roadway

    env = Roadway(RoadwayEnvConfig())
    B, n = 4, 2
    goals = jnp.tile(jnp.eye(4)[None, (3, 0), :], (B, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    st, ts_env = jax.vmap(lambda k: env.reset(k))(keys)
    st2, ts_env2 = jax.vmap(env.step)(st, jnp.ones((B, n), jnp.int32))
    batch = {
        "obs": ts_env.obs, "obs_next": ts_env2.obs,
        "state": ts_env.state, "state_next": ts_env2.state,
        "a": jnp.ones((B, n), jnp.int32),
        "a_prev": jnp.zeros((B, n), jnp.int32),
        "r": ts_env2.reward, "rl": ts_env2.reward_local,
        "done": ts_env2.done, "goals": goals,
    }
    for alg, key_metric in [
            (QMIX("roadway", env.spec(),
                  AlgConfig(alg_name="qmix", n_agents=n, stage=2),
                  NNConfig()), "loss_mixer"),
            (Baseline("roadway", env.spec(),
                      AlgConfig(n_agents=n, stage=2, use_Q=True),
                      NNConfig()), "loss_Q")]:
        ts = alg.init_state(jax.random.PRNGKey(0), batch["obs"],
                            batch["state"], goals)
        ts2, m = jax.jit(alg.update)(ts, batch, 0.2, jax.random.PRNGKey(1))
        assert np.isfinite(float(m[key_metric])), (type(alg).__name__, m)
        a = alg.act(ts2, ts_env.obs, goals, batch["a_prev"], 0.2,
                    jax.random.PRNGKey(2))
        assert a.shape == (B, n)
        assert bool(((a >= 0) & (a < 5)).all())


def test_qmix_ref_bug_mode_changes_target_and_runs():
    """AlgConfig.qmix_ref_bug reproduces the reference checkers wiring
    (MAIN agent q-values into the target mixer, alg_qmix_checkers.py:106):
    same batch, same params -> a different TD target than the fixed
    semantics, and a working update."""
    import dataclasses

    import numpy as np

    cfg = AlgConfig(n_agents=2, stage=2)
    spec = dict(l_action=5, l_goal=2)
    batch = _particle_batch(jax.random.PRNGKey(3), 32, 2)

    def one_update(c):
        alg = QMIX("particle", spec, c)
        ts = alg.init_state(jax.random.PRNGKey(1), batch["obs"],
                            batch["state"], batch["goals"])
        # desync main vs target so the two wirings actually differ
        ts2, _ = alg.update(ts, batch, 0.1, jax.random.PRNGKey(2))
        ts3, m = alg.update(ts2, batch, 0.1, jax.random.PRNGKey(4))
        return ts3, float(m["loss_mixer"])

    ts_fixed, loss_fixed = one_update(cfg)
    ts_bug, loss_bug = one_update(dataclasses.replace(cfg,
                                                      qmix_ref_bug=True))
    assert np.isfinite(loss_fixed) and np.isfinite(loss_bug)
    assert loss_fixed != loss_bug, "bug mode produced identical target"
