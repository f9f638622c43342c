"""Golden-trajectory parity: JAX Checkers engine vs reference NumPy engine.

Same action sequence => identical world, locations, observations, rewards
and done flags at every step (BASELINE.md parity target).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cm3_tpu.core.config import CheckersEnvConfig
from cm3_tpu.envs.checkers import Checkers

import reference_oracles as oracles

pytestmark = pytest.mark.skipif(
    not oracles.reference_available(), reason="reference tree not mounted")


def _ref_env(cfg, ref_mod):
    return ref_mod.Checkers(
        n_rows=cfg.n_rows, n_columns=cfg.n_columns, n_obs=cfg.n_obs,
        agents_r=list(cfg.agents_r), agents_c=list(cfg.agents_c),
        n_agents=cfg.n_agents, max_steps=cfg.max_steps)


def _check_timestep(ts, ref_state, ref_obs, ref_rewards=None, ref_done=None):
    (ref_grid, ref_vec) = ref_state
    np.testing.assert_allclose(np.asarray(ts.state["grid"]), ref_grid,
                               err_msg="global grid")
    np.testing.assert_allclose(np.asarray(ts.state["vec"]),
                               np.stack(ref_vec), err_msg="global vec")
    ref_others, ref_self_t, ref_self_v = ref_obs
    np.testing.assert_allclose(np.asarray(ts.obs["others"]),
                               np.stack(ref_others), err_msg="obs others")
    np.testing.assert_allclose(np.asarray(ts.obs["self_t"]),
                               np.stack(ref_self_t), err_msg="obs self_t")
    np.testing.assert_allclose(np.asarray(ts.obs["self_v"]),
                               np.stack(ref_self_v), err_msg="obs self_v")
    if ref_rewards is not None:
        np.testing.assert_allclose(np.asarray(ts.reward_local), ref_rewards,
                                   rtol=1e-6, err_msg="local rewards")
        np.testing.assert_allclose(float(ts.reward), np.sum(ref_rewards),
                                   rtol=1e-6)
    if ref_done is not None:
        assert bool(ts.done) == bool(ref_done)


@pytest.mark.parametrize("n_agents,goals", [
    (1, np.array([[1.0, 0.0]])),
    (1, np.array([[0.0, 1.0]])),
    (2, np.eye(2)),
])
def test_trajectory_parity(n_agents, goals):
    ref_mod = oracles.load_checkers()
    if n_agents == 1:
        cfg = CheckersEnvConfig(agents_r=(0,), agents_c=(8,), n_agents=1,
                                max_steps=50)
    else:
        cfg = CheckersEnvConfig(agents_r=(0, 2), agents_c=(8, 8), n_agents=2,
                                max_steps=50)
    env = Checkers(cfg)
    ref = _ref_env(cfg, ref_mod)

    step = jax.jit(env.step)

    rng = np.random.RandomState(0)
    for episode in range(3):
        ref_gs, ref_oo, ref_ot, ref_ov, ref_done = ref.reset(goals)
        state, ts = env.reset(jax.random.PRNGKey(0), goals)
        _check_timestep(ts, ref_gs, (ref_oo, ref_ot, ref_ov))
        done = False
        t = 0
        while not done and t < cfg.max_steps:
            actions = rng.randint(0, 5, size=n_agents)
            (ref_gs, ref_oo, ref_ot, ref_ov, ref_rg, ref_rl,
             ref_done) = (lambda out: (out[0], out[1], out[2], out[3],
                                       out[4], out[5], out[6]))(
                 ref.step(list(actions)))
            state, ts = step(state, jnp.asarray(actions))
            _check_timestep(ts, ref_gs, (ref_oo, ref_ot, ref_ov),
                            np.asarray(ref_rl), ref_done)
            done = bool(ref_done)
            t += 1
        assert done  # episodes must terminate within max_steps


@pytest.mark.slow
def test_vectorized_batch_consistency():
    """vmapped engine == loop over single instances."""
    cfg = CheckersEnvConfig(agents_r=(0, 2), agents_c=(8, 8), n_agents=2,
                            max_steps=50)
    env = Checkers(cfg)
    B = 8
    goals = jnp.tile(jnp.eye(2)[None], (B, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
    vstate, vts = jax.vmap(env.reset)(keys, goals)
    rng = np.random.RandomState(1)
    actions = jnp.asarray(rng.randint(0, 5, size=(B, 2)))
    vstate2, vts2 = jax.jit(jax.vmap(env.step))(vstate, actions)
    for b in range(B):
        s, _ = env.reset(jax.random.PRNGKey(b), goals[b])
        s2, ts2 = env.step(s, actions[b])
        np.testing.assert_allclose(np.asarray(vts2.reward_local[b]),
                                   np.asarray(ts2.reward_local))
        np.testing.assert_allclose(np.asarray(vstate2.world[b]),
                                   np.asarray(s2.world))


def test_collision_blocking():
    """Two adjacent agents: the second cannot move into the first's cell."""
    cfg = CheckersEnvConfig(agents_r=(0, 1), agents_c=(8, 8), n_agents=2,
                            max_steps=50)
    env = Checkers(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0), jnp.eye(2))
    # agent 1 tries to move up into agent 0's cell -> blocked, -0.1
    state2, ts = env.step(state, jnp.array([0, 1]))
    assert float(ts.reward_local[1]) == pytest.approx(-0.1)
    np.testing.assert_array_equal(np.asarray(state2.loc), np.asarray(state.loc))
