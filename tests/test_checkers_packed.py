"""Differential tests: bit-packed Checkers dynamics vs the grid engine
(itself golden-tested against the reference in test_checkers_parity.py).
Same action sequences => identical per-agent rewards and done flags."""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.core.config import CheckersEnvConfig
from cm3_tpu.envs import checkers_packed as cp
from cm3_tpu.envs.checkers import Checkers

CFG2 = CheckersEnvConfig(n_agents=2, agents_r=(0, 2), agents_c=(8, 8),
                         max_steps=50)


def _run_grid(cfg, goals, actions):
    """actions: [T, N] -> (rewards [T, N], dones [T])."""
    env = Checkers(cfg)
    state, _ = env.reset(jax.random.PRNGKey(0), goals)
    rews, dones = [], []
    reset_state = state
    for a in actions:
        state, ts = jax.jit(env.step)(state, jnp.asarray(a))
        rews.append(np.asarray(ts.reward_local))
        dones.append(bool(ts.done))
        if dones[-1]:
            state = reset_state
    return np.stack(rews), np.asarray(dones)


def _run_packed(cfg, goal_green, actions):
    spec = cp.make_spec(cfg, goal_green)
    s = cp.packed_init(spec, ())
    step = jax.jit(lambda s, a: cp.packed_step(
        spec, s, tuple(a[i] for i in range(len(goal_green)))))
    rews, dones = [], []
    for a in actions:
        s, r, d = step(s, jnp.asarray(a, jnp.int32))
        rews.append(np.asarray(jnp.stack(r)))
        dones.append(bool(d))
    return np.stack(rews), np.asarray(dones)


def test_packed_matches_grid_random_actions():
    rng = np.random.default_rng(0)
    goals = jnp.eye(2)
    for trial in range(6):
        actions = rng.integers(0, 5, size=(120, 2))
        r_g, d_g = _run_grid(CFG2, goals, actions)
        r_p, d_p = _run_packed(CFG2, (True, False), actions)
        np.testing.assert_allclose(r_p, r_g, atol=1e-6,
                                   err_msg=f"trial {trial}")
        np.testing.assert_array_equal(d_p, d_g, err_msg=f"trial {trial}")


def test_packed_matches_grid_single_agent():
    cfg = CheckersEnvConfig(n_agents=1, agents_r=(2,), agents_c=(8,),
                            max_steps=50)
    goals = jnp.asarray([[0.0, 1.0]])     # orange goal -> start row 2
    rng = np.random.default_rng(1)
    actions = rng.integers(0, 5, size=(120, 1))
    r_g, d_g = _run_grid(cfg, goals, actions)
    r_p, d_p = _run_packed(cfg, (False,), actions)
    np.testing.assert_allclose(r_p, r_g, atol=1e-6)
    np.testing.assert_array_equal(d_p, d_g)


def test_packed_vectorized_scan_throughput_path():
    """The exact formulation the bench uses: [B] lanes under scan."""
    spec = cp.make_spec(CFG2, (True, False))
    B, T = 64, 100
    s = cp.packed_init(spec, (B,))

    def body(carry, k):
        s = carry
        a = jax.random.randint(k, (2, B), 0, 5)
        s, r, d = cp.packed_step(spec, s, (a[0], a[1]))
        return s, (jnp.stack(r), d)

    s, (rews, dones) = jax.jit(lambda s, k: jax.lax.scan(
        body, s, jax.random.split(k, T)))(s, jax.random.PRNGKey(0))
    assert rews.shape == (T, 2, B)
    # sanity: rewards live in the discrete support of the game
    vals = np.unique(np.asarray(rews, np.float64).round(2))
    allowed = np.array([-0.6, -0.5, -0.4, -0.1, 0.0, 0.4, 0.5, 0.6, 0.9,
                        1.0, 1.1])
    assert all(np.isclose(allowed, v).any() for v in vals), vals
    # every instance terminates at least once in 100 steps (cap 50)
    assert bool(np.asarray(dones).any(axis=0).all())


def test_blocked_by_other_agent_and_border():
    spec = cp.make_spec(CFG2, (True, False))
    s = cp.packed_init(spec, ())
    # both at column 8 (start col), rows 0 and 2. agent0 down -> row 1;
    # agent1 up -> row1 now occupied by agent0 -> blocked, -0.1
    s2, r, d = cp.packed_step(spec, s, (jnp.int32(2), jnp.int32(1)))
    assert float(r[0]) == pytest.approx(0.0)    # start col has no reward
    assert float(r[1]) == pytest.approx(-0.1)
    # border: agent0 at row1 col8 moving right -> off-board, -0.1
    s3, r3, _ = cp.packed_step(spec, s2, (jnp.int32(4), jnp.int32(0)))
    assert float(r3[0]) == pytest.approx(-0.1)
