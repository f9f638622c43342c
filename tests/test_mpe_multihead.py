"""MultiDiscrete multi-head action composition (environment.py:177-225,
multi_discrete.py) — the last unported upstream MPE behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.envs.mpe import MPEEnv, mpe_step, mpe_step_multihead

# index-branch direction convention -> one-hot-branch convention
# (environment.py:194-197 vs :205-207: the pairs are swapped upstream)
SWAP = jnp.asarray([0, 2, 1, 4, 3])


@pytest.mark.parametrize("name", ["simple_spread", "simple_tag",
                                  "simple_speaker_listener"])
def test_onehot_multihead_matches_index_path(name):
    env = MPEEnv(name)
    world = env.scenario.world
    key = jax.random.PRNGKey(0)
    s0, _ = env.reset(key)
    s_idx, s_hot = s0, s0
    for t in range(6):
        move = jax.random.randint(jax.random.fold_in(key, t),
                                  (world.n_agents,), 0, 5)
        comm = jax.random.randint(jax.random.fold_in(key, 100 + t),
                                  (world.n_agents,),
                                  0, max(world.dim_c, 1))
        hot = jax.nn.one_hot(SWAP[move], 5)
        comm_vec = (jax.nn.one_hot(comm, world.dim_c)
                    if world.dim_c > 0 else None)
        s_idx = mpe_step(world, s_idx, move, comm)
        s_hot = mpe_step_multihead(world, s_hot, hot, comm_vec)
        np.testing.assert_array_equal(np.asarray(s_idx.pos),
                                      np.asarray(s_hot.pos))
        np.testing.assert_array_equal(np.asarray(s_idx.vel),
                                      np.asarray(s_hot.vel))
        np.testing.assert_array_equal(np.asarray(s_idx.c),
                                      np.asarray(s_hot.c))


def test_soft_vector_blends_forces():
    env = MPEEnv("simple_spread")
    world = env.scenario.world
    s0, _ = env.reset(jax.random.PRNGKey(1))
    n = world.n_agents
    half = jnp.zeros((n, 5)).at[:, 1].set(0.5)       # half-strength +x
    full = jnp.zeros((n, 5)).at[:, 1].set(1.0)
    s_half = mpe_step_multihead(world, s0, half)
    s_full = mpe_step_multihead(world, s0, full)
    s_noop = mpe_step_multihead(world, s0, jnp.zeros((n, 5)))
    dv_half = np.asarray(s_half.vel[:n, 0] - s_noop.vel[:n, 0])
    dv_full = np.asarray(s_full.vel[:n, 0] - s_noop.vel[:n, 0])
    np.testing.assert_allclose(dv_full, 2.0 * dv_half, rtol=1e-6)
    assert (dv_full > 0).all()


def test_env_step_multihead_entry():
    env = MPEEnv("simple_spread", max_steps=4)
    s, _ = env.reset(jax.random.PRNGKey(2))
    n = env.scenario.world.n_agents
    step = jax.jit(env.step_multihead)
    for _ in range(4):
        s, (obs, rew, done) = step(s, jnp.zeros((n, 5)))
    assert bool(done)
