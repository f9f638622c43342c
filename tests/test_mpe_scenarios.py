"""Differential tests: the JAX MPE scenario suite (cm3_tpu/envs/mpe.py)
vs the upstream reference scenarios, driven through the reference World
physics directly (no gym).  Same initial state + same action sequence =>
matching positions, velocities, per-agent rewards, and observations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import reference_oracles as oracles
from cm3_tpu.envs import mpe

pytestmark = pytest.mark.skipif(not oracles.reference_available(),
                                reason="reference tree not mounted")

T = 25
SEEDS = (0, 1, 2)


def _load_ref_scenario(name):
    oracles.ensure_multiagent_package()
    oracles.load_module(
        "env/multiagent-particle-envs/multiagent/core.py",
        "multiagent.core")
    oracles.load_module(
        "env/multiagent-particle-envs/multiagent/scenario.py",
        "multiagent.scenario")
    import sys
    mod = oracles.load_module(
        f"env/multiagent-particle-envs/multiagent/scenarios/{name}.py",
        f"ref_scenario_{name}")
    return mod.Scenario()


def _goal_indices(name, world):
    lms = world.landmarks
    idx = lambda lm: next(i for i, l in enumerate(lms) if l is lm)
    if name in ("simple_adversary", "simple_push"):
        return [idx(world.agents[0].goal_a)]
    if name == "simple_speaker_listener":
        return [idx(world.agents[0].goal_b)]
    if name == "simple_reference":
        return [idx(world.agents[0].goal_b), idx(world.agents[1].goal_b)]
    if name == "simple_crypto":
        goal = idx(world.agents[0].goal_a)
        key = int(np.argmax(world.agents[2].key))
        return [goal, key]
    return []


def _sync_state(scn, name, world):
    """Build our MPEState from the freshly-reset reference world."""
    pos = np.array([e.state.p_pos for e in world.agents]
                   + [l.state.p_pos for l in world.landmarks])
    vel = np.array([e.state.p_vel for e in world.agents]
                   + [l.state.p_vel for l in world.landmarks])
    n = len(world.agents)
    dim_c = max(world.dim_c, 1)
    return mpe.MPEState(
        pos=jnp.asarray(pos, jnp.float32),
        vel=jnp.asarray(vel, jnp.float32),
        c=jnp.zeros((n, dim_c), jnp.float32),
        goal=jnp.asarray(_goal_indices(name, world), jnp.int32),
        steps=jnp.int32(0))


def _apply_ref_actions(world, move, comm):
    for i, agent in enumerate(world.agents):
        u = np.zeros(2)
        a = int(move[i])
        if a == 1:
            u[0] = -1.0
        elif a == 2:
            u[0] = +1.0
        elif a == 3:
            u[1] = -1.0
        elif a == 4:
            u[1] = +1.0
        sens = 5.0 if agent.accel is None else agent.accel
        agent.action.u = u * sens
        if world.dim_c > 0:
            c = np.zeros(world.dim_c)
            c[int(comm[i]) % world.dim_c] = 1.0
            agent.action.c = c


def _ref_rewards_obs(scn, world):
    r = np.array([scn.reward(a, world) for a in world.agents])
    o = [np.asarray(scn.observation(a, world), np.float64)
         for a in world.agents]
    return r, o


@pytest.mark.parametrize("name", sorted(mpe.SCENARIOS))
def test_scenario_differential(name):
    ref = _load_ref_scenario(name)
    ours = mpe.SCENARIOS[name]()
    w = ours.world
    step = jax.jit(lambda s, m, c: mpe.mpe_step(w, s, m, c))
    rew_fn = jax.jit(ours.reward)
    obs_fn = jax.jit(ours.obs)

    for seed in SEEDS:
        np.random.seed(seed)
        world = ref.make_world()          # calls reset_world internally
        state = _sync_state(ours, name, world)
        assert w.n_agents == len(world.agents)
        assert w.n_landmarks == len(world.landmarks)

        rng = np.random.default_rng(seed + 100)
        for t in range(T):
            # compare rewards/obs on the CURRENT state first
            r_ref, o_ref = _ref_rewards_obs(ref, world)
            r = np.asarray(rew_fn(state))
            np.testing.assert_allclose(
                r, r_ref, atol=2e-3, rtol=1e-4,
                err_msg=f"{name} seed={seed} t={t} rewards")
            o = np.asarray(obs_fn(state))
            for i in range(w.n_agents):
                np.testing.assert_allclose(
                    o[i, :len(o_ref[i])], o_ref[i], atol=2e-3, rtol=1e-3,
                    err_msg=f"{name} seed={seed} t={t} obs agent {i}")
                assert len(o_ref[i]) == ours.obs_dims[i], (
                    name, i, len(o_ref[i]), ours.obs_dims[i])

            move = rng.integers(0, 5, w.n_agents)
            comm = rng.integers(0, max(w.dim_c, 1), w.n_agents)
            _apply_ref_actions(world, move, comm)
            world.step()
            state = step(state, jnp.asarray(move, jnp.int32),
                         jnp.asarray(comm, jnp.int32))

            pos_ref = np.array([e.state.p_pos for e in world.agents])
            vel_ref = np.array([e.state.p_vel for e in world.agents])
            np.testing.assert_allclose(
                np.asarray(state.pos[:w.n_agents]), pos_ref, atol=2e-3,
                err_msg=f"{name} seed={seed} t={t} pos")
            np.testing.assert_allclose(
                np.asarray(state.vel[:w.n_agents]), vel_ref, atol=2e-3,
                err_msg=f"{name} seed={seed} t={t} vel")


@pytest.mark.slow
def test_env_wrapper_vectorized():
    """MPEEnv drives vectorized under vmap+jit for every scenario."""
    B = 8
    for name in sorted(mpe.SCENARIOS):
        env = mpe.MPEEnv(name, max_steps=10)
        n = env.scenario.world.n_agents
        keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B))
        state, _ = jax.jit(jax.vmap(env.reset))(keys)
        move = jnp.zeros((B, n), jnp.int32)
        state, (obs, rew, done) = jax.jit(jax.vmap(env.step))(state, move)
        assert obs.shape[0] == B and rew.shape == (B, n)
