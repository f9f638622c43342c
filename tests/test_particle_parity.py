"""Golden parity: JAX particle engine vs reference MPE core + scenario.

Parity contract (SURVEY.md §7): same initial conditions + same action
sequence => identical positions, velocities, rewards, observations and
done flags (float32 vs float64 tolerance).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cm3_tpu.core.config import ParticleEnvConfig
from cm3_tpu.envs.particle import Particle

import reference_oracles as oracles

pytestmark = pytest.mark.skipif(
    not oracles.reference_available(), reason="reference tree not mounted")


class RefParticle:
    """Drives the reference World + Scenario exactly as the reference
    MultiAgentEnv does (environment.py:81-123), without the gym dep."""

    def __init__(self, cfg: ParticleEnvConfig):
        oracles.ensure_multiagent_package()
        scen_mod = oracles.load_module(
            "env/multiagent-particle-envs/multiagent/scenarios/"
            "multi-goal_spread.py", "ref_mgs")
        self.scenario = scen_mod.Scenario()
        config = dict(agents_x=list(cfg.agents_x), agents_y=list(cfg.agents_y),
                      landmarks_x=list(cfg.landmarks_x),
                      landmarks_y=list(cfg.landmarks_y),
                      initial_std=cfg.initial_std)
        # prob_random=0 -> deterministic config reset
        self.world = self.scenario.make_world(cfg.n_agents, config, 0.0)
        self.n = cfg.n_agents
        self.max_steps = cfg.max_steps

    def reset(self):
        self.scenario.reset_world(self.world)
        self.steps = 0
        return self._obs()

    def _obs(self):
        obs_self, obs_others = [], []
        for agent in self.world.agents:
            s, o = self.scenario.observation(agent, self.world)
            obs_self.append(s)
            obs_others.append(o)
        return np.stack(obs_self), np.stack(obs_others)

    def step(self, actions):
        # _set_action with discrete_action_input (environment.py:192-214)
        for i, agent in enumerate(self.world.agents):
            u = np.zeros(2)
            a = int(actions[i])
            if a == 1:
                u[0] = -1.0
            elif a == 2:
                u[0] = +1.0
            elif a == 3:
                u[1] = -1.0
            elif a == 4:
                u[1] = +1.0
            agent.action.u = u * 5.0
            agent.action.c = np.zeros(self.world.dim_c)
        self.world.step()
        self.steps += 1
        rewards, dones = [], []
        for agent in self.world.agents:
            rewards.append(self.scenario.reward(agent, self.world))
            dones.append(self.scenario.done(agent, self.world))
        done = self.steps == self.max_steps or all(dones)
        state = np.stack([np.concatenate([a.state.p_vel, a.state.p_pos])
                          for a in self.world.agents])
        obs_self, obs_others = self._obs()
        return state, obs_others, obs_self, np.array(rewards), done


CONFIGS = {
    "stage1": ParticleEnvConfig(
        n_agents=1, agents_x=(-1.0,), agents_y=(-1.0,), landmarks_x=(1.0,),
        landmarks_y=(1.0,), initial_std=0.0, prob_random=0.0),
    "antipodal": ParticleEnvConfig(
        n_agents=4, agents_x=(-0.9, 0.9, -0.9, 0.9),
        agents_y=(-0.9, 0.9, 0.9, -0.9), landmarks_x=(0.9, -0.9, 0.9, -0.9),
        landmarks_y=(0.9, -0.9, -0.9, 0.9), initial_std=0.0, prob_random=0.0),
    "merge": ParticleEnvConfig(
        n_agents=2, agents_x=(-0.9, -0.9), agents_y=(0.2, -0.2),
        landmarks_x=(0.9, 0.9), landmarks_y=(-0.2, 0.2), initial_std=0.0,
        prob_random=0.0),
}


@pytest.mark.parametrize("name", list(CONFIGS))
def test_trajectory_parity(name):
    cfg = CONFIGS[name]
    env = Particle(cfg)
    ref = RefParticle(cfg)
    step = jax.jit(env.step)

    rng = np.random.RandomState(3)
    for episode in range(2):
        ref.reset()
        state, ts = env.reset(jax.random.PRNGKey(0), None)
        done = False
        t = 0
        while not done and t < cfg.max_steps:
            actions = rng.randint(0, 5, size=cfg.n_agents)
            r_state, r_others, r_self, r_rew, r_done = ref.step(actions)
            state, ts = step(state, jnp.asarray(actions))
            np.testing.assert_allclose(np.asarray(ts.state["vec"]), r_state,
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(ts.obs["self_v"]), r_self,
                                       rtol=1e-4, atol=1e-5)
            if cfg.n_agents > 1:
                np.testing.assert_allclose(np.asarray(ts.obs["others"]),
                                           r_others, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(ts.reward_local), r_rew,
                                       rtol=1e-4, atol=1e-5)
            assert bool(ts.done) == bool(r_done)
            done = bool(r_done)
            t += 1


def test_reached_freezes_nothing_episode_continues():
    """Per-agent 'reached' does not stop the others; episode ends when all
    reach or at the cap."""
    cfg = CONFIGS["merge"]
    env = Particle(cfg)
    state, ts = env.reset(jax.random.PRNGKey(0), None)
    # drive both agents right (+x) toward their landmarks
    for _ in range(cfg.max_steps):
        state, ts = env.step(state, jnp.array([2, 2]))
        if bool(ts.done):
            break
    assert bool(ts.done)


def test_random_reset_branch():
    cfg = ParticleEnvConfig(n_agents=2, agents_x=(-0.9, -0.9),
                            agents_y=(0.2, -0.2), landmarks_x=(0.9, 0.9),
                            landmarks_y=(-0.2, 0.2), prob_random=1.0)
    env = Particle(cfg)
    s1, _ = env.reset(jax.random.PRNGKey(1), None)
    s2, _ = env.reset(jax.random.PRNGKey(2), None)
    # uniform branch: different keys give different layouts
    assert not np.allclose(np.asarray(s1.pos), np.asarray(s2.pos))
    assert np.abs(np.asarray(s1.landmarks)).max() <= 1.0
