"""Cooperative-navigation particle environment as a pure-JAX engine.

Re-implements the reference's forked OpenAI MPE physics
(``multiagent/core.py:117-196``) and the ``multi-goal_spread`` scenario
(``multiagent/scenarios/multi-goal_spread.py``) plus the modified
``MultiAgentEnv`` step/reset contract (``multiagent/environment.py:81-149``)
as vectorizable pure functions.

Semantics parity notes:
  * discrete action index -> axis force (environment.py:194-214,
    ``discrete_action_input=True``): 0 noop, 1:-x, 2:+x, 3:-y, 4:+y,
    scaled by sensitivity 5.0;
  * soft-contact collision forces between agent pairs only (landmarks
    don't collide): penetration = k*logaddexp(0, -(dist-dist_min)/k),
    F = contact_force * delta/dist * penetration (core.py:180-196);
  * integration: vel = vel*(1-damping) + F/m*dt; pos += vel*dt
    (core.py:158-169; agents have no max_speed);
  * reward = -dist(agent, own landmark) - 1 per colliding other agent;
    ``reached`` at dist <= 0.05 BEFORE the collision penalty
    (multi-goal_spread.py:121-138);
  * episode done at step cap or all reached (environment.py:118-121);
  * obs = ([vel, pos], concat of others' relative vel/pos in index order);
    for n_agents==1 the "others" slot holds self-relative zeros
    (multi-goal_spread.py:145-154);
  * reset: with prob_random BOTH agents and landmarks are uniform(-1,1),
    else config positions (+ Gaussian noise on agents only)
    (multi-goal_spread.py:65-93);
  * ``collisions`` counts ordered colliding pairs cumulatively over the
    episode (used for dual-buffer routing, train_offpolicy.py:373-374).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from cm3_tpu.core.config import ParticleEnvConfig
from cm3_tpu.envs import base


@struct.dataclass
class ParticleState:
    pos: jax.Array        # [N, 2]
    vel: jax.Array        # [N, 2]
    landmarks: jax.Array  # [N, 2]
    reached: jax.Array    # [N] bool
    steps: jax.Array      # i32
    collisions: jax.Array  # i32 cumulative ordered-pair count


class Particle(base.Env):

    def __init__(self, cfg: ParticleEnvConfig):
        self.cfg = cfg

    def spec(self):
        n = self.cfg.n_agents
        return dict(l_action=5, l_goal=2, l_obs_self=4,
                    l_obs_others=4 * max(n - 1, 1), l_state_one=4,
                    n_agents=n)

    # ------------------------------------------------------------------ #

    def reset(self, key, goals=None):
        """goals is unused (landmark positions ARE the goals; the trainer
        reads them from the returned state, train_offpolicy.py:288-290)."""
        del goals
        c = self.cfg
        n = c.n_agents
        k_branch, k_apos, k_lpos, k_noise = jax.random.split(key, 4)
        uniform_all = jax.random.uniform(k_branch) < c.prob_random

        pos_rand = jax.random.uniform(k_apos, (n, 2), minval=-1.0, maxval=1.0)
        lm_rand = jax.random.uniform(k_lpos, (n, 2), minval=-1.0, maxval=1.0)
        pos_cfg = jnp.stack([jnp.asarray(c.agents_x), jnp.asarray(c.agents_y)],
                            axis=1).astype(jnp.float32)
        pos_cfg = pos_cfg + c.initial_std * jax.random.normal(k_noise, (n, 2))
        lm_cfg = jnp.stack([jnp.asarray(c.landmarks_x),
                            jnp.asarray(c.landmarks_y)],
                           axis=1).astype(jnp.float32)

        state = ParticleState(
            pos=jnp.where(uniform_all, pos_rand, pos_cfg),
            vel=jnp.zeros((n, 2)),
            landmarks=jnp.where(uniform_all, lm_rand, lm_cfg),
            reached=jnp.zeros((n,), bool),
            steps=jnp.int32(0), collisions=jnp.int32(0))
        ts = base.TimeStep(
            obs=self._observe(state), state=self._global_state(state),
            reward=jnp.float32(0.0), reward_local=jnp.zeros((n,)),
            done=jnp.bool_(False))
        return state, ts

    # ------------------------------------------------------------------ #

    def _pair_forces(self, pos):
        """Soft-contact collision forces, [N, 2] (core.py:143-196)."""
        c = self.cfg
        n = pos.shape[0]
        delta = pos[:, None, :] - pos[None, :, :]           # [i, j, 2]
        dist = jnp.sqrt(jnp.sum(jnp.square(delta), -1))
        eye = jnp.eye(n, dtype=bool)
        safe = jnp.where(eye, 1.0, dist)
        dist_min = 2 * c.agent_size
        k = c.contact_margin
        pen = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
        f = c.contact_force * delta / safe[..., None] * pen[..., None]
        f = jnp.where(eye[..., None], 0.0, f)
        return jnp.sum(f, axis=1)

    def step(self, state: ParticleState, actions):
        c = self.cfg
        n = c.n_agents
        a = jnp.asarray(actions, jnp.int32)
        # discrete action -> force (environment.py:194-214)
        ux = ((a == 2).astype(jnp.float32) - (a == 1).astype(jnp.float32))
        uy = ((a == 4).astype(jnp.float32) - (a == 3).astype(jnp.float32))
        u = jnp.stack([ux, uy], axis=-1) * c.accel

        force = u + self._pair_forces(state.pos)
        vel = state.vel * (1.0 - c.damping) + force * c.dt
        pos = state.pos + vel * c.dt

        # rewards (multi-goal_spread.py:121-138)
        d_goal = jnp.linalg.norm(pos - state.landmarks, axis=-1)
        reached = -d_goal >= -0.05
        delta = pos[:, None, :] - pos[None, :, :]
        dist = jnp.sqrt(jnp.sum(jnp.square(delta), -1))
        colliding = (dist < 2 * c.agent_size) & ~jnp.eye(n, dtype=bool)
        n_coll = jnp.sum(colliding, axis=1).astype(jnp.float32)
        rl = -d_goal - n_coll

        steps = state.steps + 1
        done = (steps == c.max_steps) | jnp.all(reached)

        new_state = state.replace(
            pos=pos, vel=vel, reached=reached, steps=steps,
            collisions=state.collisions + jnp.sum(colliding).astype(jnp.int32))
        ts = base.TimeStep(
            obs=self._observe(new_state), state=self._global_state(new_state),
            reward=jnp.sum(rl), reward_local=rl, done=done)
        return new_state, ts

    # ------------------------------------------------------------------ #

    def _observe(self, state: ParticleState):
        c = self.cfg
        n = c.n_agents
        self_v = jnp.concatenate([state.vel, state.pos], axis=-1)  # [N, 4]
        if n == 1:
            others = jnp.zeros((1, 4), jnp.float32)
        else:
            rel = jnp.concatenate(
                [state.vel[None, :, :] - state.vel[:, None, :],
                 state.pos[None, :, :] - state.pos[:, None, :]],
                axis=-1)  # [self i, other j, 4]
            rows = [jnp.concatenate([rel[i, j] for j in range(n) if j != i])
                    for i in range(n)]
            others = jnp.stack(rows)
        return dict(others=others, self_v=self_v)

    def _global_state(self, state: ParticleState):
        return dict(vec=jnp.concatenate([state.vel, state.pos], axis=-1))
