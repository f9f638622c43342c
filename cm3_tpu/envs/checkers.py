"""Checkers grid world as a pure-JAX engine.

Re-implements the exact semantics of the reference ``env/checkers.py``
(3xC reward grid of alternating green/orange cells, +1 agent-start column,
``n_obs`` padding ring, 5 actions, goal-conditioned +-1/-0.5 rewards,
-0.1 invalid-move penalty, mutual blocking via the invalid channel,
sequential per-agent move resolution) as a pure function over a
struct-of-arrays state, so thousands of instances step in lockstep under
``jit``/``vmap``.

Semantics parity notes (all cites into the reference file):
  * world tensor channels: 0=green (-1 present, +1 collected), 1=orange,
    2=invalid (1 border, -1 agent-occupied, 0 free)  — ``populate_world:38-63``
  * agents act **in index order** within one env step and block each other
    through channel 2 — ``step:228-238`` + ``agent_act:157-187``.  This is
    implemented as a ``lax.scan`` over the agent axis (NOT a vmap, which
    would change semantics).
  * reward collection happens at the agent's post-move cell, green checked
    before orange — ``get_reward:190-225``.
  * termination: step cap, or all-of-goal-color collected (n=1), or all
    cells collected (n>1) — ``step:246-260``.
  * observations: 5x5x3 egocentric crop with own-cell invalid cleared
    (``get_obs:97-109``), normalized self vector (``get_local_observation:
    128-154``), others' normalized coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from cm3_tpu.core.config import CheckersEnvConfig
from cm3_tpu.envs import base

def _offsets(a):
    """Action -> (dr, dc) for stay/up/down/left/right, computed
    arithmetically (a constant-table gather with a traced index lowers
    pathologically slowly in scan bodies on this JAX version)."""
    dr = (a == 2).astype(jnp.int32) - (a == 1).astype(jnp.int32)
    dc = (a == 4).astype(jnp.int32) - (a == 3).astype(jnp.int32)
    return dr, dc


@struct.dataclass
class CheckersState:
    world: jax.Array      # [total_rows, total_columns, 3] f32
    loc: jax.Array        # [n_agents, 2] i32 (expanded-grid coordinates)
    collected: jax.Array  # [n_agents, 2] f32 (#green, #orange)
    goals: jax.Array      # [n_agents, l_goal] f32 one-hot
    steps: jax.Array      # i32 scalar


class Checkers(base.Env):

    def __init__(self, cfg: CheckersEnvConfig):
        self.cfg = cfg

    # ------------------------------------------------------------------ #

    def spec(self):
        c = self.cfg
        n = c.n_agents
        return dict(
            rows_state=c.n_rows, columns_state=c.n_columns + 1,
            channels_state=2, l_state_one=4,
            l_obs_others=2 * max(n - 1, 1), l_obs_self=4,
            rows_obs=2 * c.n_obs + 1, columns_obs=2 * c.n_obs + 1,
            channels_obs=3, l_action=5, l_goal=2, n_agents=n)

    def _initial_world(self, loc):
        """populate_world (checkers.py:38-63) as array ops."""
        c = self.cfg
        tr, tc = c.total_rows, c.total_columns
        world = jnp.zeros((tr, tc, 3), dtype=jnp.float32)

        rows = jnp.arange(tr)[:, None]
        cols = jnp.arange(tc)[None, :]
        border = ((cols < c.n_obs) | (rows < c.n_obs)
                  | (rows >= c.n_obs + c.n_rows)
                  | (cols >= c.n_obs + c.n_columns + 1))
        world = world.at[:, :, 2].set(border.astype(jnp.float32))

        # reward cells: rows alternate which color leads (green first on row 0)
        in_reward = ((rows >= c.n_obs) & (rows < c.n_obs + c.n_rows)
                     & (cols >= c.n_obs) & (cols < c.n_obs + c.n_columns))
        row_par = (rows - c.n_obs) % 2   # 0: green leads
        col_par = (cols - c.n_obs) % 2
        green = in_reward & (col_par == row_par)
        orange = in_reward & (col_par != row_par)
        world = world.at[:, :, 0].set(jnp.where(green, -1.0, 0.0))
        world = world.at[:, :, 1].set(jnp.where(orange, -1.0, 0.0))

        # agent cells are invalid (-1) so agents block each other
        # (mask-compare instead of fancy-index scatter: compiles much faster)
        agent_mask = ((rows[None, :, :] == loc[:, 0, None, None])
                      & (cols[None, :, :] == loc[:, 1, None, None])).any(0)
        world = world.at[:, :, 2].set(
            jnp.where(agent_mask, -1.0, world[:, :, 2]))
        return world

    def reset(self, key, goals):
        """checkers.py:265-291.  ``key`` is unused (deterministic given
        goals) but kept for the uniform interface."""
        del key
        c = self.cfg
        goals = jnp.asarray(goals, jnp.float32)
        agents_r = jnp.asarray(c.agents_r, jnp.int32) + c.n_obs
        agents_c = jnp.asarray(c.agents_c, jnp.int32) + c.n_obs
        if c.n_agents == 1:
            # single agent starts on row 0 (goal green) or row 2 (goal orange)
            agents_r = jnp.where(goals[0, 0] == 1,
                                 jnp.asarray([0], jnp.int32),
                                 jnp.asarray([2], jnp.int32)) + c.n_obs
        loc = jnp.stack([agents_r, agents_c], axis=1)
        world = self._initial_world(loc)
        state = CheckersState(
            world=world, loc=loc,
            collected=jnp.zeros((c.n_agents, 2), jnp.float32),
            goals=goals, steps=jnp.int32(0))
        ts = base.TimeStep(
            obs=self._observe(state), state=self._global_state(state),
            reward=jnp.float32(0.0),
            reward_local=jnp.zeros((c.n_agents,), jnp.float32),
            done=jnp.bool_(False))
        return state, ts

    # ------------------------------------------------------------------ #

    def step(self, state: CheckersState, actions):
        c = self.cfg
        actions = jnp.asarray(actions, jnp.int32)
        rows = jnp.arange(c.total_rows)[:, None]
        cols = jnp.arange(c.total_columns)[None, :]

        # Sequential per-agent resolution, expressed entirely as masked
        # elementwise grid ops (no scatters/gathers — those lower to slow
        # TPU kernels; masks ride the VPU and fuse).  Semantics identical
        # to the scatter formulation (checkers.py:157-225).
        def agent_move(carry, idx):
            ch_g, ch_o, ch_i, loc, collected = carry
            a = actions[idx]
            r, cc = loc[idx, 0], loc[idx, 1]
            dr, dc = _offsets(a)
            tr, tc = r + dr, cc + dc
            at_cur = (rows == r) & (cols == cc)
            at_tgt = (rows == tr) & (cols == tc)
            tgt_invalid = jnp.sum(jnp.where(at_tgt, ch_i, 0.0))
            can_move = (a != 0) & (tgt_invalid == 0.0)
            penalty = jnp.where((a != 0) & ~can_move, -0.1, 0.0)
            ch_i = jnp.where(can_move & at_tgt, -1.0,
                             jnp.where(can_move & at_cur, 0.0, ch_i))
            nr = jnp.where(can_move, tr, r)
            nc = jnp.where(can_move, tc, cc)
            at_new = jnp.where(can_move, at_tgt, at_cur)
            loc = loc.at[idx].set(jnp.stack([nr, nc]))
            # collect reward at new cell (get_reward:190-225)
            g_green = state.goals[idx, 0] == 1.0
            has_green = jnp.sum(jnp.where(at_new, ch_g, 0.0)) == -1.0
            has_orange = (~has_green) & (
                jnp.sum(jnp.where(at_new, ch_o, 0.0)) == -1.0)
            rew = jnp.where(
                has_green, jnp.where(g_green, 1.0, -0.5),
                jnp.where(has_orange, jnp.where(g_green, -0.5, 1.0), 0.0))
            ch_g = jnp.where(at_new & has_green, 1.0, ch_g)
            ch_o = jnp.where(at_new & has_orange, 1.0, ch_o)
            collected = collected.at[idx, 0].add(has_green.astype(jnp.float32))
            collected = collected.at[idx, 1].add(has_orange.astype(jnp.float32))
            return (ch_g, ch_o, ch_i, loc, collected), penalty + rew

        (ch_g, ch_o, ch_i, loc, collected), local_rewards = jax.lax.scan(
            agent_move,
            (state.world[:, :, 0], state.world[:, :, 1], state.world[:, :, 2],
             state.loc, state.collected),
            jnp.arange(c.n_agents))
        world = jnp.stack([ch_g, ch_o, ch_i], axis=-1)

        steps = state.steps + 1
        half = c.max_collectible / 2.0
        if c.n_agents == 1:
            done_collect = jnp.where(
                state.goals[0, 0] == 1.0,
                jnp.sum(world[:, :, 0]) == half,
                jnp.sum(world[:, :, 1]) == half)
        else:
            done_collect = jnp.sum(world[:, :, 0:2]) == float(c.max_collectible)
        done = (steps == c.max_steps) | done_collect

        new_state = state.replace(world=world, loc=loc, collected=collected,
                                  steps=steps)
        ts = base.TimeStep(
            obs=self._observe(new_state), state=self._global_state(new_state),
            reward=jnp.sum(local_rewards), reward_local=local_rewards,
            done=done)
        return new_state, ts

    # ------------------------------------------------------------------ #

    def _normalize(self, loc):
        """checkers.py:112-125 — center/scale coordinates."""
        c = self.cfg
        loc = loc.astype(jnp.float32)
        return jnp.stack(
            [(loc[..., 0] - c.total_rows / 2.0) / c.total_rows,
             (loc[..., 1] - c.total_columns / 2.0) / c.total_columns], axis=-1)

    def _observe(self, state: CheckersState):
        c = self.cfg
        k = c.n_obs

        # Egocentric (2k+1)^2 crop around each agent.  A dynamic_slice with
        # traced starts lowers to batched gathers (~3M steps/s); einsum
        # lowers to heavily padded tiny dot_generals (~10M).  The grid is
        # tiny, so select rows/cols with one-hot masks as explicit
        # broadcast-multiply + reduce, which stays fused on the VPU
        # (~27M crop-steps/s measured at B=8192).  The n_obs padding ring
        # guarantees r±k / c±k stay in range.
        span = jnp.arange(2 * k + 1)
        sel_r = jax.nn.one_hot(state.loc[:, 0, None] - k + span[None],
                               c.total_rows)             # [N, 2k+1, R]
        sel_c = jax.nn.one_hot(state.loc[:, 1, None] - k + span[None],
                               c.total_columns)          # [N, 2k+1, C]
        rows = (sel_r[..., None, None]
                * state.world[None, None]).sum(2)        # [N, 2k+1, C, 3]
        grids = (rows[:, :, None]
                 * sel_c[:, None, :, :, None]).sum(3)    # [N, 2k+1, 2k+1, 3]
        grids = grids.at[:, k, k, 2].set(0.0)  # own cell valid (get_obs:107)
        vecs = jnp.concatenate(
            [self._normalize(state.loc),
             state.collected / (c.max_collectible / 2.0)], axis=-1)

        if c.n_agents == 1:
            others = self._normalize(state.loc)  # own loc placeholder
        else:
            norm = self._normalize(state.loc)  # [N, 2]

            def others_of(idx):
                # rows of all agents except idx, preserving order
                order = jnp.argsort(
                    jnp.where(jnp.arange(c.n_agents) == idx,
                              c.n_agents, jnp.arange(c.n_agents)))
                return norm[order[:-1]].reshape(-1)

            others = jax.vmap(others_of)(jnp.arange(c.n_agents))
        return dict(others=others, self_t=grids, self_v=vecs)

    def _global_state(self, state: CheckersState):
        c = self.cfg
        grid = state.world[c.n_obs:c.n_obs + c.n_rows,
                           c.n_obs:c.n_obs + c.n_columns + 1, 0:2]
        vec = jnp.concatenate(
            [state.loc.astype(jnp.float32), state.collected], axis=1)
        return dict(grid=grid, vec=vec)
