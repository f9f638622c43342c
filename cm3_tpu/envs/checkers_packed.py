"""Bit-packed Checkers dynamics: the whole world in a few int32 lanes.

The grid engine (``cm3_tpu/envs/checkers.py``) carries a [7,13,3] f32
world per instance because observations need it.  But the DYNAMICS state
of the reference game (``/root/reference/env/checkers.py:157-260``) is
tiny: the playable area is ``n_rows x (n_columns+1)`` = 3x9 = 27 cells —
it fits in one 32-bit word.  This module packs:

  * each agent's position as a one-hot uint32 bitmask (bit ``r*9+c``),
  * the collected-cells set as one uint32 bitmask,
  * the step counter as one int32,

so one env instance is ~6 words and one env step is ~40 elementwise
integer ops: moves are constant shifts (up ``>>9``, down ``<<9``, left
``>>1``, right ``<<1``) selected per lane, border blocking is an AND with
a static edge mask, agent blocking is an AND with the other agent's
bitmask, and reward lookup is an AND with static green/orange masks.
This is the TPU-native speed-of-light formulation of the step: pure VPU
int32 arithmetic, no grids, no scatters.

Exact-parity notes (vs the grid engine, which is itself golden-tested
against the reference):
  * agents resolve sequentially in index order; agent 1 sees agent 0's
    post-move position (checkers.py:228-238);
  * blocked/stay semantics, the -0.1 invalid-move penalty, +-1/-0.5
    goal-conditioned pickup rewards, and the all-collected / step-cap
    termination are bit-identical — ``tests/test_checkers_packed.py``
    replays identical action sequences through both engines.

All functions operate on arrays of ANY shape (the state is a pytree of
same-shaped arrays), so the same code runs under ``vmap``/``scan`` on
[B]-vectors AND inside the Pallas rollout kernel on [SUB, 128] tiles
(``cm3_tpu/ops/checkers_rollout.py``).

Scope: n_agents == 2 dynamics (the flagship two-agent stage-2 game);
observations are not produced here — this is the rollout/bench fast path,
the grid engine remains the training-path engine.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cm3_tpu.core.config import CheckersEnvConfig


class PackedSpec(NamedTuple):
    """Static bit-layout constants derived from the env config."""
    width: int                 # n_columns + 1 (incl. agent-start column)
    height: int                # n_rows
    green_mask: int            # uncollectable-state bitmask of green cells
    orange_mask: int
    full_mask: int             # green | orange (== all-collected test)
    up_ok: int                 # positions allowed to move up (r > 0)
    down_ok: int
    left_ok: int
    right_ok: int
    init_pos: tuple            # per-agent start bit masks
    goal_green: tuple          # per-agent bool: goal is green
    max_steps: int


def make_spec(cfg: CheckersEnvConfig, goal_green=(True, False)) -> PackedSpec:
    h, w = cfg.n_rows, cfg.n_columns + 1
    if h * w > 32:
        raise ValueError("playable area exceeds 32 bits; use the grid engine")
    bit = lambda r, c: 1 << (r * w + c)
    green = orange = 0
    for r in range(h):
        for c in range(cfg.n_columns):          # start column has no reward
            if c % 2 == r % 2:
                green |= bit(r, c)
            else:
                orange |= bit(r, c)
    up = down = left = right = 0
    for r in range(h):
        for c in range(w):
            if r > 0:
                up |= bit(r, c)
            if r < h - 1:
                down |= bit(r, c)
            if c > 0:
                left |= bit(r, c)
            if c < w - 1:
                right |= bit(r, c)
    init = tuple(bit(r, c) for r, c in zip(cfg.agents_r, cfg.agents_c))
    # n=1 terminates on the GOAL color exhausted; n>1 on everything
    # collected (reference step:246-260 via the grid engine's done rule)
    if len(goal_green) == 1:
        full = green if goal_green[0] else orange
    else:
        full = green | orange
    return PackedSpec(width=w, height=h, green_mask=green,
                      orange_mask=orange, full_mask=full,
                      up_ok=up, down_ok=down, left_ok=left, right_ok=right,
                      init_pos=init, goal_green=tuple(goal_green),
                      max_steps=cfg.max_steps)


class PackedState(NamedTuple):
    pos: tuple       # per-agent uint32 one-hot bitmask arrays, any shape S
    collected: jnp.ndarray   # uint32 [S]
    steps: jnp.ndarray       # int32 [S]


def packed_init(spec: PackedSpec, shape) -> PackedState:
    u = lambda v: jnp.full(shape, v, jnp.uint32)
    return PackedState(pos=tuple(u(p) for p in spec.init_pos),
                       collected=u(0),
                       steps=jnp.zeros(shape, jnp.int32))


def packed_step(spec: PackedSpec, s: PackedState, actions):
    """One lockstep env step.  ``actions``: tuple of per-agent int32
    arrays (0 stay / 1 up / 2 down / 3 left / 4 right), shape == state
    shape.  Returns (next_state, per-agent rewards tuple, done bool
    array).  Auto-resets finished instances."""
    w = spec.width
    pos = list(s.pos)
    collected = s.collected
    rewards = []
    n = len(pos)
    for i in range(n):
        a = actions[i]
        p = pos[i]
        tgt = jnp.where(a == 1, p >> w,
                        jnp.where(a == 2, p << w,
                                  jnp.where(a == 3, p >> 1,
                                            jnp.where(a == 4, p << 1, p))))
        edge = jnp.where(
            a == 1, p & spec.up_ok,
            jnp.where(a == 2, p & spec.down_ok,
                      jnp.where(a == 3, p & spec.left_ok,
                                jnp.where(a == 4, p & spec.right_ok,
                                          jnp.zeros_like(p)))))
        others = jnp.zeros_like(p)
        for j in range(n):
            if j != i:
                others = others | pos[j]
        can = (a != 0) & (edge != 0) & ((tgt & others) == 0)
        newp = jnp.where(can, tgt, p)
        uncol = ~collected
        has_g = (newp & jnp.uint32(spec.green_mask) & uncol) != 0
        has_o = (newp & jnp.uint32(spec.orange_mask) & uncol) != 0
        collected = jnp.where(has_g | has_o, collected | newp, collected)
        gg = spec.goal_green[i]
        rew = (has_g.astype(jnp.float32) * (1.0 if gg else -0.5)
               + has_o.astype(jnp.float32) * (-0.5 if gg else 1.0)
               + ((a != 0) & ~can).astype(jnp.float32) * -0.1)
        rewards.append(rew)
        pos[i] = newp

    steps = s.steps + 1
    full = jnp.uint32(spec.full_mask)
    done = (steps >= spec.max_steps) | ((collected & full) == full)
    # auto-reset finished instances
    pos = tuple(jnp.where(done, jnp.uint32(spec.init_pos[i]), pos[i])
                for i in range(n))
    collected = jnp.where(done, jnp.uint32(0), collected)
    steps = jnp.where(done, 0, steps)
    return PackedState(pos=pos, collected=collected, steps=steps), \
        tuple(rewards), done
