"""Struct-of-arrays particle dynamics: per-agent scalar lanes, any shape.

Same design as ``roadway_soa.py``: the grid-free DYNAMICS state of the
cooperative-navigation particle game (``cm3_tpu/envs/particle.py``, which
carries the reference citations — MPE ``core.py:117-196`` physics +
``multi-goal_spread`` rewards) is six floats per agent (pos, vel,
landmark) plus a step counter, and every interaction is a static-N
pairwise term.  Unrolling agents into tuples of same-shaped arrays lets
identical code run under ``vmap``/``scan`` on [B] vectors AND inside the
Pallas fused-rollout kernel on [SUB, 128] register tiles
(``cm3_tpu/ops/particle_rollout.py``).

``tests/test_particle_rollout_kernel.py`` replays identical action
sequences through the engine, this module, and the kernel.  Deviation
(documented): ``soa_init`` is the DETERMINISTIC reset branch (config
positions, zero noise) — the engine's prob_random/Gaussian reset
randomization shapes exploration, not dynamics; differential tests pin
``prob_random=0, initial_std=0`` on the engine side.

State dtype note: no bool is carried across steps (``reached`` is a pure
function of position, recomputed per step) — the Pallas kernel carries
the state through ``scf.for``, and Mosaic cannot carry i1 vectors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp

from cm3_tpu.core.config import ParticleEnvConfig


class SoaState(NamedTuple):
    """Per-agent tuples of same-shaped arrays (any trailing shape)."""
    px: tuple         # f32 position x
    py: tuple         # f32 position y
    vx: tuple         # f32 velocity x
    vy: tuple         # f32 velocity y
    lx: tuple         # f32 own-landmark x
    ly: tuple         # f32 own-landmark y
    steps: tuple      # (single,) i32 episode step counter
    coll: tuple       # (single,) i32 cumulative ordered colliding pairs


def soa_step(cfg: ParticleEnvConfig, s: SoaState, actions):
    """One physics step.  Returns (state', rewards tuple, done).

    Same math as ``Particle.step`` with the [N,N] pair matrices unrolled
    over the static agent count."""
    n = cfg.n_agents
    dmin = 2 * cfg.agent_size
    k = cfg.contact_margin

    # --- forces: discrete action thrust + soft-contact pair forces ---
    px, py, vx, vy = [], [], [], []
    for i in range(n):
        a = actions[i]
        fx = ((a == 2).astype(jnp.float32)
              - (a == 1).astype(jnp.float32)) * cfg.accel
        fy = ((a == 4).astype(jnp.float32)
              - (a == 3).astype(jnp.float32)) * cfg.accel
        for j in range(n):
            if j == i:
                continue
            dx = s.px[i] - s.px[j]
            dy = s.py[i] - s.py[j]
            dist = jnp.sqrt(dx * dx + dy * dy)
            pen = jnp.logaddexp(0.0, -(dist - dmin) / k) * k
            scale = cfg.contact_force * pen / dist
            fx = fx + dx * scale
            fy = fy + dy * scale
        nvx = s.vx[i] * (1.0 - cfg.damping) + fx * cfg.dt
        nvy = s.vy[i] * (1.0 - cfg.damping) + fy * cfg.dt
        vx.append(nvx)
        vy.append(nvy)
        px.append(s.px[i] + nvx * cfg.dt)
        py.append(s.py[i] + nvy * cfg.dt)

    # --- rewards on post-move positions ---
    rewards, reached = [], []
    n_coll_total = None
    for i in range(n):
        d_goal = jnp.sqrt((px[i] - s.lx[i]) ** 2 + (py[i] - s.ly[i]) ** 2)
        reached.append(-d_goal >= -0.05)
        n_coll = None
        for j in range(n):
            if j == i:
                continue
            dx = px[i] - px[j]
            dy = py[i] - py[j]
            # sqrt form, not squared compare: bit-match the engine at
            # the collision boundary
            c = (jnp.sqrt(dx * dx + dy * dy) < dmin).astype(jnp.float32)
            n_coll = c if n_coll is None else n_coll + c
        if n_coll is None:
            n_coll = jnp.zeros_like(d_goal)
        rewards.append(-d_goal - n_coll)
        n_coll_total = n_coll if n_coll_total is None \
            else n_coll_total + n_coll

    steps = s.steps[0] + 1
    done = (steps == cfg.max_steps) | functools.reduce(
        jnp.logical_and, reached)
    coll = s.coll[0] + n_coll_total.astype(jnp.int32)

    s2 = SoaState(px=tuple(px), py=tuple(py), vx=tuple(vx), vy=tuple(vy),
                  lx=s.lx, ly=s.ly, steps=(steps,), coll=(coll,))
    return s2, tuple(rewards), done


def soa_init(cfg: ParticleEnvConfig, shape=()) -> SoaState:
    """Deterministic reset branch: config agent/landmark positions, zero
    velocity (mirrors ``Particle.reset`` with prob_random=0,
    initial_std=0)."""
    n = cfg.n_agents

    def full(v, dt=jnp.float32):
        return jnp.full(shape, v, dt)

    return SoaState(
        px=tuple(full(cfg.agents_x[i]) for i in range(n)),
        py=tuple(full(cfg.agents_y[i]) for i in range(n)),
        vx=tuple(full(0.0) for _ in range(n)),
        vy=tuple(full(0.0) for _ in range(n)),
        lx=tuple(full(cfg.landmarks_x[i]) for i in range(n)),
        ly=tuple(full(cfg.landmarks_y[i]) for i in range(n)),
        steps=(full(0, jnp.int32),), coll=(full(0, jnp.int32),))
