"""Struct-of-arrays roadway dynamics: per-car scalar lanes, any shape.

The grid-observation engine (``cm3_tpu/envs/roadway.py``) carries [N]
vectors and builds 13x9x2 egocentric grids each step because training
needs them.  But the DYNAMICS state of the game is eight scalars per car
(x, sublane, vel, steps + four flags), and every interaction is a
static-N pairwise compare — the same shape of problem as the bit-packed
Checkers fast path (``checkers_packed.py``).  This module unrolls the
per-car state into tuples of same-shaped arrays so identical code runs

  * under ``vmap``/``scan`` on [B] vectors (XLA path), and
  * inside the Pallas fused-rollout kernel on [SUB, 128] register tiles
    (``cm3_tpu/ops/roadway_rollout.py``),

with pure VPU arithmetic: no gathers (``take_along_axis`` /
``argmax``-style selection is unrolled into masked selects over the five
static actions), no [N,N] matrices (pairs unroll at trace time).

Semantics are those of ``Roadway.check_actions`` + ``Roadway.step``
(which carry the reference citations — ``egocar_simple.py:63-292``,
``multicar_simple.py:75-101,358-426``); ``tests/test_roadway_rollout_kernel.py``
replays identical action sequences through both and through the kernel.
Deviation (documented): ``soa_init`` models departure staggering with
DETERMINISTIC departs (``depart_mean`` only) — the engine's per-episode
Gaussian depart noise exists for exploration diversity, not dynamics;
differential tests pin ``depart_stdev=0`` on the engine side.  Goals are
the static config defaults (``goal_lane``/``lane``), as in a stage-run
without per-episode randomization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp

from cm3_tpu.core.config import RoadwayEnvConfig

NOOP, ACC, DEC, LEFT, RIGHT = range(5)


class SoaState(NamedTuple):
    """Per-car tuples of same-shaped arrays (any trailing shape)."""
    x: tuple          # f32 longitudinal position (m)
    sub: tuple        # i32 absolute sublane 0..15
    vel: tuple        # f32 m/s
    steps: tuple      # i32 per-car control steps
    term: tuple       # i32 0/1 reached terminal at some step
    coll: tuple       # i32 0/1 ever collided
    rem: tuple        # i32 0/1 removed (terminal at a previous step)
    # flags are int32 masks, not bool: the Pallas rollout kernel carries
    # the state through scf.for, and Mosaic cannot carry i1 vectors


def _y(cfg, sub):
    return cfg.sublane_res * sub.astype(jnp.float32) - cfg.total_width


def soa_check_actions(cfg: RoadwayEnvConfig, s: SoaState, actions):
    """TTC/limit feasibility filter; infeasible -> first feasible action
    in index order (mirrors ``Roadway.check_actions``)."""
    n = cfg.n_agents
    out = []
    for i in range(n):
        live_i = s.rem[i] == 0
        yi = _y(cfg, s.sub[i])
        danger = jnp.zeros_like(live_i)
        for j in range(n):
            if j == i:
                continue
            dx = s.x[j] - s.x[i]
            ahead = dx > 0
            slower = s.vel[j] < s.vel[i]
            lateral = jnp.abs(_y(cfg, s.sub[j]) - yi) < cfg.car_width
            rel_v = jnp.maximum(s.vel[i] - s.vel[j], 1e-6)
            ttc = (dx - cfg.car_length) / rel_v
            danger = danger | (ahead & slower & lateral
                               & (ttc <= cfg.ttc_thres)
                               & (s.rem[j] == 0))
        feas = (
            ~danger,                                     # NOOP
            (s.vel[i] < cfg.v_max) & ~danger,            # ACC
            s.vel[i] > cfg.v_min,                        # DEC
            s.sub[i] < cfg.n_sublanes - 1,               # LEFT
            s.sub[i] > 1,                                # RIGHT
        )
        a = actions[i]
        # or-of-ands, not a bool `where` chain: Mosaic cannot lower
        # vector selects with i1 results (trunci i8->i1)
        ok = functools.reduce(
            jnp.logical_or, ((a == k) & feas[k] for k in range(5)))
        first = jnp.where(
            feas[0], NOOP, jnp.where(
                feas[1], ACC, jnp.where(
                    feas[2], DEC, jnp.where(feas[3], LEFT, RIGHT))))
        out.append(jnp.where(ok, a, first.astype(a.dtype)))
    return tuple(out)


def soa_step(cfg: RoadwayEnvConfig, s: SoaState, actions):
    """One control step.  Returns (state', rewards tuple [per car], done).

    Same math as ``Roadway.step`` with the pairwise matrices unrolled
    over the static car count."""
    n = cfg.n_agents
    live = tuple(s.rem[i] == 0 for i in range(n))

    # --- apply controls ---
    vel, sub, x, steps, y = [], [], [], [], []
    for i in range(n):
        a = actions[i]
        acc = jnp.where(a == ACC, cfg.acc_val,
                        jnp.where(a == DEC, -cfg.dec_val, 0.0))
        v = jnp.clip(s.vel[i] + cfg.dt * acc, 0.0, cfg.v_max)
        dsub = jnp.where(a == LEFT, 1, jnp.where(a == RIGHT, -1, 0))
        sb = jnp.clip(s.sub[i] + dsub, 0, cfg.n_sublanes - 1)
        v = jnp.where(live[i], v, s.vel[i])
        sb = jnp.where(live[i], sb, s.sub[i])
        vel.append(v)
        sub.append(sb)
        x.append(jnp.where(live[i], s.x[i] + v * cfg.dt, s.x[i]))
        steps.append(s.steps[i] + live[i].astype(jnp.int32))
        y.append(_y(cfg, sb))

    # --- pairwise overlap collisions + adjacency flags ---
    rewards, term, coll, rem = [], [], [], []
    crashed_each = []
    for i in range(n):
        hit = jnp.zeros_like(live[i])
        on_left = jnp.zeros_like(live[i])
        on_right = jnp.zeros_like(live[i])
        for j in range(n):
            if j == i:
                continue
            pair = live[i] & live[j]
            hit = hit | (pair & (jnp.abs(x[i] - x[j]) < cfg.car_length)
                         & (jnp.abs(y[i] - y[j]) < cfg.car_width))
            fwd = x[j] - x[i]
            near = pair & (fwd > -cfg.res_forward / 2) \
                & (fwd < 1.5 * cfg.res_forward)
            sd = sub[j] - sub[i]
            on_left = on_left | (near & (sd >= 1) & (sd <= 2))
            on_right = on_right | (near & (sd <= -1) & (sd >= -2))
        a = actions[i]
        crashed_each.append(hit | (on_left & (a == LEFT))
                            | (on_right & (a == RIGHT)))

    for i in range(n):
        goal_sub = cfg.goal_lane[i] * cfg.sublanes_per_lane \
            + cfg.sublanes_per_lane // 2
        delta = goal_sub - sub[i]
        dist_to_goal = (cfg.goal_pos[i] - x[i]) / cfg.total_length
        at_goal = dist_to_goal <= 0.0
        timed_out = steps[i] >= cfg.max_step
        crashed = crashed_each[i]
        r_goal = jnp.where(
            delta == 0, 10.0,
            10.0 * (1.0 - jnp.abs(delta).astype(jnp.float32)
                    / float(cfg.n_sublanes)))
        r = jnp.where(crashed, -1.0,
                      jnp.where(at_goal, r_goal,
                                jnp.where(timed_out, -10.0, 0.0)))
        r = r - 0.1 * (vel[i] >= cfg.overspeed).astype(jnp.float32)
        rewards.append(jnp.where(live[i], r, 0.0))
        term.append((live[i] & (crashed | at_goal | timed_out))
                    .astype(jnp.int32))
        coll.append(s.coll[i] | (live[i] & crashed).astype(jnp.int32))

    episode_crash = functools.reduce(
        jnp.logical_or, (live[i] & crashed_each[i] for i in range(n))
    ).astype(jnp.int32)
    done = None
    for i in range(n):
        rem.append(s.rem[i] | term[i] | episode_crash)
        done = rem[i] if done is None else done & rem[i]
    done = done == 1

    s2 = SoaState(x=tuple(x), sub=tuple(sub), vel=tuple(vel),
                  steps=tuple(steps),
                  term=tuple(s.term[i] | term[i] for i in range(n)),
                  coll=tuple(coll), rem=tuple(rem))
    return s2, tuple(rewards), done


def soa_init(cfg: RoadwayEnvConfig, shape=()) -> SoaState:
    """Deterministic reset (depart noise = 0): per-car head start of
    ``vel*dt*round(lead)`` where lead_i = (max depart - depart_i)/dt,
    then one populating NOOP step (mirrors ``Roadway.reset``)."""
    n = cfg.n_agents
    latest = max(cfg.depart_mean)

    def full(v, dt):
        return jnp.full(shape, v, dt)

    x, sub, vel, steps = [], [], [], []
    for i in range(n):
        lead = round((latest - cfg.depart_mean[i]) / cfg.dt)
        vel.append(full(cfg.speed[i], jnp.float32))
        x.append(full(cfg.init_position[i]
                      + cfg.speed[i] * cfg.dt * lead, jnp.float32))
        sub.append(full(cfg.lane[i] * cfg.sublanes_per_lane
                        + cfg.sublanes_per_lane // 2, jnp.int32))
        steps.append(full(0, jnp.int32))
    flags = tuple(full(0, jnp.int32) for _ in range(n))
    s = SoaState(x=tuple(x), sub=tuple(sub), vel=tuple(vel),
                 steps=tuple(steps), term=flags, coll=flags, rem=flags)
    s, _, _ = soa_step(cfg, s, tuple(full(NOOP, jnp.int32)
                                     for _ in range(n)))
    return s
