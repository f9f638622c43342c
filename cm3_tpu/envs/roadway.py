"""Kinematic sublane lane-change roadway — the TPU-native replacement for
the reference's SUMO merge network.

The reference drives the Eclipse SUMO simulator (C++, TraCI TCP) but uses
it with ALL safety checks off, zero background traffic, a single straight
4-lane 200 m edge, ego kinematics integrated in Python, and sublane
lateral moves (``env_sumo/simple/*``, ``env/sumo_simulator.py:40-65``,
``env/egocar_simple.py:49-51,224-252``).  What remains observable is a
batched kinematic model, re-implemented here as a pure-JAX engine (a C++
single-instance golden engine lives in ``native/roadway_golden.cc`` for
differential testing, standing in SUMO's native-component slot).

Geometry: x in [0, 200] along the road; 16 absolute sublanes of 0.8 m
(4 lanes x 4); lateral position y = 0.8*abs_sublane - 12.8 (lane centers
at -11.2, -8.0, -4.8, -1.6, matching SUMO's negative-y layout).

Semantics parity notes (cites into the reference):
  * 5 actions NOOP/ACC/DEC/LEFT/RIGHT: +-2.5 m/s^2 over dt=0.2 s with
    vel clamped to [0, 50]; LEFT/RIGHT are +-one sublane (0.8 m)
    (egocar_simple.py:63-73,224-252);
  * staggered departs: cars sample depart times ~N(mean_i, stdev); the
    episode begins when the LAST car is present, earlier cars get a
    head start of vel*dt per step of lead (sumo reset loop,
    multicar_simple.py:438-465; train_offpolicy.py:243-250);
  * reset takes one NOOP step so observations are populated
    (multicar_simple.py:474-477);
  * rewards (egocar_simple.py:193-217): +10 at goal with exact sublane,
    10*(1-|dsub|/16) at goal otherwise, -10 at per-car step cap (40 =
    (200 m / 25 m/s) / 0.2 s), -1 and terminal for lateral move into an
    adjacent car or any overlap collision, -0.1 while vel >= 35.7;
  * collision = rectangle overlap |dx| < car_length and |dy| < car_width
    between live cars (SUMO's set_colliding surrogate,
    sumo_simulator.py:102-111);
  * TTC action mask (egocar_simple.py:255-292): ACC infeasible at vmax,
    DEC at vmin, LEFT/RIGHT at road edges; NOOP+ACC infeasible when a
    slower car ahead within 1.8 m laterally has ttc <= 2 s; infeasible
    actions are replaced by the FIRST feasible one in index order
    (multicar_simple.py:75-101);
  * observations: 13x9x2 egocentric grid (occupancy, relative speed /25;
    blank cells carry -own_vel/25; off-road columns occupied) + vector
    [vel/29, delta_sublane/16, dist_to_goal] (observation.py:13-123,
    multicar_simple.py:323-355);
  * global state rows [(x-100)/200, (y+6.4)/12.8, vel/29]
    (multicar_simple.py:304-320);
  * terminal cars are removed: frozen state, invisible to others, zero
    rewards (multicar_simple.py:394-426).

Consciously dropped reference behaviors (divergence ledger):
  * dense-traffic reset-restart fallback (multicar_simple.py:438-465
    returns a done=True sentinel and restarts the episode when a
    controlled car arrives before all have departed) — N/A here: the
    kinematic reset has no background traffic and constructs all cars
    directly, so it cannot fail;
  * ``log_error.txt`` error-append stream (multicar_simple.py:292-294,
    479-482 logs out-of-grid observation writes and bad resets) — the
    grid writers here clip/drop out-of-range indices by construction
    (mode="drop" scatters), so the error conditions are unrepresentable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from cm3_tpu.core.config import RoadwayEnvConfig
from cm3_tpu.envs import base

NOOP, ACC, DEC, LEFT, RIGHT = range(5)


def occlude(occ, relspeed, *, back, front, num_ego_cells, c_self):
    """Ray-cast shadow occlusion on one egocentric grid pair.

    Re-derivation of ``observation.py:180-303`` (``Observation.occlude``,
    off by default there and latent-broken as shipped: ``occlude_cell``
    writes ``mat_signal_left/right`` which ``reset_matrices`` never
    creates).  Semantics, per sweep direction from the ego cell block
    (rows ``r_lo+1..r_hi-1`` at column ``c_self``):

      * along the ego column (forward rows >= ``r_hi = back+1``, backward
        rows <= ``r_lo = back-num_ego_cells``): everything at and beyond
        the first occupied->free falling edge is shadowed;
      * along the ego rows (left/right of ``c_self``): everything strictly
        beyond the first occupied cell is shadowed;
      * in the four quadrants, sweeping rows away from the ego: within a
        row, everything strictly beyond the first trigger is shadowed,
        where a trigger is an occupied cell OR a free cell whose
        row-toward-ego neighbour (post-occlusion) is occupied (skipped on
        the first row of the top/bottom-right sweeps; the reference's
        bottom-LEFT sweep starts one row lower and never skips — kept).

    Shadowed cells: occupancy -1, relspeed 0.  Runs on the occupancy
    BEFORE off-road column fill, like the reference.  occ/relspeed are
    [rows, cols] f32; all bounds static.  Cost is a handful of masked
    cumsums + four ~``rows/2``-length scans on a 13x9 grid — negligible,
    and only compiled when ``occlusion=true``.
    """
    rows, cols = occ.shape
    r_hi = back + 1
    r_lo = back - num_ego_cells

    def cummax_incl(x, axis=0):
        return jnp.cumsum(x.astype(jnp.int32), axis=axis) > 0

    def cummax_excl(x, axis=0):
        c = jnp.cumsum(x.astype(jnp.int32), axis=axis)
        return (c - x.astype(jnp.int32)) > 0

    shadow = jnp.zeros((rows, cols), bool)

    # --- ego-column sweeps: shadow from the first falling edge on ---
    def column_sweep(seg):                     # seg: [k] occupancy values
        prev = jnp.concatenate([jnp.zeros((1,), seg.dtype), seg[:-1]])
        falling = (prev == 1.0) & (seg == 0.0)
        return cummax_incl(falling)

    fwd = column_sweep(occ[r_hi:, c_self])
    shadow = shadow.at[r_hi:, c_self].set(fwd)
    bwd = column_sweep(occ[r_lo::-1, c_self])
    shadow = shadow.at[r_lo::-1, c_self].set(bwd)

    # --- ego-row lateral sweeps: shadow strictly beyond first occupied ---
    ego_rows = occ[r_lo + 1:r_hi, :]
    right = cummax_excl(ego_rows[:, c_self + 1:] == 1.0, axis=1)
    shadow = shadow.at[r_lo + 1:r_hi, c_self + 1:].set(right)
    left = cummax_excl(ego_rows[:, c_self - 1::-1] == 1.0, axis=1)
    shadow = shadow.at[r_lo + 1:r_hi, c_self - 1::-1].set(left)

    # --- quadrant sweeps (row scan carries the post-occlusion row) ---
    def quadrant(quad):
        """quad: [q_rows, q_cols] oriented so rows/cols increase away
        from the ego; returns shadow mask in the same orientation."""
        def row_step(prev_row, xs):
            is_first, row = xs
            trigger = (row == 1.0) | (
                (row == 0.0) & (prev_row == 1.0) & ~is_first)
            sh = cummax_excl(trigger)
            return jnp.where(sh, -1.0, row), sh

        q_rows = quad.shape[0]
        first = jnp.zeros((q_rows,), bool).at[0].set(True)
        _, sh = jax.lax.scan(row_step, jnp.zeros_like(quad[0]),
                             (first, quad))
        return sh

    tr = quadrant(occ[r_hi:, c_self + 1:])
    shadow = shadow.at[r_hi:, c_self + 1:].set(tr | shadow[r_hi:,
                                                           c_self + 1:])
    tl = quadrant(occ[r_hi:, c_self - 1::-1])
    shadow = shadow.at[r_hi:, c_self - 1::-1].set(
        tl | shadow[r_hi:, c_self - 1::-1])
    br = quadrant(occ[r_lo::-1, c_self + 1:])
    shadow = shadow.at[r_lo::-1, c_self + 1:].set(
        br | shadow[r_lo::-1, c_self + 1:])
    # bottom-left: starts at r_lo-1 and its first-row guard never fires
    # (reference compares r != r_lo but never visits r_lo) — so seed the
    # scan with the ORIGINAL row at r_lo as the carry and no guard skip.
    if r_lo >= 1:
        quad_bl = occ[r_lo - 1::-1, c_self - 1::-1]

        def row_step_bl(prev_row, row):
            trigger = (row == 1.0) | ((row == 0.0) & (prev_row == 1.0))
            sh = cummax_excl(trigger)
            return jnp.where(sh, -1.0, row), sh

        _, bl = jax.lax.scan(row_step_bl, occ[r_lo, c_self - 1::-1],
                             quad_bl)
        shadow = shadow.at[r_lo - 1::-1, c_self - 1::-1].set(
            bl | shadow[r_lo - 1::-1, c_self - 1::-1])

    occ = jnp.where(shadow, -1.0, occ)
    relspeed = jnp.where(shadow, 0.0, relspeed)
    return occ, relspeed


@struct.dataclass
class RoadwayState:
    x: jax.Array            # [N] longitudinal position (m)
    sublane: jax.Array      # [N] i32 absolute sublane 0..15
    vel: jax.Array          # [N] m/s
    steps: jax.Array        # [N] i32 per-car control steps taken
    goal_lane: jax.Array    # [N] i32
    terminal: jax.Array     # [N] bool (reached goal / timed out / crashed)
    collided: jax.Array     # [N] bool
    removed: jax.Array      # [N] bool (terminal at a previous step)


class Roadway(base.Env):

    def __init__(self, cfg: RoadwayEnvConfig):
        self.cfg = cfg

    def spec(self):
        c = self.cfg
        return dict(l_action=5, l_goal=4, l_state_one=3, l_obs=3,
                    h_obs=c.obs_rows, w_obs=c.obs_cols, c_obs=2,
                    n_agents=c.n_agents)

    # ------------------------------------------------------------------ #

    def _y(self, sublane):
        return 0.8 * sublane.astype(jnp.float32) - self.cfg.total_width

    def reset(self, key, goals=None):
        """goals: dict(lanes=[N] i32, goal_lanes=[N] i32) from the hooks
        (or None -> config defaults)."""
        c = self.cfg
        n = c.n_agents
        if goals is None:
            lanes = jnp.asarray(c.lane, jnp.int32)
            goal_lanes = jnp.asarray(c.goal_lane, jnp.int32)
        else:
            lanes = jnp.asarray(goals["lanes"], jnp.int32)
            goal_lanes = jnp.asarray(goals["goal_lanes"], jnp.int32)

        depart = (jnp.asarray(c.depart_mean, jnp.float32)
                  + c.depart_stdev * jax.random.normal(key, (n,)))
        lead = (jnp.max(depart) - depart) / c.dt      # steps of head start
        vel = jnp.asarray(c.speed, jnp.float32)
        x = jnp.asarray(c.init_position, jnp.float32) + vel * c.dt \
            * jnp.round(lead)

        state = RoadwayState(
            x=x, sublane=lanes * c.sublanes_per_lane + c.sublanes_per_lane
            // 2, vel=vel,
            steps=jnp.zeros((n,), jnp.int32), goal_lane=goal_lanes,
            terminal=jnp.zeros((n,), bool), collided=jnp.zeros((n,), bool),
            removed=jnp.zeros((n,), bool))
        # initial NOOP step to populate observations
        state, ts = self.step(state, jnp.zeros((n,), jnp.int32))
        return state, ts

    # ------------------------------------------------------------------ #

    def check_actions(self, state: RoadwayState, actions):
        """TTC/limit feasibility filter; infeasible -> first feasible
        action in index order (multicar_simple.py:75-101)."""
        c = self.cfg
        n = c.n_agents
        a = jnp.asarray(actions, jnp.int32)
        feas = jnp.ones((n, 5), bool)
        feas = feas.at[:, ACC].set(state.vel < c.v_max)
        feas = feas.at[:, DEC].set(state.vel > c.v_min)
        feas = feas.at[:, LEFT].set(state.sublane < c.n_sublanes - 1)
        feas = feas.at[:, RIGHT].set(state.sublane > 1)

        # TTC check vs every other live car ahead
        y = self._y(state.sublane)
        dx = state.x[None, :] - state.x[:, None]       # [ego, other]
        ahead = dx > 0
        slower = state.vel[None, :] < state.vel[:, None]
        lateral = jnp.abs(y[None, :] - y[:, None]) < c.car_width
        dist = dx - c.car_length
        rel_v = jnp.maximum(state.vel[:, None] - state.vel[None, :], 1e-6)
        ttc = dist / rel_v
        live = ~state.removed
        danger = (ahead & slower & lateral & (ttc <= c.ttc_thres)
                  & live[None, :] & ~jnp.eye(n, dtype=bool))
        any_danger = jnp.any(danger, axis=1)
        feas = feas.at[:, NOOP].set(feas[:, NOOP] & ~any_danger)
        feas = feas.at[:, ACC].set(feas[:, ACC] & ~any_danger)

        chosen_ok = jnp.take_along_axis(feas, a[:, None], axis=1)[:, 0]
        first_feasible = jnp.argmax(feas, axis=1)
        return jnp.where(chosen_ok, a, first_feasible)

    def step(self, state: RoadwayState, actions):
        c = self.cfg
        n = c.n_agents
        a = jnp.asarray(actions, jnp.int32)
        live = ~state.removed

        # --- apply controls (egocar_simple.py:224-252) ---
        acc = jnp.where(a == ACC, c.acc_val,
                        jnp.where(a == DEC, -c.dec_val, 0.0))
        vel = jnp.clip(state.vel + c.dt * acc, 0.0, c.v_max)
        dsub = jnp.where(a == LEFT, 1, jnp.where(a == RIGHT, -1, 0))
        sublane = jnp.clip(state.sublane + dsub, 0, c.n_sublanes - 1)
        vel = jnp.where(live, vel, state.vel)
        sublane = jnp.where(live, sublane, state.sublane)
        x = jnp.where(live, state.x + vel * c.dt, state.x)
        steps = state.steps + live.astype(jnp.int32)

        y = self._y(sublane)

        # --- collisions: rectangle overlap between live cars ---
        dx = jnp.abs(x[:, None] - x[None, :])
        dy = jnp.abs(y[:, None] - y[None, :])
        pair_live = live[:, None] & live[None, :] & ~jnp.eye(n, dtype=bool)
        overlap = (dx < c.car_length) & (dy < c.car_width) & pair_live
        hit = jnp.any(overlap, axis=1)

        # --- car_on_left / car_on_right (observation.py:100-112):
        # another live car within dx in (-1.25, 3.75) and 1-2 sublanes over
        fwd = x[None, :] - x[:, None]                  # other - ego
        same_row = (fwd > -c.res_forward / 2) & (fwd < 1.5 * c.res_forward)
        sub_diff = sublane[None, :] - sublane[:, None]  # other - ego
        near = pair_live & same_row
        car_on_left = jnp.any(near & (sub_diff >= 1) & (sub_diff <= 2),
                              axis=1)
        car_on_right = jnp.any(near & (sub_diff <= -1) & (sub_diff >= -2),
                               axis=1)
        lateral_crash = ((car_on_left & (a == LEFT))
                         | (car_on_right & (a == RIGHT)))

        # --- per-car reward + terminal (egocar_simple.py:148-221) ---
        goal_sub = (state.goal_lane * c.sublanes_per_lane
                    + c.sublanes_per_lane // 2)
        delta_sub = goal_sub - sublane
        goal_pos = jnp.asarray(c.goal_pos, jnp.float32)
        dist_to_goal = (goal_pos - x) / c.total_length
        at_goal = dist_to_goal <= 0.0
        timed_out = steps >= c.max_step
        crashed = hit | lateral_crash

        r_goal = jnp.where(
            delta_sub == 0, 10.0,
            10.0 * (1.0 - jnp.abs(delta_sub).astype(jnp.float32)
                    / float(c.n_sublanes)))
        reward = jnp.where(
            crashed, -1.0,
            jnp.where(at_goal, r_goal, jnp.where(timed_out, -10.0, 0.0)))
        reward = reward - 0.1 * (vel >= c.overspeed).astype(jnp.float32)
        reward = jnp.where(live, reward, 0.0)

        terminal = live & (crashed | at_goal | timed_out)
        collided = state.collided | (live & crashed)

        # any collision ends the whole episode (multicar_simple.py:414-421)
        episode_crash = jnp.any(live & crashed)
        removed = state.removed | terminal | episode_crash
        done = jnp.all(removed) | episode_crash

        new_state = RoadwayState(
            x=x, sublane=sublane, vel=vel, steps=steps,
            goal_lane=state.goal_lane, terminal=state.terminal | terminal,
            collided=collided, removed=removed)
        ts = base.TimeStep(
            obs=self._observe(new_state, delta_sub, dist_to_goal),
            state=self._global_state(new_state),
            reward=jnp.sum(reward), reward_local=reward, done=done)
        return new_state, ts

    # ------------------------------------------------------------------ #

    def _observe(self, state: RoadwayState, delta_sub, dist_to_goal):
        """13x9x2 egocentric grids + [vel/29, dsub/16, dist_to_goal]."""
        c = self.cfg
        n = c.n_agents
        rows, cols = c.obs_rows, c.obs_cols
        back = int(round(c.obs_back / c.res_forward))

        y = self._y(state.sublane)
        live = ~state.removed

        # cell coordinates of each other car in each ego frame
        col = (jnp.round((y[:, None] - y[None, :]) / c.sublane_res)
               .astype(jnp.int32) + c.obs_left)            # [ego, other]
        r_high = (jnp.round((state.x[None, :] - state.x[:, None])
                            / c.res_forward).astype(jnp.int32) + back + 1)
        num_cells = int(round(c.car_length / c.res_forward))

        rr = jnp.arange(rows)[None, None, :]               # [1, 1, rows]
        in_row = ((rr >= (r_high - num_cells)[:, :, None])
                  & (rr < r_high[:, :, None]))             # [ego, other, rows]
        valid = (live[None, :, None] & ~jnp.eye(n, dtype=bool)[:, :, None]
                 & in_row)

        cc = jnp.arange(cols)[None, None, :]               # [1, 1, cols]
        in_col = cc == col[:, :, None]                     # [ego, other, cols]

        occ_pair = valid[:, :, :, None] & in_col[:, :, None, :]
        occupancy = jnp.any(occ_pair, axis=1).astype(jnp.float32)

        rel_speed = (state.vel[None, :] - state.vel[:, None]) / 25.0
        relsp_fill = jnp.sum(
            occ_pair.astype(jnp.float32) * rel_speed[:, :, None, None],
            axis=1)
        blank = -state.vel[:, None, None] / 25.0
        relspeed = jnp.where(occupancy > 0, relsp_fill,
                             jnp.broadcast_to(blank, occupancy.shape))

        # optional ray-cast occlusion BEFORE the off-road fill, like the
        # reference (observation.py:113-114)
        if c.occlusion:
            num_ego = int(round(c.car_length / c.res_forward))
            occupancy, relspeed = jax.vmap(
                lambda o, r: occlude(o, r, back=back,
                                     front=rows - back - 1,
                                     num_ego_cells=num_ego,
                                     c_self=c.obs_left))(occupancy,
                                                         relspeed)

        # off-road columns occupied (observation.py:117-121)
        l_sub = (state.sublane[:, None]
                 + (c.obs_left - jnp.arange(cols)[None, :]))
        offroad = (l_sub <= 0) | (l_sub >= c.n_sublanes)
        occupancy = jnp.where(offroad[:, None, :], 1.0, occupancy)

        grid = jnp.stack([occupancy, relspeed], axis=-1)   # [N, rows, cols, 2]
        vec = jnp.stack(
            [state.vel / 29.0,
             delta_sub.astype(jnp.float32) / float(c.n_sublanes),
             dist_to_goal], axis=-1)
        return dict(self_t=grid, self_v=vec)

    def _global_state(self, state: RoadwayState):
        c = self.cfg
        y = self._y(state.sublane)
        return dict(vec=jnp.stack(
            [(state.x - c.total_length / 2) / c.total_length,
             (y + c.total_width / 2) / c.total_width,
             state.vel / 29.0], axis=-1))

    # ------------------------------------------------------------------ #
    # Traffic metrics + whole-road tensor (multicar_simple.py:117-301).
    # These are the reference's auxiliary observability surface; all are
    # jittable pure functions of the state, usable under vmap.

    @property
    def _lane(self):
        c = self.cfg
        return lambda sub: sub // c.sublanes_per_lane

    def avg_speed(self, state: RoadwayState):
        """Mean speed of live cars / v_threshold; 1.0 when road is empty
        (multicar_simple.py:158-166 with the NaN->1 convention of
        get_avg_speeds)."""
        live = (~state.removed).astype(jnp.float32)
        n_live = jnp.sum(live)
        mean = jnp.sum(state.vel * live) / jnp.maximum(n_live, 1.0)
        return jnp.where(n_live > 0, mean / self.cfg.v_threshold, 1.0)

    def avg_speeds(self, state: RoadwayState):
        """Per-road-section normalized average speeds, 6 categories
        (multicar_simple.py:117-156).  On the reference's *simple*
        network (one straight edge ``edge1``) only two of its six
        sections can be non-empty: section 2 = edge1 lane 0 and section
        5 = every other lane; ramp/merge sections 0,1,3,4 are always
        empty and report 1.0 (the reference's NaN->1 rule)."""
        c = self.cfg
        lane = self._lane(state.sublane)
        live = ~state.removed
        sec = jnp.where(lane == 0, 2, 5)
        vec = []
        for s in range(6):
            m = (live & (sec == s)).astype(jnp.float32)
            cnt = jnp.sum(m)
            mean = jnp.sum(state.vel * m) / jnp.maximum(cnt, 1.0)
            vec.append(jnp.where(cnt > 0, mean / c.v_threshold, 1.0))
        return jnp.stack(vec)

    def count_close(self, state: RoadwayState):
        """Number of (follower, nearest-leader-in-lane) pairs with bumper
        gap < follow_threshold and lateral offset < 1.6 m
        (multicar_simple.py:170-225: consecutive cars in the per-lane
        x-sorted list == each car paired with its nearest leader)."""
        c = self.cfg
        n = c.n_agents
        live = ~state.removed
        lane = self._lane(state.sublane)
        y = self._y(state.sublane)
        dx = state.x[None, :] - state.x[:, None]          # leader - ego
        same_lane = (lane[:, None] == lane[None, :]) & live[:, None] \
            & live[None, :] & ~jnp.eye(n, dtype=bool)
        ahead = same_lane & (dx > 0)
        # nearest leader per car
        dx_masked = jnp.where(ahead, dx, jnp.inf)
        j = jnp.argmin(dx_masked, axis=1)
        has_leader = jnp.any(ahead, axis=1)
        gap = jnp.take_along_axis(dx_masked, j[:, None], 1)[:, 0] \
            - c.car_length
        dy = jnp.abs(y[j] - y)
        close = has_leader & (dy < 1.6) & (gap < c.follow_threshold)
        return jnp.sum(close.astype(jnp.int32))

    def count_success(self, state: RoadwayState):
        """Count of lane-changing cars that reached their goal lane at
        the goal position.  The reference's ``count_success``
        (multicar_simple.py:227-239) is dead code as shipped (no car ever
        defines ``must_merge``); this is the working equivalent:
        must-merge == departed on a different lane than its goal."""
        c = self.cfg
        start_lane = jnp.asarray(c.lane, jnp.int32)
        must_merge = start_lane != state.goal_lane
        goal_sub = (state.goal_lane * c.sublanes_per_lane
                    + c.sublanes_per_lane // 2)
        succeeded = (state.terminal & ~state.collided
                     & (state.sublane == goal_sub)
                     & (state.x >= jnp.asarray(c.goal_pos, jnp.float32)))
        return jnp.sum((must_merge & succeeded).astype(jnp.int32))

    def count_remaining(self, state: RoadwayState):
        """Live controlled cars still on lane 0
        (multicar_simple.py:242-254; its 'edge2 lane 0' is lane 0 of the
        one edge that exists in the simple network)."""
        lane = self._lane(state.sublane)
        return jnp.sum(((~state.removed) & (lane == 0)).astype(jnp.int32))

    def global_tensor(self, state: RoadwayState, last_actions=None):
        """[n_rows, n_cols, 4] whole-road grid in absolute coordinates:
        occupancy, speed/29, left-signal, right-signal
        (multicar_simple.py:257-301).  The reference reads SUMO blinker
        bits (bit1 left / bit0 right); the kinematic equivalent derives
        them from the car's last action (LEFT/RIGHT sublane moves)."""
        c = self.cfg
        n = c.n_agents
        rows, cols = c.n_rows, c.n_cols
        live = ~state.removed
        num_cells = int(round(c.car_length / c.res_forward))

        row_hi = jnp.round(state.x / c.res_forward).astype(jnp.int32)
        col = jnp.round(jnp.abs(self._y(state.sublane))
                        / c.sublane_res).astype(jnp.int32)

        rr = jnp.arange(rows)[None, :]                    # [1, rows]
        in_row = ((rr >= (row_hi - num_cells)[:, None])
                  & (rr < row_hi[:, None]))               # [N, rows]
        cc = jnp.arange(cols)[None, :]
        in_col = cc == col[:, None]                       # [N, cols]
        cell = (in_row[:, :, None] & in_col[:, None, :]
                & live[:, None, None])                    # [N, rows, cols]

        occupancy = jnp.any(cell, axis=0).astype(jnp.float32)
        speed = jnp.max(jnp.where(cell, (state.vel / 29.0)[:, None, None],
                                  0.0), axis=0)
        if last_actions is None:
            sig_l = jnp.zeros((rows, cols), jnp.float32)
            sig_r = jnp.zeros((rows, cols), jnp.float32)
        else:
            a = jnp.asarray(last_actions, jnp.int32)
            sig_l = jnp.any(cell & (a == LEFT)[:, None, None],
                            axis=0).astype(jnp.float32)
            sig_r = jnp.any(cell & (a == RIGHT)[:, None, None],
                            axis=0).astype(jnp.float32)
        return jnp.stack([occupancy, speed, sig_l, sig_r], axis=-1)
