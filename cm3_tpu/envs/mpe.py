"""Generic batched MPE world + the nine upstream particle scenarios.

The reference tree carries the full upstream multiagent-particle-envs
scenario suite (``env/multiagent-particle-envs/multiagent/scenarios/
simple*.py``, ~1.1k LoC) which CM3 itself never uses and which is
incompatible with the fork's modified observation contract (SURVEY.md
§2.2).  This module ports them as first-class extras on a pure-JAX MPE
core, so the whole upstream suite is steppable vectorized on TPU:

  simple, simple_spread, simple_adversary, simple_push, simple_tag,
  simple_reference, simple_speaker_listener, simple_crypto,
  simple_world_comm

Design (TPU-native, not a translation): one struct-of-arrays state over
ALL entities (agents first, landmarks after); physics is a single
vectorized pairwise-force pass (``core.py:116-196`` semantics: soft-
contact forces between colliding entity pairs, forces only applied to
movable entities, velocity damping + max-speed clamp); communication is
a one-hot discrete head (the fork's ``environment.py`` forces discrete
action inputs; upstream continuous ``action.c`` becomes a discrete
symbol — documented divergence, noise off as upstream defaults).

Upstream quirks are preserved deliberately (differential tests depend
on them): ``simple_spread``'s collision penalty counts the agent against
ITSELF (scenario ``is_collision`` has no identity check → every collide
agent pays -1 every step); ``simple_world_comm``'s good agents are
rewarded +0.05 * min-distance-to-food (a positive term for being FAR);
``prey_forest`` locals are computed and discarded upstream — not ported.

Per-agent observation vectors are heterogeneous; ``obs()`` returns a
[N, max_dim] array zero-padded on the right, with true lengths in
``Scenario.obs_dims``.

MultiDiscrete / multi-head actions (``multiagent/multi_discrete.py:
1-45`` + ``environment.py:177-225``): supported via
``mpe_step_multihead`` / ``MPEEnv.step_multihead`` — the one-hot (or
soft) 5-vector force composition and the continuous comm head, with
the upstream branch's own direction convention preserved (it differs
from the index branch's; see the ``mpe_step_multihead`` docstring).
No shipped scenario enables this mode (the fork forces
``discrete_action_input``), so the index path remains the default.
Every behavior in the upstream suite now has a working counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@dataclasses.dataclass(frozen=True)
class MPEWorld:
    """Static world description. Entities: agents [0..n_agents), then
    landmarks."""
    n_agents: int
    n_landmarks: int
    size: Tuple[float, ...]        # [E]
    movable: Tuple[bool, ...]      # [E]
    collide: Tuple[bool, ...]      # [E]
    silent: Tuple[bool, ...]       # [N]
    accel: Tuple[float, ...]       # [N] force sensitivity (upstream 5.0)
    max_speed: Tuple[float, ...]   # [N] (<=0 means unlimited)
    dim_c: int = 0
    dt: float = 0.1
    damping: float = 0.25
    contact_force: float = 1e2
    contact_margin: float = 1e-3

    @property
    def n_entities(self):
        return self.n_agents + self.n_landmarks


@struct.dataclass
class MPEState:
    pos: jax.Array     # [E, 2]
    vel: jax.Array     # [E, 2]
    c: jax.Array       # [N, dim_c] (dim_c >= 1; zeros when silent)
    goal: jax.Array    # scenario-defined int32 vector (may be size 0)
    steps: jax.Array   # i32


def _pair_forces(world: MPEWorld, pos):
    """Soft-contact forces on each entity, [E, 2] (core.py:143-196)."""
    e = world.n_entities
    collide = jnp.asarray(world.collide)
    delta = pos[:, None, :] - pos[None, :, :]            # a - b, [a, b, 2]
    dist = jnp.sqrt(jnp.sum(jnp.square(delta), -1))
    eye = jnp.eye(e, dtype=bool)
    safe = jnp.where(eye, 1.0, dist)
    sizes = jnp.asarray(world.size)
    dist_min = sizes[:, None] + sizes[None, :]
    k = world.contact_margin
    pen = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
    f = world.contact_force * delta / safe[..., None] * pen[..., None]
    pair = collide[:, None] & collide[None, :] & ~eye
    f = jnp.where(pair[..., None], f, 0.0)
    return jnp.sum(f, axis=1)                            # force ON a


def _integrate(world: MPEWorld, state: MPEState, u, c):
    """Shared physics integrator: agent control forces u [N, 2]
    (pre-scaled by accel) + pairwise contact forces -> damped velocity,
    max-speed clamp, position update (core.py:165-196); c [N, dim_c]
    with silent agents zeroed."""
    n, e = world.n_agents, world.n_entities
    force = jnp.zeros((e, 2)).at[:n].set(u) + _pair_forces(world, state.pos)

    movable = jnp.asarray(world.movable)[:, None]
    vel = state.vel * (1.0 - world.damping) + force * world.dt
    speed = jnp.sqrt(jnp.sum(jnp.square(vel), -1, keepdims=True))
    vmax = jnp.concatenate([jnp.asarray(world.max_speed),
                            jnp.zeros(world.n_landmarks)])[:, None]
    vel = jnp.where((vmax > 0) & (speed > vmax),
                    vel / jnp.maximum(speed, 1e-12) * vmax, vel)
    vel = jnp.where(movable, vel, state.vel)
    pos = jnp.where(movable, state.pos + vel * world.dt, state.pos)
    if world.dim_c > 0:
        c = jnp.where(jnp.asarray(world.silent)[:, None], 0.0, c)
    else:
        c = state.c
    return state.replace(pos=pos, vel=vel, c=c, steps=state.steps + 1)


def mpe_step(world: MPEWorld, state: MPEState, move, comm=None):
    """One physics step.  move: [N] int32 in 0..4 (noop/-x/+x/-y/+y,
    environment.py:194-214); comm: [N] int32 symbol (ignored for silent
    agents / dim_c == 0)."""
    a = jnp.asarray(move, jnp.int32)
    ux = (a == 2).astype(jnp.float32) - (a == 1).astype(jnp.float32)
    uy = (a == 4).astype(jnp.float32) - (a == 3).astype(jnp.float32)
    u = jnp.stack([ux, uy], -1) * jnp.asarray(world.accel)[:, None]
    if world.dim_c > 0:
        cm = jnp.zeros((world.n_agents,), jnp.int32) if comm is None \
            else jnp.asarray(comm, jnp.int32)
        c = jax.nn.one_hot(cm, world.dim_c)
    else:
        c = state.c
    return _integrate(world, state, u, c)


def mpe_step_multihead(world: MPEWorld, state: MPEState, move_hot,
                       comm_vec=None):
    """MultiDiscrete / multi-head action composition
    (multi_discrete.py:1-45 + environment.py:177-225, the previously
    unported branch): the movement head is a one-hot (or soft) 5-vector
    composed as u = [h1-h2, h3-h4] * accel (discrete_action_space force
    sum, environment.py:205-207), and the comm head is a continuous
    [N, dim_c] vector passed straight into ``c`` (:219-221) instead of
    a symbol index.  Upstream quirk preserved: the one-hot branch's
    direction convention differs from the index branch's (index 1 means
    -x at :194-197 but h[1] means +x at :205-207) — so an exact one-hot
    with the (1,2)/(3,4) pairs swapped reproduces ``mpe_step``
    bit-for-bit (tests/test_mpe_multihead.py); soft vectors express the
    upstream Box/MultiDiscrete blends."""
    h = jnp.asarray(move_hot, jnp.float32)          # [N, 5]
    u = jnp.stack([h[:, 1] - h[:, 2], h[:, 3] - h[:, 4]], -1) \
        * jnp.asarray(world.accel)[:, None]
    if world.dim_c > 0 and comm_vec is not None:
        c = jnp.asarray(comm_vec, jnp.float32)
    elif world.dim_c > 0:
        c = jnp.zeros((world.n_agents, world.dim_c))
    else:
        c = state.c
    return _integrate(world, state, u, c)


def _uniform(key, n, lo=-1.0, hi=1.0):
    return jax.random.uniform(key, (n, 2), minval=lo, maxval=hi)


def _dist(a, b):
    return jnp.sqrt(jnp.sum(jnp.square(a - b), -1))


def _bound_penalty(x):
    """Out-of-bounds penalty curve (simple_tag.py:104-110)."""
    return jnp.where(x < 0.9, 0.0,
                     jnp.where(x < 1.0, (x - 0.9) * 10.0,
                               jnp.minimum(jnp.exp(2.0 * x - 2.0), 10.0)))


def _pad_cat(rows, width):
    out = []
    for r in rows:
        v = jnp.concatenate(r)
        out.append(jnp.pad(v, (0, width - v.shape[0])))
    return jnp.stack(out)


class Scenario:
    """Base: subclasses define ``world``, ``_reset_extra``, ``reward``,
    ``obs``.  All methods are pure and vmappable."""
    name: str = ""
    world: MPEWorld
    obs_dims: Tuple[int, ...]
    landmark_range: float = 1.0     # reset range for landmark positions
    n_goals: int = 0

    def reset(self, key) -> MPEState:
        w = self.world
        k_a, k_l, k_g = jax.random.split(key, 3)
        pos = jnp.concatenate([
            _uniform(k_a, w.n_agents),
            _uniform(k_l, w.n_landmarks, -self.landmark_range,
                     self.landmark_range)])
        return MPEState(
            pos=pos, vel=jnp.zeros((w.n_entities, 2)),
            c=jnp.zeros((w.n_agents, max(w.dim_c, 1))),
            goal=self._reset_goal(k_g), steps=jnp.int32(0))

    def _reset_goal(self, key):
        if self.n_goals == 0:
            return jnp.zeros((0,), jnp.int32)
        return jax.random.randint(key, (self.n_goals,), 0,
                                  self.world.n_landmarks)

    # helpers
    def _lm(self, state):
        return state.pos[self.world.n_agents:]

    def _apos(self, state):
        return state.pos[:self.world.n_agents]

    def _collide_mat(self, state):
        """[E, E] bool: dist < size_i + size_j (scenario is_collision —
        NO identity exclusion, preserving the upstream self-collision
        quirk)."""
        d = _dist(state.pos[:, None], state.pos[None, :])
        s = jnp.asarray(self.world.size)
        return d < s[:, None] + s[None, :]


# --------------------------------------------------------------------- #


def _w(n_agents, n_landmarks, *, size_a=0.05, size_l=0.05, collide_a=False,
       collide_l=False, movable_l=False, silent=True, dim_c=0, accel=5.0,
       max_speed=0.0, **kw):
    na, nl = n_agents, n_landmarks
    tup = lambda v, k: tuple(v if not isinstance(v, (tuple, list))
                             else v[i] for i in range(k))
    return MPEWorld(
        n_agents=na, n_landmarks=nl,
        size=tup(size_a, na) + tup(size_l, nl),
        movable=(True,) * na + tup(movable_l, nl),
        collide=tup(collide_a, na) + tup(collide_l, nl),
        silent=tup(silent, na), accel=tup(accel, na),
        max_speed=tup(max_speed, na), dim_c=dim_c, **kw)


class Simple(Scenario):
    """simple.py: 1 agent seeks 1 landmark; r = -dist^2."""
    name = "simple"

    def __init__(self):
        self.world = _w(1, 1)
        self.obs_dims = (4,)

    def reward(self, state):
        return -jnp.sum(jnp.square(state.pos[0] - state.pos[1]))[None]

    def obs(self, state):
        return jnp.concatenate([state.vel[0],
                                state.pos[1] - state.pos[0]])[None]


class SimpleSpread(Scenario):
    """simple_spread.py: 3 agents cover 3 landmarks; shared -min-dist
    per landmark; -1 per 'collision' INCLUDING self (upstream quirk)."""
    name = "simple_spread"

    def __init__(self):
        self.world = _w(3, 3, size_a=0.15, collide_a=True, dim_c=2)
        self.obs_dims = (18, 18, 18)

    def reward(self, state):
        a, l = self._apos(state), self._lm(state)
        d = _dist(a[:, None], l[None, :])                 # [agent, lm]
        cover = -jnp.sum(jnp.min(d, axis=0))
        coll = self._collide_mat(state)[:3, :3]
        return cover - jnp.sum(coll, axis=1).astype(jnp.float32)

    def obs(self, state):
        a, l, v = self._apos(state), self._lm(state), state.vel[:3]
        rows = []
        for i in range(3):
            oth = [j for j in range(3) if j != i]
            rows.append([v[i], a[i], (l - a[i]).reshape(-1),
                         (a[jnp.array(oth)] - a[i]).reshape(-1),
                         state.c[jnp.array(oth)].reshape(-1)])
        return _pad_cat(rows, 18)


class SimpleAdversary(Scenario):
    """simple_adversary.py: agent 0 is the adversary; 2 good agents, 2
    landmarks, one secret goal."""
    name = "simple_adversary"
    n_goals = 1

    def __init__(self):
        self.world = _w(3, 2, size_a=0.15, size_l=0.08, dim_c=2)
        self.obs_dims = (8, 10, 10)

    def reward(self, state):
        l = self._lm(state)
        goal = jnp.sum(l * jax.nn.one_hot(state.goal[0], 2)[:, None],
                       axis=0)
        a = self._apos(state)
        d_good = _dist(a[1:], goal)                        # [2]
        d_adv = _dist(a[0], goal)
        good_rew = -jnp.min(d_good) + d_adv
        adv_rew = -jnp.sum(jnp.square(a[0] - goal))
        return jnp.concatenate([adv_rew[None],
                                jnp.full((2,), good_rew)])

    def obs(self, state):
        a, l = self._apos(state), self._lm(state)
        goal = jnp.sum(l * jax.nn.one_hot(state.goal[0], 2)[:, None],
                       axis=0)
        rows = [[(l - a[0]).reshape(-1), a[1] - a[0], a[2] - a[0]]]
        for i in (1, 2):
            oth = [j for j in range(3) if j != i]
            rows.append([goal - a[i], (l - a[i]).reshape(-1),
                         (a[jnp.array(oth)] - a[i]).reshape(-1)])
        return _pad_cat(rows, 10)


_PUSH_LM_COLORS = np.array([[0.1, 0.9, 0.1], [0.1, 0.1, 0.9]], np.float32)


class SimplePush(Scenario):
    """simple_push.py: adversary 0 pushes good agent 1 away from its
    goal landmark."""
    name = "simple_push"
    n_goals = 1

    def __init__(self):
        self.world = _w(2, 2, collide_a=True, dim_c=2)
        self.obs_dims = (8, 19)

    def reward(self, state):
        a, l = self._apos(state), self._lm(state)
        onehot = jax.nn.one_hot(state.goal[0], 2)
        goal = jnp.sum(l * onehot[:, None], axis=0)
        good = -_dist(a[1], goal)
        adv = _dist(a[1], goal) - _dist(a[0], goal)
        return jnp.stack([adv, good])

    def obs(self, state):
        a, l, v = self._apos(state), self._lm(state), state.vel[:2]
        onehot = jax.nn.one_hot(state.goal[0], 2)
        goal = jnp.sum(l * onehot[:, None], axis=0)
        # good agent color = 0.25 + 0.5 * goal one-hot in channels 1:,
        # landmark colors 0.1 + 0.8 one-hot (simple_push.py:35-49)
        color = jnp.array([0.25, 0.25, 0.25]) \
            + jnp.concatenate([jnp.zeros(1), onehot * 0.5])
        lm_colors = jnp.asarray(_PUSH_LM_COLORS).reshape(-1)
        rows = [
            [v[0], (l - a[0]).reshape(-1), a[1] - a[0]],
            [v[1], goal - a[1], color, (l - a[1]).reshape(-1), lm_colors,
             a[0] - a[1]],
        ]
        return _pad_cat(rows, 19)


class SimpleTag(Scenario):
    """simple_tag.py: 3 slower adversaries (0..2) chase 1 faster good
    agent (3) among 2 solid obstacles."""
    name = "simple_tag"

    def __init__(self):
        self.world = _w(
            4, 2, size_a=(0.075, 0.075, 0.075, 0.05), size_l=0.2,
            collide_a=True, collide_l=True, dim_c=2,
            accel=(3.0, 3.0, 3.0, 4.0), max_speed=(1.0, 1.0, 1.0, 1.3))
        self.obs_dims = (16, 16, 16, 14)
        self.landmark_range = 0.9

    def reward(self, state):
        coll = self._collide_mat(state)
        # (good, adv) collision pairs; good agent index 3
        n_hit = jnp.sum(coll[3, :3].astype(jnp.float32))
        adv_rew = 10.0 * n_hit                     # per adversary
        a = self._apos(state)
        bound = jnp.sum(_bound_penalty(jnp.abs(a[3])))
        good_rew = -10.0 * n_hit - bound
        return jnp.concatenate([jnp.full((3,), adv_rew), good_rew[None]])

    def obs(self, state):
        a, l, v = self._apos(state), self._lm(state), state.vel[:4]
        rows = []
        for i in range(4):
            oth = [j for j in range(4) if j != i]
            r = [v[i], a[i], (l - a[i]).reshape(-1),
                 (a[jnp.array(oth)] - a[i]).reshape(-1)]
            if 3 != i:                 # others' vel: non-adversaries only
                r.append(v[3])
            rows.append(r)
        return _pad_cat(rows, 16)


_REF_LM_COLORS = np.array([[0.75, 0.25, 0.25], [0.25, 0.75, 0.25],
                           [0.25, 0.25, 0.75]], np.float32)


class SimpleReference(Scenario):
    """simple_reference.py: each agent must guide the OTHER to a secret
    landmark via a 10-symbol channel; r_i = -dist^2(other, my target)."""
    name = "simple_reference"
    n_goals = 2

    def __init__(self):
        self.world = _w(2, 3, silent=False, dim_c=10)
        self.obs_dims = (21, 21)

    def reward(self, state):
        a, l = self._apos(state), self._lm(state)
        goals = jax.nn.one_hot(state.goal, 3) @ l          # [2, 2]
        # agent i's goal_a is the OTHER agent
        return -jnp.stack(
            [jnp.sum(jnp.square(a[1] - goals[0])),
             jnp.sum(jnp.square(a[0] - goals[1]))])

    def obs(self, state):
        a, l, v = self._apos(state), self._lm(state), state.vel[:2]
        colors = jax.nn.one_hot(state.goal, 3) @ jnp.asarray(
            _REF_LM_COLORS)                                 # [2, 3]
        rows = [[v[0], (l - a[0]).reshape(-1), colors[0], state.c[1]],
                [v[1], (l - a[1]).reshape(-1), colors[1], state.c[0]]]
        return _pad_cat(rows, 21)


_SL_LM_COLORS = np.array([[0.65, 0.15, 0.15], [0.15, 0.65, 0.15],
                          [0.15, 0.15, 0.65]], np.float32)


class SimpleSpeakerListener(Scenario):
    """simple_speaker_listener.py: immobile speaker (0) names the goal
    landmark; silent listener (1) must reach it.  Shared reward."""
    name = "simple_speaker_listener"
    n_goals = 1

    def __init__(self):
        w = _w(2, 3, size_a=0.075, size_l=0.04,
               silent=(False, True), dim_c=3)
        # speaker is immovable (simple_speaker_listener.py:19)
        self.world = dataclasses.replace(
            w, movable=(False, True) + (False,) * 3)
        self.obs_dims = (3, 11)

    def reward(self, state):
        a, l = self._apos(state), self._lm(state)
        goal = jax.nn.one_hot(state.goal[0], 3) @ l
        r = -jnp.sum(jnp.square(a[1] - goal))
        return jnp.full((2,), r)

    def obs(self, state):
        a, l, v = self._apos(state), self._lm(state), state.vel[:2]
        color = jax.nn.one_hot(state.goal[0], 3) @ jnp.asarray(
            _SL_LM_COLORS)
        rows = [[color],
                [v[1], (l - a[1]).reshape(-1), state.c[0]]]
        return _pad_cat(rows, 11)


class SimpleCrypto(Scenario):
    """simple_crypto.py: speaker (2) broadcasts the goal color encrypted
    with a shared key; listener (1) must reconstruct it, adversary (0)
    eavesdrops.  All agents immobile; the game is pure communication.
    goal[0] = goal landmark, goal[1] = key landmark."""
    name = "simple_crypto"
    n_goals = 2

    def __init__(self):
        w = _w(3, 2, dim_c=4, silent=(False, False, False))
        self.world = dataclasses.replace(w, movable=(False,) * 5)
        self.obs_dims = (4, 8, 8)

    def _lm_color(self, idx):
        # landmark i's color = one-hot(i) in dim_c (simple_crypto.py:54-58)
        return jax.nn.one_hot(idx, 4)

    def reward(self, state):
        goal_color = self._lm_color(state.goal[0])
        c = state.c
        active = lambda i: jnp.any(c[i] != 0.0)
        err = lambda i: jnp.sum(jnp.square(c[i] - goal_color))
        good = jnp.where(active(1), -err(1), 0.0) \
            + jnp.where(active(0), err(0), 0.0)
        adv = jnp.where(active(0), -err(0), 0.0)
        return jnp.stack([adv, good, good])

    def obs(self, state):
        goal_color = self._lm_color(state.goal[0])
        key = self._lm_color(state.goal[1])
        comm = state.c[2]                       # only the speaker's c
        rows = [[comm],                          # adversary
                [key, comm],                     # good listener
                [goal_color, key]]               # speaker
        return _pad_cat(rows, 8)


class SimpleWorldComm(Scenario):
    """simple_world_comm.py: 4 adversaries (0 = speaking leader) hunt 2
    good agents among 1 obstacle, 2 food cells, 2 hiding forests."""
    name = "simple_world_comm"

    def __init__(self):
        self.world = _w(
            6, 5,
            size_a=(0.075,) * 4 + (0.045,) * 2,
            size_l=(0.2, 0.03, 0.03, 0.3, 0.3),
            collide_a=True, collide_l=(True, False, False, False, False),
            dim_c=4, silent=(False,) + (True,) * 5,
            accel=(3.0,) * 4 + (4.0,) * 2,
            max_speed=(1.0,) * 4 + (1.3,) * 2)
        self.obs_dims = (34, 34, 34, 34, 28, 28)
        self.landmark_range = 0.9
        self.n_adv, self.n_good = 4, 2

    def reward(self, state):
        coll = self._collide_mat(state)
        a = self._apos(state)
        good_idx = jnp.array([4, 5])
        # pairwise (good, adv) collisions, total over all pairs
        pair_hits = jnp.sum(coll[4:6, :4].astype(jnp.float32))
        rews = []
        d_ga = _dist(a[4:6][:, None], a[:4][None, :])      # [good, adv]
        for i in range(4):                                  # adversaries
            shape = -0.1 * jnp.min(d_ga[:, i])
            rews.append(shape + 5.0 * pair_hits)
        food = state.pos[7:9]
        for g in range(2):                                  # good agents
            i = 4 + g
            hit_adv = jnp.sum(coll[i, :4].astype(jnp.float32))
            bound = jnp.sum(_bound_penalty(jnp.abs(a[i])))
            d_food = _dist(food, a[i])
            on_food = jnp.sum((coll[i, 7:9]).astype(jnp.float32))
            rews.append(-5.0 * hit_adv - 2.0 * bound + 2.0 * on_food
                        + 0.05 * jnp.min(d_food))
        return jnp.stack(rews)

    def obs(self, state):
        w = self.world
        a, v = self._apos(state), state.vel[:6]
        lm = state.pos[6:]                                  # 5 landmarks
        coll = self._collide_mat(state)
        in_f = jnp.stack([coll[:6, 9], coll[:6, 10]], -1)   # [6, 2] bool
        in_f_obs = jnp.where(in_f, 1.0, -1.0)
        comm = state.c[0]                                   # leader only
        rows = []
        for i in range(6):
            oth = [j for j in range(6) if j != i]
            vis = []
            for j in oth:
                same_forest = (in_f[i, 0] & in_f[j, 0]) \
                    | (in_f[i, 1] & in_f[j, 1])
                neither = ~jnp.any(in_f[i]) & ~jnp.any(in_f[j])
                vis.append(same_forest | neither | (i == 0))
            vis = jnp.stack(vis)                            # [5]
            other_pos = jnp.where(vis[:, None],
                                  a[jnp.array(oth)] - a[i], 0.0)
            good_oth = [j for j in oth if j >= 4]
            gsel = jnp.array([oth.index(j) for j in good_oth])
            other_vel = jnp.where(vis[gsel][:, None], v[jnp.array(good_oth)],
                                  0.0)
            r = [v[i], a[i], (lm - a[i]).reshape(-1),
                 other_pos.reshape(-1)]
            if i < 4:      # adversaries (incl. leader): vel, forest, comm
                r += [other_vel.reshape(-1), in_f_obs[i], comm]
            else:          # good: forest flags BEFORE other_vel, no comm
                r += [in_f_obs[i], other_vel.reshape(-1)]
            rows.append(r)
        return _pad_cat(rows, 34)


SCENARIOS = {s.name: s for s in (Simple, SimpleSpread, SimpleAdversary,
                                 SimplePush, SimpleTag, SimpleReference,
                                 SimpleSpeakerListener, SimpleCrypto,
                                 SimpleWorldComm)}


class MPEEnv:
    """Vectorizable env wrapper over a scenario: ``reset(key)`` /
    ``step(state, move[, comm])`` -> (state, (obs, reward_local, done)).
    Episodes cap at ``max_steps`` (upstream episodes are externally
    capped; the world itself never terminates)."""

    def __init__(self, scenario_name: str, max_steps: int = 25):
        self.scenario = SCENARIOS[scenario_name]()
        self.max_steps = max_steps

    def reset(self, key):
        s = self.scenario.reset(key)
        return s, (self.scenario.obs(s), self.scenario.reward(s),
                   jnp.bool_(False))

    def step(self, state, move, comm=None):
        s = mpe_step(self.scenario.world, state, move, comm)
        done = s.steps >= self.max_steps
        return s, (self.scenario.obs(s), self.scenario.reward(s), done)

    def step_multihead(self, state, move_hot, comm_vec=None):
        """MultiDiscrete/Box-style multi-head actions: one-hot (or
        soft) force head + continuous comm head (mpe_step_multihead)."""
        s = mpe_step_multihead(self.scenario.world, state, move_hot,
                               comm_vec)
        done = s.steps >= self.max_steps
        return s, (self.scenario.obs(s), self.scenario.reward(s), done)
