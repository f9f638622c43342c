"""Uniform environment interface.

Every engine is a pure function pair over a struct-of-arrays state:

    reset(key, goals) -> (EnvState, TimeStep)
    step(state, actions) -> (EnvState, TimeStep)

mirroring the reference env tuples (e.g. ``env/checkers.py:228,265``,
``multiagent/environment.py:81,125``, ``env/multicar_simple.py:358,429``)
but jit/vmap-compatible: no Python-side mutation, static shapes, and
per-instance ``done`` flags so thousands of instances step in lockstep.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import struct


@struct.dataclass
class TimeStep:
    """One observation bundle.

    obs: env-specific dict of per-agent observation arrays.
    state: env-specific dict of global-state arrays.
    reward: scalar global reward (sum of locals).
    reward_local: [n_agents] per-agent rewards.
    done: scalar bool — episode terminal.
    """

    obs: Dict[str, Any]
    state: Dict[str, Any]
    reward: jax.Array
    reward_local: jax.Array
    done: jax.Array


class Env:
    """Marker base class; concrete envs define reset/step as pure methods
    (safe to close over in jit since configs are frozen dataclasses)."""

    def spec(self) -> Dict[str, int]:
        raise NotImplementedError

    def reset(self, key, goals):
        raise NotImplementedError

    def step(self, state, actions):
        raise NotImplementedError
