"""Pallas fused roadway rollout: the whole trajectory in one kernel.

Same design as the Checkers fused rollout
(``cm3_tpu/ops/checkers_rollout.py``): the struct-of-arrays dynamics
state (``cm3_tpu/envs/roadway_soa.py`` — eight scalars per car) lives in
vector registers/VMEM across a ``fori_loop`` over control steps; actions
come from the TPU hardware PRNG (bench variant) or a fed tensor
(equivalence-test variant); auto-reset on done; only per-instance reward
sums and episode counts return to HBM.

The dynamics code is literally ``roadway_soa.soa_check_actions`` +
``soa_step`` (differentially tested against the grid-observation engine,
which carries the reference citations and is tested against the C++
golden engine), so the kernel cannot drift from the game semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3_tpu.core.config import RoadwayEnvConfig
from cm3_tpu.envs import roadway_soa as rs

LANES = 128


def _random_actions(shape):
    bits = pltpu.prng_random_bits(shape)
    return ((bits >> jnp.uint32(7)).astype(jnp.int32)) % 5


def _select(done, init, cur):
    # bool leaves avoid `where` (Mosaic cannot lower i1-result selects)
    def sel(a, b):
        if a.dtype == jnp.bool_:
            return (done & a) | (~done & b)
        return jnp.where(done, a, b)
    return jax.tree_util.tree_map(sel, init, cur)


def _body(cfg: RoadwayEnvConfig, n_steps: int, sub: int, actions_ref,
          seed_ref, rew_ref, ep_ref):
    n = cfg.n_agents
    shape = (sub, LANES)
    if actions_ref is None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * 7919)

    s0 = rs.soa_init(cfg, shape)
    carry0 = (s0, jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32))

    def step(t, carry):
        s, rew, ep = carry
        if actions_ref is None:
            acts = tuple(_random_actions(shape) for _ in range(n))
        else:
            block = actions_ref[0, t]            # [N, sub, 128]
            acts = tuple(block[i] for i in range(n))
        acts = rs.soa_check_actions(cfg, s, acts)
        s, rws, done = rs.soa_step(cfg, s, acts)
        rew = rew + functools.reduce(jnp.add, rws)
        s = _select(done, s0, s)
        return s, rew, ep + done.astype(jnp.int32)

    _, rew, ep = jax.lax.fori_loop(0, n_steps, step, carry0)
    rew_ref[0] = rew
    ep_ref[0] = ep


def rollout_prng(cfg: RoadwayEnvConfig, batch: int, n_steps: int, seed,
                 sub: int = 64, interpret: bool = False):
    """Random-policy rollout of `batch` instances for `n_steps` control
    steps with in-kernel check_actions + auto-reset.  Returns
    (reward_sum [batch], episodes [batch])."""
    per = sub * LANES
    assert batch % per == 0, (batch, per)
    progs = batch // per
    kern = functools.partial(_body, cfg, n_steps, sub, None)
    rew, ep = pl.pallas_call(
        kern,
        grid=(progs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((progs, sub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((progs, sub, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return rew.reshape(batch), ep.reshape(batch)


def rollout_actions(cfg: RoadwayEnvConfig, actions, sub: int = 8,
                    interpret: bool = False):
    """Equivalence-test variant: actions [T, N, batch] i32 drive the
    kernel instead of the PRNG."""
    t, n, batch = actions.shape
    per = sub * LANES
    assert batch % per == 0, (batch, per)
    progs = batch // per
    acts = actions.reshape(t, n, progs, sub, LANES).transpose(2, 0, 1, 3, 4)
    kern = lambda actions_ref, rew_ref, ep_ref: _body(
        cfg, t, sub, actions_ref, None, rew_ref, ep_ref)
    rew, ep = pl.pallas_call(
        kern,
        grid=(progs,),
        in_specs=[pl.BlockSpec((1, t, n, sub, LANES),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((progs, sub, LANES), jnp.float32),
            jax.ShapeDtypeStruct((progs, sub, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(acts)
    return rew.reshape(batch), ep.reshape(batch)
