"""Pallas fused particle rollout: the whole trajectory in one kernel.

Same design as the Checkers/roadway fused rollouts: the struct-of-arrays
MPE physics state (``cm3_tpu/envs/particle_soa.py`` — six floats per
agent + step/collision counters) lives in vector registers/VMEM across a
``fori_loop``, actions come from the TPU hardware PRNG (bench variant)
or a fed tensor (equivalence-test variant), episodes auto-reset on done,
and only per-instance reward sums and episode counts return to HBM.

The dynamics code is literally ``particle_soa.soa_step`` (differentially
tested against the ``Particle`` engine, which is parity-tested against
the reference MPE physics), so the kernel cannot drift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3_tpu.core.config import ParticleEnvConfig
from cm3_tpu.envs import particle_soa as ps

LANES = 128


def _random_actions(shape):
    bits = pltpu.prng_random_bits(shape)
    return ((bits >> jnp.uint32(7)).astype(jnp.int32)) % 5


def _body(cfg: ParticleEnvConfig, n_steps: int, sub: int, actions_ref,
          seed_ref, rew_ref, ep_ref):
    n = cfg.n_agents
    shape = (sub, LANES)
    if actions_ref is None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * 7919)

    s0 = ps.soa_init(cfg, shape)
    carry0 = (s0, jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32))

    def step(t, carry):
        s, rew, ep = carry
        if actions_ref is None:
            acts = tuple(_random_actions(shape) for _ in range(n))
        else:
            block = actions_ref[0, t]            # [N, sub, 128]
            acts = tuple(block[i] for i in range(n))
        s, rws, done = ps.soa_step(cfg, s, acts)
        rew = rew + functools.reduce(jnp.add, rws)
        s = jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), s0, s)
        return s, rew, ep + done.astype(jnp.int32)

    _, rew, ep = jax.lax.fori_loop(0, n_steps, step, carry0)
    rew_ref[0] = rew
    ep_ref[0] = ep


def _pallas(cfg, n_steps, sub, progs, interpret, kern, *operands):
    return pl.pallas_call(
        kern,
        grid=(progs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)
                  if op.shape == (1, 1) else
                  pl.BlockSpec((1,) + op.shape[1:],
                               lambda i, nd=op.ndim: (i,) + (0,) * (nd - 1),
                               memory_space=pltpu.VMEM)
                  for op in operands],
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
    )(*operands)


def rollout_prng(cfg: ParticleEnvConfig, batch: int, n_steps: int, seed,
                 sub: int = 64, interpret: bool = False):
    """Random-policy rollout with auto-reset.  Returns
    (reward_sum [batch], episodes [batch])."""
    per = sub * LANES
    assert batch % per == 0, (batch, per)
    progs = batch // per
    kern = functools.partial(_body, cfg, n_steps, sub, None)
    rew, ep = _pallas(cfg, n_steps, sub, progs, interpret, kern,
                      jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return rew.reshape(batch), ep.reshape(batch)


def rollout_actions(cfg: ParticleEnvConfig, actions, sub: int = 8,
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
    rew, ep = _pallas(cfg, t, sub, progs, interpret, kern, acts)
    return rew.reshape(batch), ep.reshape(batch)
