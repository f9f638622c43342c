"""Pallas fused Checkers rollout: the whole trajectory in one kernel.

The XLA scan formulation (bench.py) pays HBM round-trips for the scan
carry every step and threefry for action sampling.  This kernel holds the
ENTIRE env state — bit-packed per ``cm3_tpu/envs/checkers_packed.py`` —
in vector registers/VMEM across a ``fori_loop`` over env steps, samples
actions with the TPU hardware PRNG, and writes only per-instance reward
sums and episode counts back to HBM at the end.  Per program:
``sub x 128`` instances; the grid tiles the batch.

The dynamics code is literally ``checkers_packed.packed_step`` (shared
with the vmap/scan path and differentially tested against the grid
engine, which is golden-tested against the reference), so the kernel
cannot drift from the game semantics.  An action-fed variant exists for
equivalence tests: feed a [T, N, sub, 128] action tensor instead of
using the in-kernel PRNG and compare against a pure-JAX scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3_tpu.envs import checkers_packed as cp

LANES = 128


def _random_actions(shape):
    bits = pltpu.prng_random_bits(shape)
    # discard low bits, convert to non-negative int32, take mod 5
    # (modulo bias is ~1e-9 — irrelevant for a benchmark policy)
    return ((bits >> jnp.uint32(7)).astype(jnp.int32)) % 5


def _body(spec: cp.PackedSpec, n_steps: int, sub: int, actions_ref,
          seed_ref, rew_ref, ep_ref):
    """actions_ref is None for the PRNG (bench) variant."""
    n = len(spec.init_pos)
    shape = (sub, LANES)
    if actions_ref is None:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0) * 7919)

    s0 = cp.packed_init(spec, shape)
    carry0 = (s0, jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.int32))

    def step(t, carry):
        s, rew, ep = carry
        if actions_ref is None:
            acts = tuple(_random_actions(shape) for _ in range(n))
        else:
            block = actions_ref[0, t]            # [N, sub, 128]
            acts = tuple(block[i] for i in range(n))
        s, rs, done = cp.packed_step(spec, s, acts)
        rew = rew + functools.reduce(jnp.add, rs)
        return s, rew, ep + done.astype(jnp.int32)

    _, rew, ep = jax.lax.fori_loop(0, n_steps, step, carry0)
    rew_ref[0] = rew
    ep_ref[0] = ep


def rollout_prng(spec: cp.PackedSpec, batch: int, n_steps: int, seed,
                 sub: int = 64, interpret: bool = False):
    """Random-policy rollout of `batch` instances for `n_steps` env steps.
    Returns (reward_sum [batch], episodes [batch])."""
    per = sub * LANES
    assert batch % per == 0, (batch, per)
    progs = batch // per
    kern = functools.partial(_body, spec, n_steps, sub, None)
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


def rollout_actions(spec: cp.PackedSpec, actions, sub: int = 8,
                    interpret: bool = False):
    """Equivalence-test variant: actions [T, N, batch] int32 drive the
    kernel instead of the PRNG.  Returns (reward_sum [batch],
    episodes [batch])."""
    t, n, batch = actions.shape
    per = sub * LANES
    assert batch % per == 0, (batch, per)
    progs = batch // per
    acts = actions.reshape(t, n, progs, sub, LANES).transpose(2, 0, 1, 3, 4)
    kern = lambda actions_ref, rew_ref, ep_ref: _body(
        spec, t, sub, actions_ref, None, rew_ref, ep_ref)
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
    return (rew.transpose(0, 1, 2).reshape(batch),
            ep.reshape(batch))
