"""Fused Pallas soft-target update.

The reference updates targets with ~dozens of per-variable assign ops per
train step (``alg_credit.py:162-225``, run at ``:775``).  The pytree
``tree_map`` equivalent fuses under XLA but emits one elementwise kernel
per leaf; for the many-small-leaf trees here (dozens of dense
kernels/biases) a single flat Pallas kernel does one pass over one
contiguous buffer:  t <- tau*m + (1-tau)*t.

tau is a static hyperparameter and is baked into the kernel (an SMEM
scalar operand hangs the remote Mosaic compile path on this stack —
see .claude/skills/verify/SKILL.md).

Usage: ``polyak_update(target_tree, main_tree, tau)`` — flattens with
``ravel_pytree``, runs the kernel tiled over the flat vector, unravels.
On CPU (tests) the kernel runs in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.flatten_util import ravel_pytree

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_LANE = 128
_BLOCK = 64  # sublanes per grid step -> (64, 128) f32 tiles
_TILE = _BLOCK * _LANE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("tau",))
def _polyak_flat(t_flat, m_flat, tau: float):
    n = t_flat.shape[0]
    pad = (-n) % _TILE
    tp = jnp.pad(t_flat, (0, pad)).reshape(-1, _LANE)
    mp = jnp.pad(m_flat, (0, pad)).reshape(-1, _LANE)
    rows = tp.shape[0]
    grid = (rows // _BLOCK,)

    def kernel(t_ref, m_ref, out_ref):
        out_ref[:] = tau * m_ref[:] + (1.0 - tau) * t_ref[:]

    vm = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU
                                          and not _interpret()) else {}
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(tp.shape, tp.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((_BLOCK, _LANE), lambda i: (i, 0), **vm),
                  pl.BlockSpec((_BLOCK, _LANE), lambda i: (i, 0), **vm)],
        out_specs=pl.BlockSpec((_BLOCK, _LANE), lambda i: (i, 0), **vm),
        interpret=_interpret(),
    )(tp, mp)
    return out.reshape(-1)[:n]


def polyak_update(target_tree, main_tree, tau: float):
    """Single-kernel soft update of an arbitrary (matching) pytree pair."""
    t_flat, unravel = ravel_pytree(target_tree)
    m_flat, _ = ravel_pytree(main_tree)
    return unravel(_polyak_flat(t_flat, m_flat, float(tau)))
