"""Fused Adam + parameter-apply + Polyak-target Pallas kernel.

The CM3 update's tail is three Adam applications plus soft target
updates (reference: nine host round-trips ending in ~dozens of assign
ops, ``alg_credit.py:559-775``; here already one jitted program).  With
``optax.flatten`` (round 2) each network's Adam math runs over one flat
vector, but XLA still emits a separate elementwise-fusion chain per
network per stage: moments, bias-corrected update, parameter add, then
the Polyak target blend — each a kernel launch on a ~1e5-element
vector, i.e. launch-bound, not bandwidth-bound (PERF.md single-seed
latency).  This kernel computes the ENTIRE tail for one network in one
Pallas pass:

    mu'  = b1*mu + (1-b1)*g
    nu'  = b2*nu + (1-b2)*g^2
    p'   = p - lr * (mu'/(1-b1^t)) / (sqrt(nu'/(1-b2^t)) + eps)
    tgt' = tau*p' + (1-tau)*tgt

matching ``optax.adam`` (b1=.9, b2=.999, eps=1e-8, bias correction on
both moments — exactness asserted by tests/test_fused_opt.py) and
``common.soft_update``.  b1/b2/eps/tau/lr are static and baked into the
kernel; the per-step bias corrections (functions of the traced Adam
count) ride in a small VMEM scalar tile — an SMEM scalar operand hangs
the remote Mosaic compile path on this stack (see ops/polyak.py).

Wired into the CM3 update behind ``AlgConfig.fused_opt`` (opt-in;
requires grad_clip == 0 — clipping needs a global norm, a different
program shape).  Extends ops/polyak.py, which remains the standalone
soft-update kernel.
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
_BLOCK = 64
_TILE = _BLOCK * _LANE

B1, B2, EPS = 0.9, 0.999, 1e-8  # TF1 AdamOptimizer defaults (common.adam)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("lr", "tau"))
def _adam_polyak_flat(p, t, mu, nu, g, count, lr: float, tau: float):
    """count: i32 scalar, the number of Adam steps already taken
    (optax ScaleByAdamState.count); corrections use count+1."""
    n = p.shape[0]
    pad = (-n) % _TILE

    def prep(x):
        return jnp.pad(x, (0, pad)).reshape(-1, _LANE)

    pp, tp, mp, vp, gp = map(prep, (p, t, mu, nu, g))
    rows = pp.shape[0]
    grid = (rows // _BLOCK,)

    # per-step bias corrections in a (8, LANE) VMEM tile, broadcast to
    # every grid step (index_map pinned to block 0)
    c = (count + 1).astype(jnp.float32)
    c1 = 1.0 - B1 ** c
    c2 = 1.0 - B2 ** c
    scal = jnp.zeros((8, _LANE), jnp.float32)
    scal = scal.at[0, 0].set(c1).at[0, 1].set(c2)

    def kernel(sc_ref, p_ref, t_ref, m_ref, v_ref, g_ref,
               po_ref, to_ref, mo_ref, vo_ref):
        gg = g_ref[:]
        m2 = B1 * m_ref[:] + (1.0 - B1) * gg
        v2 = B2 * v_ref[:] + (1.0 - B2) * gg * gg
        c1 = sc_ref[0, 0]
        c2 = sc_ref[0, 1]
        upd = (m2 / c1) / (jnp.sqrt(v2 / c2) + EPS)
        p2 = p_ref[:] - lr * upd
        po_ref[:] = p2
        to_ref[:] = tau * p2 + (1.0 - tau) * t_ref[:]
        mo_ref[:] = m2
        vo_ref[:] = v2

    vm = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU
                                          and not _interpret()) else {}
    blk = lambda: pl.BlockSpec((_BLOCK, _LANE), lambda i: (i, 0), **vm)
    sc_spec = pl.BlockSpec((8, _LANE), lambda i: (0, 0), **vm)
    shape = jax.ShapeDtypeStruct(pp.shape, pp.dtype)
    p2, t2, m2, v2 = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape, shape),
        grid=grid,
        in_specs=[sc_spec, blk(), blk(), blk(), blk(), blk()],
        out_specs=(blk(), blk(), blk(), blk()),
        interpret=_interpret(),
    )(scal, pp, tp, mp, vp, gp)
    cut = lambda x: x.reshape(-1)[:n]
    return cut(p2), cut(t2), cut(m2), cut(v2)


def adam_polyak(opt_state, params, tgt, grads, lr: float, tau: float):
    """Drop-in fused replacement for

        upd, new_opt = common.adam(lr).update(grads, opt_state, params)
        new_p = optax.apply_updates(params, upd)
        new_t = common.soft_update(tgt, new_p, tau)

    ``opt_state`` must be the ``optax.flatten(optax.adam(...))`` state
    (``common.adam`` with grad_clip=0): its inner ScaleByAdamState
    already holds FLAT mu/nu in ravel_pytree order, so no extra
    flattening of the moments is needed.  Returns
    (new_params, new_tgt, new_opt_state)."""
    p, unravel = ravel_pytree(params)
    t, _ = ravel_pytree(tgt)
    g, _ = ravel_pytree(grads)
    adam_state = opt_state[0]
    count, mu, nu = adam_state.count, adam_state.mu, adam_state.nu
    p2, t2, m2, v2 = _adam_polyak_flat(p, t, mu, nu, g, count,
                                       float(lr), float(tau))
    new_inner = adam_state._replace(count=count + 1, mu=m2, nu=v2)
    new_opt = (new_inner,) + tuple(opt_state[1:])
    return unravel(p2), unravel(t2), new_opt
