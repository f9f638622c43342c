"""CM3 update-latency microbenchmark: attack the 0.81 ms floor.

Measures, on the flagship 2-agent checkers stage-2 CM3 at B=128 (the
PERF.md single-seed-latency shape):

  * ``update_default`` — the full fused update, optax tail
  * ``update_fused``   — the full fused update with AlgConfig.fused_opt
    (one Pallas Adam+apply+Polyak kernel per network,
    ops/fused_opt.py)
  * ``tail_xla`` / ``tail_fused`` — the optimizer tail ONLY (3 Adam
    applications + 3 soft target updates on fixed grads), isolating
    what the kernel fuses

Median-of-blocks timing with one device sync per block (the tunnel RTT
would otherwise dominate; PERF.md measurement-honesty note), iterations
chained through the carried TrainState so device execution is
sequential.

    python scripts/bench_update.py [--cpu] [--iters N] [--blocks K]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def _build(fused: bool):
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import AlgConfig, CheckersEnvConfig
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.train.experiments import make_hooks
    from cm3_tpu.core import prng

    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    alg = CM3("checkers", env.spec(),
              AlgConfig(n_agents=2, stage=2, fused_opt=fused))
    hooks = make_hooks("checkers", env)
    key = jax.random.PRNGKey(0)
    B = 128
    keys = prng.split_batch(key, B)
    env_state, ts0, goals = jax.vmap(hooks.episode_init)(keys)
    a = jnp.zeros((B, 2), jnp.int32)
    _, ts1 = jax.vmap(env.step)(env_state, a)
    batch = {"obs": ts0.obs, "state": ts0.state, "a": a, "a_prev": a,
             "r": ts1.reward, "rl": ts1.reward_local,
             "obs_next": ts1.obs, "state_next": ts1.state,
             "done": ts1.done, "goals": goals}
    ts = alg.init_state(jax.random.PRNGKey(1), ts0.obs, ts0.state, goals)
    return alg, ts, batch


def _time_chain(step, init_carry, iters: int, blocks: int, sync):
    """DEVICE time per iteration: ``iters`` sequential steps run inside
    ONE jitted lax.scan (so per-dispatch host/tunnel overhead — ~5 ms
    through this environment's tunnel, 7x the device time! — amortizes
    to nothing), timed over ``blocks`` scans, median [min-max]."""
    import jax.numpy as jnp

    def body(carry, i):
        return step(carry, i), None

    run = jax.jit(lambda c, base: jax.lax.scan(
        body, c, base + jnp.arange(iters))[0])
    carry = run(init_carry, jnp.int32(0))      # compile
    sync(carry)
    rates = []
    for b in range(blocks):
        t0 = time.perf_counter()
        carry = run(carry, jnp.int32(1000 * (b + 1)))
        sync(carry)
        rates.append((time.perf_counter() - t0) / iters)
    rates.sort()
    return rates[len(rates) // 2], rates[0], rates[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--blocks", type=int, default=5)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    out = {"backend": jax.default_backend(),
           "iters": args.iters, "blocks": args.blocks}

    for name, fused in (("default", False), ("fused", True)):
        alg, ts, batch = _build(fused)
        upd = jax.jit(lambda t, k: alg.update(t, batch, 0.1, k)[0])

        def step(t, i):
            return upd(t, jax.random.fold_in(jax.random.PRNGKey(2), i))

        med, lo, hi = _time_chain(step, ts, args.iters, args.blocks,
                                  lambda t: float(t.step))
        out[f"update_{name}_us"] = round(med * 1e6, 1)
        out[f"update_{name}_us_range"] = [round(lo * 1e6, 1),
                                          round(hi * 1e6, 1)]

    # optimizer tail only, fixed grads (the part the kernel fuses)
    from cm3_tpu.algs import common
    from cm3_tpu.ops import fused_opt
    alg, ts, batch = _build(False)
    g_actor = jax.tree_util.tree_map(lambda x: 0.01 * jnp.ones_like(x),
                                     ts.actor)
    g_qg = jax.tree_util.tree_map(lambda x: 0.01 * jnp.ones_like(x), ts.qg)
    g_qc = jax.tree_util.tree_map(lambda x: 0.01 * jnp.ones_like(x), ts.qc)

    @jax.jit
    def tail_xla(t):
        u1, oa = alg.opt_actor.update(g_actor, t.opt_actor, t.actor)
        a2 = optax.apply_updates(t.actor, u1)
        u2, og = alg.opt_q.update(g_qg, t.opt_qg, t.qg)
        q2 = optax.apply_updates(t.qg, u2)
        u3, oc = alg.opt_q.update(g_qc, t.opt_qc, t.qc)
        c2 = optax.apply_updates(t.qc, u3)
        return t.replace(
            actor=a2, actor_tgt=common.soft_update(t.actor_tgt, a2, 0.01),
            qg=q2, qg_tgt=common.soft_update(t.qg_tgt, q2, 0.01),
            qc=c2, qc_tgt=common.soft_update(t.qc_tgt, c2, 0.01),
            opt_actor=oa, opt_qg=og, opt_qc=oc, step=t.step + 1)

    @jax.jit
    def tail_fused(t):
        a2, at2, oa = fused_opt.adam_polyak(t.opt_actor, t.actor,
                                            t.actor_tgt, g_actor, 1e-4, 0.01)
        q2, qt2, og = fused_opt.adam_polyak(t.opt_qg, t.qg, t.qg_tgt,
                                            g_qg, 1e-3, 0.01)
        c2, ct2, oc = fused_opt.adam_polyak(t.opt_qc, t.qc, t.qc_tgt,
                                            g_qc, 1e-3, 0.01)
        return t.replace(actor=a2, actor_tgt=at2, qg=q2, qg_tgt=qt2,
                         qc=c2, qc_tgt=ct2, opt_actor=oa, opt_qg=og,
                         opt_qc=oc, step=t.step + 1)

    for name, fn in (("xla", tail_xla), ("fused", tail_fused)):
        med, lo, hi = _time_chain(lambda t, i: fn(t), ts, args.iters,
                                  args.blocks, lambda t: float(t.step))
        out[f"tail_{name}_us"] = round(med * 1e6, 1)
        out[f"tail_{name}_us_range"] = [round(lo * 1e6, 1),
                                        round(hi * 1e6, 1)]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
