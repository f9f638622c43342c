"""Headline benchmark: aggregate Checkers env throughput on TPU.

Steps B vectorized two-agent Checkers instances with a random policy,
fused over T steps with ``lax.scan`` under one jit (no per-step host
round-trips), and reports instance-steps/second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured-value / north-star target (10M env-steps/s
aggregate, BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp


def bench_checkers_throughput(batch: int = 8192, steps: int = 256,
                              reps: int = 5):
    from cm3_tpu.core.config import CheckersEnvConfig
    from cm3_tpu.envs.checkers import Checkers

    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    goals = jnp.tile(jnp.eye(2)[None], (batch, 1, 1))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(batch))
    state, _ = jax.jit(jax.vmap(env.reset))(keys, goals)
    # checkers reset is deterministic given goals -> cache one reset state
    # and broadcast-select it on done instead of recomputing per step
    reset_state = jax.tree_util.tree_map(lambda x: x[:1], state)

    @jax.jit
    def rollout(state, key):
        def body(st, k):
            actions = jax.random.randint(k, (batch, 2), 0, 5)
            st, ts = jax.vmap(env.step)(st, actions)
            st = jax.tree_util.tree_map(
                lambda r, s: jnp.where(
                    ts.done.reshape((-1,) + (1,) * (s.ndim - 1)), r, s),
                reset_state, st)
            return st, ts.reward
        st, rew = jax.lax.scan(body, state, jax.random.split(key, steps))
        return st, rew.sum()

    # warmup/compile
    state, _ = rollout(state, jax.random.PRNGKey(0))
    jax.block_until_ready(state)

    t0 = time.time()
    for i in range(reps):
        state, r = rollout(state, jax.random.PRNGKey(i + 1))
    jax.block_until_ready(state)
    dt = time.time() - t0
    return batch * steps * reps / dt


if __name__ == "__main__":
    value = bench_checkers_throughput()
    print(json.dumps({
        "metric": "checkers_env_steps_per_s",
        "value": round(value),
        "unit": "env-steps/s",
        "vs_baseline": round(value / 10e6, 3),
    }))
