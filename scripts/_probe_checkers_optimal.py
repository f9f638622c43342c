"""Probe: best achievable stage-1 Checkers return under the reference
rules (3x8 board, 33 steps, +1 own color / -0.5 other / -0.1 invalid).

Beam search over the actual JAX grid engine.  Calibrates the solved
gate (sum eval > 9.0): a full-board sweep scores exactly +6.0 (12
greens - 12 x 0.5 oranges) — the local optimum vectorized training
tends to find — while hub routes that revisit cleared cells score ~10.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core.config import CheckersEnvConfig
from cm3_tpu.envs.checkers import Checkers

env = Checkers(CheckersEnvConfig(n_agents=1, agents_r=(0,), agents_c=(8,),
                                 max_steps=33))
goals = jnp.asarray([[1.0, 0.0]])  # green

state, ts = env.reset(jax.random.PRNGKey(0), goals)

step_v = jax.jit(jax.vmap(env.step, in_axes=(0, 0)))

BEAM = 4096
# replicate initial state BEAM times
stack = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x[None], (1,) + x.shape), state)
rets = np.zeros(1)

for t in range(33):
    b = rets.shape[0]
    # expand each beam entry with all 5 actions
    rep = jax.tree_util.tree_map(lambda x: jnp.repeat(x, 5, axis=0), stack)
    acts = jnp.tile(jnp.arange(5), b)[:, None]
    new_state, new_ts = step_v(rep, acts)
    new_rets = np.repeat(rets, 5) + np.asarray(new_ts.reward)
    # dedupe/rank: keep top-BEAM by return (ties broken arbitrarily)
    order = np.argsort(-new_rets)[:BEAM]
    rets = new_rets[order]
    stack = jax.tree_util.tree_map(lambda x: x[np.asarray(order)], new_state)

print("beam-search best return over 33 steps:", float(rets.max()))
print("top-5:", [round(float(v), 2) for v in rets[:5]])
