"""Probe: per-agent return ceiling for the 2-car roadway stage-2 task.

Drives both cars with a scripted controller (sublane-step toward the
goal-lane center when misaligned, else accelerate; all through the same
TTC check_actions filter training uses) over many sampled episodes and
reports the distribution of min-over-agents episode returns.

Calibrates the stage-2 gate: the reference's literal snapshot condition
``np.all(r_local_eval > 18)`` (config_sumo_stage2.json:14) is
unsatisfiable (per-agent max ~10), and the staggered second departure
plus goal-lane randomization cost shaping reward, so the two-car
per-agent ceiling sits below the stage-1 ceiling of 10.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core import config as cfgmod
from cm3_tpu.envs.roadway import ACC, LEFT, RIGHT
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.train.experiments import make_hooks

env = Roadway(cfgmod.roadway_env_config(2))
c = env.cfg
hooks = make_hooks("roadway", env)
n = hooks.n_agents


def scripted(state):
    goal_sub = (state.goal_lane * c.sublanes_per_lane
                + c.sublanes_per_lane // 2)
    delta = goal_sub - state.sublane
    return jnp.where(delta > 0, LEFT,
                     jnp.where(delta < 0, RIGHT, ACC)).astype(jnp.int32)


def rollout(key):
    state, ts, goals = hooks.episode_init(key)

    def body(carry, _):
        state, ret, done = carry
        a = env.check_actions(state, scripted(state))
        ns, ts2 = env.step(state, a)
        ret = ret + jnp.where(done, 0.0, ts2.reward_local)
        return (ns, ret, done | ts2.done), ()

    (state, ret, done), _ = jax.lax.scan(
        body, (state, jnp.zeros(n), jnp.bool_(False)),
        jnp.arange(c.max_step))
    return ret


keys = jax.random.split(jax.random.PRNGKey(0), 512)
rets = np.asarray(jax.vmap(rollout)(keys))        # [512, N]
mins = rets.min(axis=1)
print("scripted 2-car: mean per-agent", rets.mean(0).round(2),
      "mean min", mins.mean().round(3),
      "p90 min", np.percentile(mins, 90).round(3),
      "max min", mins.max().round(3))
# the eval statistic the gate uses: mean over 10-episode blocks of the
# per-agent mean, min over agents
blocks = rets[:510].reshape(51, 10, n).mean(axis=1).min(axis=1)
print("10-episode-eval min-over-agents: mean", blocks.mean().round(3),
      "best of", len(blocks), "blocks:", blocks.max().round(3))
