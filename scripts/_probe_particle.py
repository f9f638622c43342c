"""Probe: what return/reach-rate does a scripted greedy policy achieve on
particle stage-1?  Calibrates the learning gate for reproduce_paper."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from cm3_tpu.core import config as cfgmod
from cm3_tpu.envs.particle import Particle

m = cfgmod.load_json("master.json")
m.update(dict(experiment="particle", particle_config="stage1", stage=1))
pc = cfgmod.particle_env_config("stage1", prob_random=float(m["prob_random"]),
                                max_steps=int(m["max_steps"]))
env = Particle(pc)


def greedy_policy(state, brake=True):
    """Move along the axis with the larger |delta|; simple braking when
    projected overshoot."""
    delta = state.landmarks - state.pos          # [1,2]
    v = state.vel
    # predicted position if we coast
    tgt = delta[0]
    # choose axis with larger error
    ax = jnp.argmax(jnp.abs(tgt))
    err = tgt[ax]
    vel_ax = v[0, ax]
    # brake if moving fast toward goal and close
    want = jnp.where(err > 0, 1.0, -1.0)
    if brake:
        # if |vel| overshoots the remaining distance in ~3 steps, reverse
        overshoot = jnp.abs(vel_ax) * 0.3 > jnp.abs(err)
        want = jnp.where(overshoot, -jnp.sign(vel_ax), want)
    # map to action: x axis: +1 -> 2, -1 -> 1 ; y: +1 -> 4, -1 -> 3
    act_x = jnp.where(want > 0, 2, 1)
    act_y = jnp.where(want > 0, 4, 3)
    return jnp.where(ax == 0, act_x, act_y).astype(jnp.int32)[None]


def rollout(key):
    state, ts = env.reset(key)
    def body(carry, _):
        state, ret, done = carry
        a = greedy_policy(state)
        ns, ts = env.step(state, a)
        ret = ret + jnp.where(done, 0.0, ts.reward)
        newdone = done | ts.done
        ns = jax.tree_util.tree_map(lambda n, o: jnp.where(done, o, n), ns, state)
        return (ns, ret, newdone), (ts.done, ns.reached)
    (state, ret, done), (dones, reached) = jax.lax.scan(
        body, (state, jnp.float32(0.0), jnp.bool_(False)),
        jnp.arange(pc.max_steps))
    return ret, jnp.all(state.reached), state.steps


keys = jax.random.split(jax.random.PRNGKey(0), 512)
rets, reach, steps = jax.vmap(rollout)(keys)
print("scripted greedy: mean return", float(rets.mean()),
      "reach rate", float(reach.mean()),
      "mean steps", float(steps.mean()))

# no-op policy baseline
def rollout_noop(key):
    state, ts = env.reset(key)
    def body(carry, _):
        state, ret, done = carry
        ns, ts = env.step(state, jnp.zeros((1,), jnp.int32))
        ret = ret + jnp.where(done, 0.0, ts.reward)
        return (ns, ret, done | ts.done), ()
    (state, ret, done), _ = jax.lax.scan(
        body, (state, jnp.float32(0.0), jnp.bool_(False)),
        jnp.arange(pc.max_steps))
    return ret
rets0 = jax.vmap(rollout_noop)(keys)
print("noop: mean return", float(rets0.mean()))
