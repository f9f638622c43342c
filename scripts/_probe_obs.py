import time, jax, jax.numpy as jnp
from cm3_tpu.core.config import CheckersEnvConfig
from cm3_tpu.envs.checkers import Checkers

batch, steps, reps = 8192, 256, 5
env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2), agents_c=(8, 8), max_steps=50))
goals = jnp.tile(jnp.eye(2)[None], (batch, 1, 1))
keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(batch))
state0, _ = jax.jit(jax.vmap(env.reset))(keys, goals)
reset_state = jax.tree_util.tree_map(lambda x: x[:1], state0)

def make(live):
    @jax.jit
    def rollout(state, key):
        def body(st, k):
            actions = jax.random.randint(k, (batch, 2), 0, 5)
            st, ts = jax.vmap(env.step)(st, actions)
            st = jax.tree_util.tree_map(
                lambda r, s: jnp.where(ts.done.reshape((-1,) + (1,) * (s.ndim - 1)), r, s),
                reset_state, st)
            out = ts.reward.sum()
            if "t" in live: out = out + ts.obs["self_t"].sum()
            if "v" in live: out = out + ts.obs["self_v"].sum()
            if "o" in live: out = out + ts.obs["others"].sum()
            if "s" in live: out = out + ts.state["grid"].sum() + ts.state["vec"].sum()
            return st, out
        st, rew = jax.lax.scan(body, state, jax.random.split(key, steps))
        return st, rew.sum()
    return rollout

for live in ["", "t", "v", "o", "s", "tvo", "tvos"]:
    ro = make(live)
    st, r = ro(state0, jax.random.PRNGKey(0)); float(r)
    t0 = time.time()
    for i in range(reps):
        st, r = ro(st, jax.random.PRNGKey(i + 1)); float(r)
    dt = time.time() - t0
    print(live or "none", round(batch * steps * reps / dt / 1e6, 2), "M steps/s")
