"""Worker script for the multi-host loopback test (spawned by
test_multihost.py): 2 processes x 4 virtual CPU devices = one global
8-device mesh over jax.distributed.

Validates SURVEY.md §4's multi-node strategy: collectives over a global
mesh, and a fully-jitted sharded CM3 training chunk where every global
array is created inside jit (the multi-controller-safe pattern).
"""

import os
import sys

port = sys.argv[1]
pid = int(sys.argv[2])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

mesh = Mesh(jax.devices(), ("data",))

# --- collective sanity: global iota summed with sharded input ---
with jax.set_mesh(mesh):
    out = jax.jit(
        lambda: jnp.sum(jax.lax.with_sharding_constraint(
            jnp.arange(64, dtype=jnp.float32), NamedSharding(mesh,
                                                             P("data")))))()
assert float(out) == 64 * 63 / 2, float(out)

# --- fully-jitted sharded training chunk ---
from cm3_tpu.algs.cm3 import CM3  # noqa: E402
from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig,  # noqa: E402
                                 NNConfig, TrainConfig)
from cm3_tpu.envs.checkers import Checkers  # noqa: E402
from cm3_tpu.replay import buffer as replay  # noqa: E402
from cm3_tpu.train.experiments import make_hooks  # noqa: E402
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout  # noqa

n_envs = 16
env = Checkers(CheckersEnvConfig(n_columns=4, agents_r=(0, 2),
                                 agents_c=(4, 4), n_agents=2, max_steps=20))
alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2),
          NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32,
                   A_n_h2=32))
cfg = TrainConfig(n_envs=n_envs, batch_size=32, buffer_size=256,
                  steps_per_train=5, updates_per_chunk=2, max_steps=20)
hooks = make_hooks("checkers", env)
driver = OffPolicyDriver(hooks, alg, cfg)

data = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())


def shardings_for(tree, leading):
    return jax.tree_util.tree_map(
        lambda x: data if (hasattr(x, "ndim") and x.ndim >= 1
                           and x.shape[0] == leading) else repl, tree)


@jax.jit
def init_all(key):
    rs = init_rollout(hooks, key, n_envs)
    ts = alg.init_state(jax.random.fold_in(key, 1), rs.obs, rs.state,
                        rs.goals)
    dummy_ts = jax.vmap(env.step)(rs.env_state,
                                  jnp.zeros((n_envs, 2), jnp.int32))[1]
    tr = driver._transition(rs, jnp.zeros((n_envs, 2), jnp.int32), dummy_ts,
                            None)
    example = jax.tree_util.tree_map(lambda x: x[0], tr)
    buf = replay.init(example, cfg.buffer_size)
    return rs, ts, buf


# abstract eval to get shardings for outputs
key = jax.random.PRNGKey(0)
shapes = jax.eval_shape(init_all, key)
out_shardings = (
    shardings_for(shapes[0], n_envs),
    jax.tree_util.tree_map(lambda _: repl, shapes[1]),
    shardings_for(shapes[2], cfg.buffer_size),
)
rs, ts, buf = jax.jit(init_all, out_shardings=out_shardings)(key)

ts2, buf2, rs2, metrics = driver._chunk_train(ts, buf, rs, 0.3,
                                              jax.random.PRNGKey(1))
jax.block_until_ready(ts2)
loss = float(metrics["loss_Q_global"])
eps = int(rs2.episodes)
assert eps >= 0
print(f"WORKER{pid} OK loss={loss:.6f} episodes={eps}", flush=True)
