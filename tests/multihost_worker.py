"""Worker script for the multi-host loopback tests (spawned by
test_multihost.py): 2 processes x 4 virtual CPU devices = one global
8-device mesh over jax.distributed.

Validates SURVEY.md §4's multi-node strategy: collectives over a global
mesh, and fully-jitted sharded CM3 training where every global array is
created inside jit (the multi-controller-safe pattern).  Modes:

  chunk  — one sharded training chunk (collective + numerics sanity)
  train  — a short end-to-end training run (~120 episodes) + greedy
           eval, proving the DRIVER loop runs unchanged under
           multi-controller execution (parallel/dist.py claim); the
           test compares the eval value across processes and against a
           single-process run of the same global program.

``train_eval`` is imported by the pytest process too (no side effects
at module import).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_envs=16):
    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig, NNConfig,
                                     TrainConfig)
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.train.experiments import make_hooks
    from cm3_tpu.train.offpolicy import OffPolicyDriver

    env = Checkers(CheckersEnvConfig(n_columns=4, agents_r=(0, 2),
                                     agents_c=(4, 4), n_agents=2,
                                     max_steps=20))
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=2, stage=2),
              NNConfig(Q_n_h1_1=32, Q_n_h1_2=16, Q_n_h2=32, A_n_h1=32,
                       A_n_h2=32))
    cfg = TrainConfig(n_envs=n_envs, batch_size=32, buffer_size=256,
                      steps_per_train=5, updates_per_chunk=2, max_steps=20,
                      pretrain_episodes=16, epsilon_div=100.0)
    hooks = make_hooks("checkers", env)
    driver = OffPolicyDriver(hooks, alg, cfg)
    return env, alg, cfg, hooks, driver


def _sharded_init(driver, env, alg, cfg, hooks, mesh, n_envs):
    """All global arrays created INSIDE jit with explicit out_shardings
    (multi-controller safe: no host-side global array construction)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cm3_tpu.replay import buffer as replay
    from cm3_tpu.train.offpolicy import init_rollout

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def shardings_for(tree, leading):
        return jax.tree_util.tree_map(
            lambda x: data if (hasattr(x, "ndim") and x.ndim >= 1
                               and x.shape[0] == leading) else repl, tree)

    def init_all(key):
        rs = init_rollout(hooks, key, n_envs)
        ts = alg.init_state(jax.random.fold_in(key, 1), rs.obs, rs.state,
                            rs.goals)
        dummy_ts = jax.vmap(env.step)(rs.env_state,
                                      jnp.zeros((n_envs, 2), jnp.int32))[1]
        tr = driver._transition(rs, jnp.zeros((n_envs, 2), jnp.int32),
                                dummy_ts, None)
        example = jax.tree_util.tree_map(lambda x: x[0], tr)
        buf = replay.init(example, cfg.buffer_size)
        return rs, ts, buf

    key = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(init_all, key)
    out_shardings = (
        shardings_for(shapes[0], n_envs),
        jax.tree_util.tree_map(lambda _: repl, shapes[1]),
        shardings_for(shapes[2], cfg.buffer_size),
    )
    import jax as _jax
    return _jax.jit(init_all, out_shardings=out_shardings)(key)


def train_eval(n_episodes=120):
    """Short end-to-end training run over a global mesh spanning ALL
    devices (local or multi-process), returning the greedy eval global
    return.  Deterministic: same global program -> same value on every
    controller and on a single-process run."""
    import jax
    from jax.sharding import Mesh

    env, alg, cfg, hooks, driver = build()
    mesh = Mesh(jax.devices(), ("data",))
    rs, ts, buf = _sharded_init(driver, env, alg, cfg, hooks, mesh,
                                cfg.n_envs)

    key = jax.random.PRNGKey(42)
    episodes, chunk = 0, 0
    while episodes < n_episodes:
        eps = max(cfg.epsilon_end,
                  cfg.epsilon_start - max(0, episodes
                                          - cfg.pretrain_episodes)
                  * cfg.epsilon_step)
        fn = (driver._chunk_fill if episodes < cfg.pretrain_episodes
              else driver._chunk_train)
        ts, buf, rs, _ = fn(ts, buf, rs, eps, jax.random.fold_in(key, chunk))
        episodes = int(rs.episodes)   # replicated scalar: same on all hosts
        chunk += 1
    r_l, r_g, _ = driver._eval(ts, jax.random.PRNGKey(123), 16)
    return float(r_g), episodes


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "chunk"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    mesh = Mesh(jax.devices(), ("data",))

    # --- collective sanity: global iota summed with sharded input ---
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda: jnp.sum(jax.lax.with_sharding_constraint(
                jnp.arange(64, dtype=jnp.float32),
                NamedSharding(mesh, P("data")))))()
    assert float(out) == 64 * 63 / 2, float(out)

    if mode == "train":
        r_g, episodes = train_eval()
        print(f"WORKER{pid} OK evalg={r_g:.6f} episodes={episodes}",
              flush=True)
        return

    # --- one fully-jitted sharded training chunk ---
    env, alg, cfg, hooks, driver = build()
    rs, ts, buf = _sharded_init(driver, env, alg, cfg, hooks, mesh,
                                cfg.n_envs)
    ts2, buf2, rs2, metrics = driver._chunk_train(ts, buf, rs, 0.3,
                                                  jax.random.PRNGKey(1))
    jax.block_until_ready(ts2)
    loss = float(metrics["loss_Q_global"])
    eps = int(rs2.episodes)
    assert eps >= 0
    print(f"WORKER{pid} OK loss={loss:.6f} episodes={eps}", flush=True)


if __name__ == "__main__":
    main()
