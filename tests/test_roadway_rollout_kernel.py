"""Differential tests for the roadway SoA dynamics + fused rollout kernel.

Chain of evidence: grid-observation engine (tested vs the C++ golden
engine and carrying the reference citations) == SoA dynamics == Pallas
kernel (interpret mode on CPU).
"""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.core.config import RoadwayEnvConfig
from cm3_tpu.envs import roadway_soa as rs
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.ops import roadway_rollout as rr

CFG = RoadwayEnvConfig(depart_stdev=0.0)          # deterministic resets
CFG_STAGGER = RoadwayEnvConfig(depart_stdev=0.0,
                               depart_mean=(0.0, 1.0),
                               speed=(30.0, 25.0))


@pytest.mark.parametrize("cfg", [CFG, CFG_STAGGER], ids=["flat", "stagger"])
def test_soa_matches_engine(cfg):
    """Same action sequences => identical rewards/done, step by step."""
    env = Roadway(cfg)
    b, t = 64, 60
    key = jax.random.PRNGKey(0)
    actions = jax.random.randint(jax.random.PRNGKey(1), (t, b, 2), 0, 5)

    # engine path (vmapped, no auto-reset)
    est, _ = jax.vmap(lambda k: env.reset(k))(jax.random.split(key, b))

    def estep(st, a):
        a = jax.vmap(env.check_actions)(st, a)
        st, ts = jax.vmap(env.step)(st, a)
        return st, (ts.reward_local, ts.done)

    _, (erew, edone) = jax.lax.scan(estep, est, actions)

    # SoA path
    sst = rs.soa_init(cfg, (b,))

    def sstep(st, a):
        acts = tuple(a[:, i] for i in range(2))
        acts = rs.soa_check_actions(cfg, st, acts)
        st, rws, done = rs.soa_step(cfg, st, acts)
        return st, (jnp.stack(rws, axis=-1), done)

    _, (srew, sdone) = jax.lax.scan(sstep, sst, actions)

    np.testing.assert_allclose(np.asarray(erew), np.asarray(srew),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(edone), np.asarray(sdone))


def test_soa_init_matches_engine_reset():
    env = Roadway(CFG_STAGGER)
    est, _ = env.reset(jax.random.PRNGKey(3))
    s = rs.soa_init(CFG_STAGGER)
    # scalar SoA: fields are 0-d arrays
    for f, eng in [("x", est.x), ("sub", est.sublane), ("vel", est.vel),
                   ("steps", est.steps), ("rem", est.removed)]:
        got = np.stack([np.asarray(getattr(s, f)[i]) for i in range(2)])
        np.testing.assert_allclose(got, np.asarray(eng), atol=1e-6)


def test_kernel_matches_soa_scan():
    """Action-fed kernel (interpret) == XLA scan over the same SoA code
    with auto-reset: reward sums and episode counts match exactly."""
    cfg = CFG
    sub, t = 8, 80
    batch = sub * rr.LANES
    actions = jax.random.randint(jax.random.PRNGKey(7), (t, 2, batch), 0, 5)

    krew, kep = rr.rollout_actions(cfg, actions, sub=sub, interpret=True)

    s0 = rs.soa_init(cfg, (batch,))

    def body(carry, a):
        s, rew, ep = carry
        acts = rs.soa_check_actions(cfg, s, (a[0], a[1]))
        s, rws, done = rs.soa_step(cfg, s, acts)
        rew = rew + sum(rws)
        s = jax.tree_util.tree_map(lambda i, c: jnp.where(done, i, c), s0, s)
        return (s, rew, ep + done.astype(jnp.int32)), None

    (_, srew, sep), _ = jax.lax.scan(
        body, (s0, jnp.zeros(batch, jnp.float32),
               jnp.zeros(batch, jnp.int32)), actions)

    np.testing.assert_allclose(np.asarray(krew), np.asarray(srew), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(kep), np.asarray(sep))
    assert int(sep.sum()) > 0          # episodes actually completed


def test_episodes_terminate_and_reset():
    """Random play reaches terminals (goal/timeout/crash) and resets."""
    cfg = CFG
    b, t = 256, 200
    s0 = rs.soa_init(cfg, (b,))
    actions = jax.random.randint(jax.random.PRNGKey(11), (t, 2, b), 0, 5)

    def body(carry, a):
        s, ep = carry
        acts = rs.soa_check_actions(cfg, s, (a[0], a[1]))
        s, _, done = rs.soa_step(cfg, s, acts)
        s = jax.tree_util.tree_map(lambda i, c: jnp.where(done, i, c), s0, s)
        return (s, ep + done.astype(jnp.int32)), None

    (s, ep), _ = jax.lax.scan(body, (s0, jnp.zeros(b, jnp.int32)), actions)
    assert int(ep.sum()) > b // 2      # plenty of completed episodes
    assert not bool(jnp.any(jnp.stack(s.steps) > cfg.max_step))
