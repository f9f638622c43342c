"""Differential tests for the particle SoA dynamics + fused rollout kernel.

Chain of evidence: Particle engine (parity-tested vs the reference MPE
physics) == SoA dynamics == Pallas kernel (interpret mode on CPU).
"""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.core.config import ParticleEnvConfig
from cm3_tpu.envs import particle_soa as ps
from cm3_tpu.envs.particle import Particle
from cm3_tpu.ops import particle_rollout as pr

CFG2 = ParticleEnvConfig(n_agents=2, agents_x=(-0.9, 0.9),
                         agents_y=(-0.9, 0.9), landmarks_x=(0.9, -0.9),
                         landmarks_y=(0.9, -0.9), prob_random=0.0,
                         initial_std=0.0)
CFG4 = ParticleEnvConfig(prob_random=0.0, initial_std=0.0)


@pytest.mark.parametrize("cfg", [CFG2, CFG4], ids=["n2", "n4"])
def test_soa_matches_engine(cfg):
    """Same action sequences => identical rewards/done, step by step."""
    env = Particle(cfg)
    n = cfg.n_agents
    b, t = 64, 40
    actions = jax.random.randint(jax.random.PRNGKey(1), (t, b, n), 0, 5)

    est, _ = jax.vmap(lambda k: env.reset(k))(
        jax.random.split(jax.random.PRNGKey(0), b))

    def estep(st, a):
        st, ts = jax.vmap(env.step)(st, a)
        return st, (ts.reward_local, ts.done)

    _, (erew, edone) = jax.lax.scan(estep, est, actions)

    sst = ps.soa_init(cfg, (b,))

    def sstep(st, a):
        st, rws, done = ps.soa_step(cfg, st, tuple(a[:, i]
                                                   for i in range(n)))
        return st, (jnp.stack(rws, axis=-1), done)

    _, (srew, sdone) = jax.lax.scan(sstep, sst, actions)

    np.testing.assert_allclose(np.asarray(erew), np.asarray(srew),
                               rtol=0, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(edone), np.asarray(sdone))


def test_kernel_matches_soa_scan():
    """Action-fed kernel (interpret) == XLA scan over the same SoA code
    with auto-reset."""
    cfg = CFG4
    n = cfg.n_agents
    sub, t = 8, 70
    batch = sub * pr.LANES
    actions = jax.random.randint(jax.random.PRNGKey(7), (t, n, batch), 0, 5)

    krew, kep = pr.rollout_actions(cfg, actions, sub=sub, interpret=True)

    s0 = ps.soa_init(cfg, (batch,))

    def body(carry, a):
        s, rew, ep = carry
        s, rws, done = ps.soa_step(cfg, s, tuple(a[i] for i in range(n)))
        rew = rew + sum(rws)
        s = jax.tree_util.tree_map(lambda i, c: jnp.where(done, i, c), s0, s)
        return (s, rew, ep + done.astype(jnp.int32)), None

    (_, srew, sep), _ = jax.lax.scan(
        body, (s0, jnp.zeros(batch, jnp.float32),
               jnp.zeros(batch, jnp.int32)), actions)

    np.testing.assert_allclose(np.asarray(krew), np.asarray(srew),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(kep), np.asarray(sep))
    assert int(sep.sum()) > 0


def test_episodes_cycle():
    """Episodes hit the step cap and reset; step counter stays bounded."""
    cfg = CFG2
    b, t = 128, 100
    s0 = ps.soa_init(cfg, (b,))
    actions = jax.random.randint(jax.random.PRNGKey(3), (t, 2, b), 0, 5)

    def body(carry, a):
        s, ep = carry
        s, _, done = ps.soa_step(cfg, s, (a[0], a[1]))
        s = jax.tree_util.tree_map(lambda i, c: jnp.where(done, i, c), s0, s)
        return (s, ep + done.astype(jnp.int32)), None

    (s, ep), _ = jax.lax.scan(body, (s0, jnp.zeros(b, jnp.int32)), actions)
    assert int(ep.sum()) >= b * (t // cfg.max_steps)
    assert not bool(jnp.any(s.steps[0] > cfg.max_steps))
