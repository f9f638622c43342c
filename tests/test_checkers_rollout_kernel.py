"""Pallas fused-rollout kernel equivalence tests (interpret mode on CPU):
the kernel must produce the same rewards/episode counts as the pure-JAX
packed scan for identical action sequences."""

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.kernel]


import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core.config import CheckersEnvConfig
from cm3_tpu.envs import checkers_packed as cp
from cm3_tpu.ops import checkers_rollout as cr

CFG = CheckersEnvConfig(n_agents=2, agents_r=(0, 2), agents_c=(8, 8),
                        max_steps=50)


def _scan_reference(spec, actions):
    T, N, B = actions.shape
    s = cp.packed_init(spec, (B,))

    def body(carry, a):
        s, rew, ep = carry
        s, rs, d = cp.packed_step(spec, s, tuple(a[i] for i in range(N)))
        return (s, rew + sum(rs), ep + d.astype(jnp.int32)), ()

    (s, rew, ep), _ = jax.lax.scan(
        body, (s, jnp.zeros(B), jnp.zeros(B, jnp.int32)), actions)
    return rew, ep


def test_kernel_matches_packed_scan():
    spec = cp.make_spec(CFG, (True, False))
    rng = np.random.default_rng(0)
    actions = jnp.asarray(rng.integers(0, 5, size=(120, 2, 2048)),
                          jnp.int32)
    rew_ref, ep_ref = _scan_reference(spec, actions)
    rew_k, ep_k = cr.rollout_actions(spec, actions, sub=8, interpret=True)
    np.testing.assert_allclose(np.asarray(rew_k), np.asarray(rew_ref),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ep_k), np.asarray(ep_ref))


def test_kernel_prng_variant():
    """PRNG variant: correct shapes, sane reward support, episodes roll
    over every <= max_steps.  TPU-only: the hardware PRNG primitives have
    no CPU interpreter lowering; bench.py exercises this on the chip."""
    import pytest
    if jax.default_backend() != "tpu":
        pytest.skip("hardware PRNG needs a TPU")
    spec = cp.make_spec(CFG, (True, False))
    rew, ep = cr.rollout_prng(spec, batch=2048, n_steps=120, seed=7,
                              sub=8)
    assert rew.shape == (2048,) and ep.shape == (2048,)
    ep = np.asarray(ep)
    assert (ep >= 2).all()          # 120 steps, cap 50 -> >= 2 episodes
    assert np.asarray(rew).std() > 0.0
