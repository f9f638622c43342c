"""PRNG folding discipline.

The reference seeds three global RNG streams per process
(``np.random.seed`` / ``random.seed`` / ``tf.set_random_seed`` at
``alg/train_offpolicy.py:39-41,173``).  The TPU-native equivalent is a
single root key folded deterministically by (host, env-instance, step,
purpose) so that any slice of a distributed run is reproducible in
isolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# stable purpose tags (never renumber — checkpoint reproducibility)
ROLLOUT = 0
RESET = 1
GOALS = 2
PARAMS = 3
SAMPLE = 4
EVAL = 5
ENV = 6


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)


def for_purpose(key: jax.Array, purpose: int) -> jax.Array:
    return jax.random.fold_in(key, purpose)


def for_step(key: jax.Array, purpose: int, step) -> jax.Array:
    return jax.random.fold_in(jax.random.fold_in(key, purpose), step)


def for_host(key: jax.Array, host_id: int) -> jax.Array:
    return jax.random.fold_in(key, host_id)


def split_batch(key: jax.Array, n: int) -> jax.Array:
    """n per-instance keys: fold by instance index (stable under resharding)."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))
