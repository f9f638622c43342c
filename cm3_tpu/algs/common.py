"""Shared algorithm utilities."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def soft_update(target, main, tau: float):
    """Polyak target update: t <- tau*m + (1-tau)*t
    (reference alg_credit.py:162-225)."""
    return jax.tree_util.tree_map(
        lambda t, m: tau * m + (1.0 - tau) * t, target, main)


def one_hot(x, n):
    return jax.nn.one_hot(x, n, dtype=jnp.float32)


def others_concat(x):
    """[B, N, D] -> [B, N, (N-1)*D]: row n is the concat of all m != n in
    index order (reference process_global_state / process_goals pattern,
    alg_credit.py:501-557).  Unrolled slices: N is tiny and static."""
    n = x.shape[1]
    if n == 1:
        return jnp.zeros(x.shape[:1] + (1, 0), x.dtype)
    cols = [jnp.concatenate([x[:, m] for m in range(n) if m != i], axis=-1)
            for i in range(n)]
    return jnp.stack(cols, axis=1)


def others_stack(x):
    """[B, N, ...] -> [B, N, N-1, ...]: per-agent view of the others' rows
    (reference process_actions interleave, alg_credit.py:406-443)."""
    n = x.shape[1]
    if n == 1:
        return jnp.zeros(x.shape[:1] + (1, 0) + x.shape[2:], x.dtype)
    rows = [jnp.stack([x[:, m] for m in range(n) if m != i], axis=1)
            for i in range(n)]
    return jnp.stack(rows, axis=1)


def epsilon_probs(probs, epsilon, n_actions):
    """(1-eps)*pi + eps/A (reference alg_credit.py:121)."""
    return (1.0 - epsilon) * probs + epsilon / float(n_actions)


def sample_actions(key, probs):
    """Categorical sample over the trailing action axis, any leading dims
    (reference tf.multinomial(tf.log(probs)) — alg_credit.py:122)."""
    return jax.random.categorical(key, jnp.log(probs + 1e-20), axis=-1)


def adam(lr: float, clip: float = 0.0) -> optax.GradientTransformation:
    """TF1 AdamOptimizer defaults (beta1=.9, beta2=.999, eps=1e-8).

    ``clip`` > 0 prepends global-norm gradient clipping — a documented
    DEVIATION from the reference (which never clips): off-policy
    stage-2 roadway training shows recurrent critic-divergence spikes
    (TD loss excursions to 1e3-1e4, PERF.md round-3 diagnosis) that
    clipping suppresses.  Default 0.0 = reference-exact.

    Wrapped in ``optax.flatten``: the update math is identical, but the
    moment/update elementwise ops run over ONE concatenated vector per
    network instead of per-leaf, collapsing ~2 fused kernels per leaf
    per tree into a handful — the tiny-model learner is kernel-launch
    bound, not FLOP bound (PERF.md single-seed analysis).

    Format notes: (a) flattening changes the optimizer-state pytree
    layout, so TrainState checkpoints saved before the flatten change
    (round 1) do not restore against the current template — all tracked
    evidence checkpoints postdate it; (b) ``flatten``'s ravel_pytree
    would silently promote dtypes on a mixed-precision param tree, so
    ``init`` asserts the tree is dtype-uniform."""
    core = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if clip and clip > 0.0:
        core = optax.chain(optax.clip_by_global_norm(clip), core)
    base = optax.flatten(core)

    def init(params):
        dtypes = {x.dtype for x in jax.tree_util.tree_leaves(params)}
        if len(dtypes) > 1:
            raise TypeError(
                f"optax.flatten requires a dtype-uniform param tree "
                f"(ravel_pytree would silently promote): got {dtypes}")
        return base.init(params)

    return optax.GradientTransformation(init, base.update)


def flatten_bn(x):
    """[B, N, ...] -> [B*N, ...] (explicit sizes: -1 breaks on 0-width)."""
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def tree_size(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
