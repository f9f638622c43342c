"""Checkpointing and the two-stage curriculum graft.

The reference implements curriculum transfer with TF variable-scope
string surgery: a restore Saver that EXCLUDES variables whose scope path
contains ``stage-2`` / ``Policy_target`` / ``Q_credit_main`` /
``Q_credit_target`` (``train_offpolicy.py:155-169``), then
``list_initialize_credit_ops`` copying the non-stage-2 weights of
Q_global into Q_credit (``alg_credit.py:227-246``), then hard target
initialization (:198).

Here every stage-2-only branch lives under a module literally named
``stage2`` (see cm3_tpu/models/nets.py), so the same mechanics are pure
pytree operations:

  * ``graft_params(dst, src)``  — copy src values into every dst leaf
    whose path does NOT contain 'stage2' (structure subset by design);
  * ``stage2_init_cm3``         — the full curriculum restore: stage-1
    actor/Q_global -> stage-2 actor/Q_global, Q_global -> Q_credit,
    targets hard-set to mains.

Persistence uses orbax; unlike the reference (which never saves
optimizer or schedule state — no mid-run resume), full TrainStates
round-trip, so preempted runs resume exactly (SURVEY.md §5 checkpoint
bullet).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp


# --------------------------------------------------------------------- #
# pytree graft
# --------------------------------------------------------------------- #


def _flatten(tree) -> Dict[tuple, Any]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)

    def name(k):
        return getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))

    return {tuple(name(k) for k in path): leaf for path, leaf in flat}


def graft_params(dst, src, skip_token: str = "stage2"):
    """Return dst with every leaf whose path avoids ``skip_token``
    replaced by the same-path leaf of src.  Shapes must match — this IS
    the stage-compatibility contract (the reference's Saver would fail
    identically on mismatch)."""
    src_flat = _flatten(src)

    def visit(path, leaf):
        key = tuple(
            getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))
            for k in path)
        if any(p == skip_token for p in key):
            return leaf
        if key in src_flat:
            s = src_flat[key]
            if s.shape != leaf.shape:
                raise ValueError(
                    f"graft shape mismatch at {key}: {s.shape} vs "
                    f"{leaf.shape}")
            return s
        return leaf

    return jax.tree_util.tree_map_with_path(visit, dst)


def copy_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: None if x is None else jax.numpy.copy(x), tree)


def stage2_init_cm3(ts2, stage1_actor, stage1_qg):
    """Full CM3 curriculum restore (train_offpolicy.py:181-198):
      1. stage-1 actor -> stage-2 actor (non-stage2 leaves);
      2. stage-1 Q_global -> stage-2 Q_global;
      3. grafted Q_global -> Q_credit (non-stage2 leaves);
      4. all targets hard-initialized from mains
         (Policy_target/Q_credit_* were excluded from the reference
         restore and re-initialized the same way)."""
    actor = graft_params(ts2.actor, stage1_actor)
    qg = graft_params(ts2.qg, stage1_qg)
    qc = ts2.qc if ts2.qc is None else graft_params(ts2.qc, qg)
    return ts2.replace(
        actor=actor, actor_tgt=copy_tree(actor),
        qg=qg, qg_tgt=copy_tree(qg),
        qc=qc, qc_tgt=None if qc is None else copy_tree(qc))


def stage2_init_baseline(ts2, stage1_actor, stage1_v=None, stage1_q=None):
    """Curriculum restore for COMA/IAC: actor (and V when the stage-1 run
    trained one) transfer; the COMA critic is entirely stage-2 scoped in
    the reference (networks.py:91) so it stays fresh."""
    actor = graft_params(ts2.actor, stage1_actor)
    v = ts2.v
    if v is not None and stage1_v is not None:
        v = graft_params(v, stage1_v)
    return ts2.replace(
        actor=actor, actor_tgt=copy_tree(actor),
        v=v, v_tgt=None if v is None else copy_tree(v))


# --------------------------------------------------------------------- #
# orbax persistence
# --------------------------------------------------------------------- #


def save(path: str, state) -> None:
    """Save any pytree (TrainState, params subtree, ...) to ``path``."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str, like):
    """Restore a pytree saved by ``save``; ``like`` provides structure,
    shapes and dtypes."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)


def merge_non_opt(fresh, restored):
    """Graft every non-optimizer field of ``restored`` into ``fresh``
    (same TrainState class).  Used when a checkpoint's optimizer-state
    layout differs from the configured one (the flattened Adam chain's
    structure depends on AlgConfig.grad_clip): init-time restores —
    curriculum grafts, same-stage warm starts — only consume params and
    target nets, so the optimizer restarts fresh."""
    import dataclasses

    kw = {}
    for f in dataclasses.fields(fresh):
        src = fresh if (f.name == "opt" or f.name.startswith("opt_")) \
            else restored
        kw[f.name] = getattr(src, f.name)
    return type(fresh)(**kw)
