"""Multi-host bootstrap and per-host determinism.

The reference has NO distributed backend (share-nothing seed processes,
SURVEY.md §2.4).  The TPU-native equivalent: ``jax.distributed`` across
pod-slice hosts, a global mesh spanning all devices, and deterministic
per-host PRNG folding replacing per-process ``np.random.seed(seed+i)``
(``train_multiprocess.py:33``).

Under this model the existing drivers run UNCHANGED on a pod slice: every
host executes the same jitted program over globally-sharded arrays; env
shards live on local devices; gradient/metric reductions ride ICI via
XLA collectives.  Cross-slice DCN traffic is only checkpoint/log
aggregation (host 0 writes).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from cm3_tpu.core import prng


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap; no-ops for single-process runs.
    On TPU pods the arguments are auto-detected from the environment."""
    if num_processes is not None and num_processes <= 1:
        return
    if (coordinator_address is None and num_processes is None
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ
            and jax.process_count() == 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_key(seed: int) -> jax.Array:
    """Root key folded by process index — each host owns a deterministic
    stream; global arrays use the UNfolded key so all hosts agree."""
    return prng.for_host(prng.root_key(seed), jax.process_index())


def is_primary() -> bool:
    return jax.process_index() == 0


def global_device_count() -> int:
    return jax.device_count()


def local_device_count() -> int:
    return jax.local_device_count()
