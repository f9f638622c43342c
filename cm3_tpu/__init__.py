"""cm3_tpu: a TPU-native multi-goal multi-agent RL framework.

A from-scratch JAX/XLA re-design of the capabilities of the CM3 reference
system (ICLR 2020, arXiv:1809.05188): three Markov games (Checkers,
cooperative-navigation particles, lane-change roadway), four algorithms
(CM3 with counterfactual Q-credit, COMA, IAC, QMIX), off-policy and
on-policy trainers, a two-stage curriculum, on-device replay, and
mesh-sharded multi-host scaling.

Design stance (TPU-first, not a port):
  * environments are pure functions over struct-of-array states,
    vectorized over thousands of instances with ``vmap`` under ``jit``;
  * the entire learning update (critic TD, counterfactual expansion,
    policy gradient, optimizer, soft target update) is ONE jitted program;
  * multi-chip scaling shards the env-instance/batch axis over a
    ``jax.sharding.Mesh`` — collectives are inserted by XLA.
"""

__version__ = "0.1.0"
