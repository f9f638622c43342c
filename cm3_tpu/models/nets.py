"""Network library.

Flax re-design of the reference graph builders (``alg/networks.py``).
Every "staged" net has a stage-1 branch plus an optional stage-2 branch
whose parameters live under a module named ``stage2`` — so the curriculum
mechanics that the reference implements with TF variable-scope string
surgery (``networks.py:494-504``, ``train_offpolicy.py:155-169``) become
pure pytree operations here (see ``cm3_tpu/train/checkpoint.py``).

Initialization: dense/conv kernels use Glorot-uniform (the TF1 default the
reference nets get, since only ``fc2/fc3`` scopes override it), while the
branch-combination matrices mirror ``networks.get_variable:78-81``
(truncated normal sigma=0.01).  Biases are zeros.

Init-scheme ablation (``init_scheme`` context, wired from
``AlgConfig.init_scheme``): layer-by-layer audit of the reference vs this
module —
  * ``tf.layers.dense``           -> glorot-uniform kernel, zero bias: MATCHES
  * ``tf.contrib.layers.conv2d``  -> xavier kernel, zero bias: MATCHES
  * ``get_variable(W_*)``         -> trunc-normal 0.01: MATCHES (Branch.W_h2)
  * ``tf.get_variable('b',[n])``  -> TF1 default glorot-uniform over a rank-1
    shape (limit sqrt(3/n)) — the ONE layer class where the default here
    (zeros) differs from TF1 (actor_checkers:571, actor_staged:506,
    actor_particle:533, Qmix_single_checkers:632).
Schemes: "ref" (default, as shipped rounds 1-3), "tf1" (exact TF1 parity —
the h2 combination bias ``b`` drawn glorot-uniform), "trunc001" (ALL
kernels truncated-normal sigma=0.01, the blanket perturbation from the
round-3 verdict's ordering-ablation plan).

All shapes stay in float32 params; callers may run the forward in bf16 via
``jax.default_matmul_precision`` — these nets are tiny (<=1e6 params), so
the MXU win comes from batching, not dtype.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

glorot = nn.initializers.xavier_uniform()
trunc001 = nn.initializers.truncated_normal(stddev=0.01)
zeros = nn.initializers.zeros_init()


def _glorot_rank1(key, shape, dtype=jnp.float32):
    """TF1 glorot_uniform on a rank-1 shape [n]: fan_in = fan_out = n,
    limit sqrt(6/(n+n)) = sqrt(3/n) (tf.get_variable default in TF1;
    flax's xavier_uniform requires rank>=2 so this is hand-rolled)."""
    import jax as _jax
    limit = (3.0 / shape[0]) ** 0.5
    return _jax.random.uniform(key, shape, dtype, -limit, limit)


_INIT_SCHEME = ["ref"]


class init_scheme:
    """Context manager selecting the parameter-init scheme during
    ``Module.init`` tracing (init-time only; ``apply`` never reads
    initializers).  See the module docstring for the audit table."""

    def __init__(self, name: str = "ref"):
        if name not in ("ref", "tf1", "trunc001"):
            raise ValueError(f"unknown init scheme {name!r}")
        self.name = name

    def __enter__(self):
        _INIT_SCHEME.append(self.name)

    def __exit__(self, *exc):
        _INIT_SCHEME.pop()


def _kinit(key, shape, dtype=jnp.float32):
    """Scheme-dispatched kernel initializer for layers that are
    glorot-uniform in the reference (dense/conv kernels, mixer
    hyper_b_1)."""
    if _INIT_SCHEME[-1] == "trunc001":
        return trunc001(key, shape, dtype)
    return glorot(key, shape, dtype)


def _binit(key, shape, dtype=jnp.float32):
    """Scheme-dispatched initializer for the h2 combination bias ``b``
    (reference ``tf.get_variable('b', [n_h2])``): zeros under "ref"/
    "trunc001", TF1's rank-1 glorot under "tf1"."""
    if _INIT_SCHEME[-1] == "tf1":
        return _glorot_rank1(key, shape, dtype)
    return zeros(key, shape, dtype)


def _dense(feats, name=None, use_bias=True):
    return nn.Dense(feats, kernel_init=_kinit, bias_init=zeros, name=name,
                    use_bias=use_bias)


def _conv(feats, kernel, name=None):
    return nn.Conv(feats, kernel_size=tuple(kernel), strides=(1, 1),
                   padding="SAME", kernel_init=_kinit, bias_init=zeros,
                   name=name)


class Branch(nn.Module):
    """dense->relu followed by a bias-free combination matmul into n_h2.

    Mirrors the reference's two-branch pattern (networks.py:103-122): the
    branch outputs are summed PRE-activation into h2.
    """

    n_h1: int
    n_h2: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_dense(self.n_h1, name="dense")(x))
        w = self.param("W_h2", trunc001, (self.n_h1, self.n_h2))
        return h @ w


class ConvBranch(nn.Module):
    """conv->relu->flatten->dense->relu->combination matmul
    (actor_staged stage-2 branch, networks.py:494-504)."""

    conv_f: int
    conv_k: Tuple[int, int]
    n_reduced: int
    n_h2: int

    @nn.compact
    def __call__(self, t):
        c = nn.relu(_conv(self.conv_f, self.conv_k, name="conv")(t))
        c = c.reshape(c.shape[:-3] + (-1,))
        h = nn.relu(_dense(self.n_reduced, name="reduce")(c))
        w = self.param("W_h2", trunc001, (self.n_reduced, self.n_h2))
        return h @ w


def _flat_conv(feats, kernel, name, t):
    c = nn.relu(_conv(feats, kernel, name=name)(t))
    return c.reshape(c.shape[:-3] + (-1,))


# --------------------------------------------------------------------- #
# Actors
# --------------------------------------------------------------------- #


class ActorParticle(nn.Module):
    """networks.actor_particle:517-538."""

    n_actions: int = 5
    n_h1_self: int = 64
    n_h1_others: int = 64
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, obs_others, v_obs, goal):
        x = jnp.concatenate([v_obs, goal], axis=-1)
        h2 = Branch(self.n_h1_self, self.n_h2, name="self_branch")(x)
        if self.stage > 1:
            h2 = h2 + Branch(self.n_h1_others, self.n_h2,
                             name="stage2")(obs_others)
        b = self.param("b", _binit, (self.n_h2,))
        h2 = nn.relu(h2 + b)
        logits = _dense(self.n_actions, name="out")(h2)
        return nn.softmax(logits)


class ActorRoadway(nn.Module):
    """networks.actor_staged:473-514 (SUMO actor; CNN branch at stage 2)."""

    n_actions: int = 5
    n_conv_reduced: int = 64
    n_h1: int = 32
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, t_obs, v_obs, goal):
        b1 = nn.relu(_dense(self.n_h1, name="branch1")(v_obs))
        b2 = nn.relu(_dense(self.n_h1, name="branch2")(goal))
        cat = jnp.concatenate([b1, b2], axis=-1)
        w = self.param("W_concated_h2", trunc001, (2 * self.n_h1, self.n_h2))
        h2 = cat @ w
        if self.stage > 1:
            h2 = h2 + ConvBranch((4), (5, 3), self.n_conv_reduced, self.n_h2,
                                 name="stage2")(t_obs)
        b = self.param("b", _binit, (self.n_h2,))
        h2 = nn.relu(h2 + b)
        logits = _dense(self.n_actions, name="out")(h2)
        return nn.softmax(logits)


class ActorCheckers(nn.Module):
    """networks.actor_checkers:549-578."""

    n_actions: int = 5
    conv_f: int = 3
    conv_k: Tuple[int, int] = (3, 3)
    n_h1: int = 64
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, a_prev, t_obs_self, v_obs_self, obs_others, goal):
        conv = _flat_conv(self.conv_f, self.conv_k, "conv", t_obs_self)
        conv_lin = nn.relu(_dense(32, name="conv_linear")(conv))
        x = jnp.concatenate([conv_lin, v_obs_self, a_prev, goal], axis=-1)
        h2 = Branch(self.n_h1, self.n_h2, name="self_branch")(x)
        if self.stage > 1:
            h2 = h2 + Branch(self.n_h1, self.n_h2, name="stage2")(obs_others)
        b = self.param("b", _binit, (self.n_h2,))
        h2 = nn.relu(h2 + b)
        logits = _dense(self.n_actions, name="out")(h2)
        return nn.softmax(logits)


# --------------------------------------------------------------------- #
# CM3 critics: Q_global(s, a_all) and Q_credit(s, a^m)
# --------------------------------------------------------------------- #


class QGlobalParticle(nn.Module):
    """networks.Q_global_1output:97-122."""

    n_h1_1: int = 64
    n_h1_2: int = 128
    n_h2: int = 64
    n_actions: int = 5
    stage: int = 1

    @nn.compact
    def __call__(self, s_n, g_n, a_n, s_others, a_others):
        x = jnp.concatenate([s_n, g_n, a_n], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            a_flat = a_others.reshape(a_others.shape[:-2] + (-1,))
            x2 = jnp.concatenate([s_others, a_flat], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out", use_bias=False)(h2)


class QCreditParticle(nn.Module):
    """networks.Q_credit:186-211; stage-1 subset matches QGlobalParticle so
    stage-1 weights transfer (the graft at alg_credit.py:227-246)."""

    n_h1_1: int = 64
    n_h1_2: int = 128
    n_h2: int = 64
    stage: int = 2

    @nn.compact
    def __call__(self, s_n, g_n, a_m, s_m, s_others):
        x = jnp.concatenate([s_n, g_n, a_m], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            x2 = jnp.concatenate([s_m, s_others], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out", use_bias=False)(h2)


class QGlobalRoadway(nn.Module):
    """networks.Q_global_sumo:125-152 (bias on output)."""

    n_h1_1: int = 256
    n_h1_2: int = 128
    n_h2: int = 256
    stage: int = 1

    @nn.compact
    def __call__(self, s_n, g_n, a_n, s_others, a_others, g_others):
        del g_others  # present in reference signature, unused (":144 Original")
        x = jnp.concatenate([s_n, g_n, a_n], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            a_flat = a_others.reshape(a_others.shape[:-2] + (-1,))
            x2 = jnp.concatenate([s_others, a_flat], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out")(h2)


class QCreditRoadway(nn.Module):
    """networks.Q_credit_sumo:214-241."""

    n_h1_1: int = 256
    n_h1_2: int = 128
    n_h2: int = 256
    stage: int = 2

    @nn.compact
    def __call__(self, s_n, g_n, a_m, s_m, s_others, g_others):
        del g_others
        x = jnp.concatenate([s_n, g_n, a_m], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            x2 = jnp.concatenate([s_m, s_others], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out")(h2)


class QGlobalCheckers(nn.Module):
    """networks.Q_global_checkers:155-183."""

    conv_f1: int = 4
    conv_k1: Tuple[int, int] = (3, 5)
    conv_f2: int = 6
    conv_k2: Tuple[int, int] = (3, 3)
    n_h1_1: int = 128
    n_h1_2: int = 32
    n_h2: int = 32
    stage: int = 1

    @nn.compact
    def __call__(self, s_grid, s_n, g_n, a_n, s_others, a_others, t_obs, v_obs):
        conv = _flat_conv(self.conv_f1, self.conv_k1, "conv", s_grid)
        conv_o = _flat_conv(self.conv_f2, self.conv_k2, "conv_o", t_obs)
        x = jnp.concatenate([conv, s_n, g_n, a_n, conv_o, v_obs], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            a_flat = a_others.reshape(a_others.shape[:-2] + (-1,))
            x2 = jnp.concatenate([s_others, a_flat], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out")(h2)


class QCreditCheckers(nn.Module):
    """networks.Q_credit_checkers:244-272."""

    conv_f1: int = 4
    conv_k1: Tuple[int, int] = (3, 5)
    conv_f2: int = 6
    conv_k2: Tuple[int, int] = (3, 3)
    n_h1_1: int = 128
    n_h1_2: int = 32
    n_h2: int = 32
    stage: int = 2

    @nn.compact
    def __call__(self, s_grid, s_n, g_n, a_m, s_m, s_others, t_obs, v_obs):
        conv = _flat_conv(self.conv_f1, self.conv_k1, "conv", s_grid)
        conv_o = _flat_conv(self.conv_f2, self.conv_k2, "conv_o", t_obs)
        x = jnp.concatenate([conv, s_n, g_n, a_m, conv_o, v_obs], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            x2 = jnp.concatenate([s_m, s_others], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out")(h2)


# --------------------------------------------------------------------- #
# V baselines (IAC local critics, global V, CM3 ablation)
# --------------------------------------------------------------------- #


class FC3(nn.Module):
    """networks.fc3:20-36 — its scope sets trunc-normal init for ALL layers."""

    n_h1: int = 64
    n_h2: int = 64
    n_out: int = 1

    @nn.compact
    def __call__(self, x):
        d = lambda f, n: nn.Dense(f, kernel_init=trunc001, bias_init=zeros,
                                  name=n)
        h1 = nn.relu(d(self.n_h1, "h1")(x))
        h2 = nn.relu(d(self.n_h2, "h2")(h1))
        return d(self.n_out, "out")(h2)


class VParticleLocal(nn.Module):
    """networks.V_particle_local:356-374 (IAC critic)."""

    n_h1_1: int = 64
    n_h1_2: int = 64
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, v_obs_others, v_obs, goal):
        x = jnp.concatenate([v_obs, goal], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="self_branch")(x)
        if self.stage > 1:
            h2 = h2 + Branch(self.n_h1_2, self.n_h2,
                             name="stage2")(v_obs_others)
        h2 = nn.relu(h2)
        return _dense(1, name="out", use_bias=False)(h2)


class VParticleGlobal(nn.Module):
    """networks.V_particle_global:377-402."""

    n_h1_1: int = 64
    n_h1_2: int = 64
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, s_n, g_n, s_others, g_others):
        x = jnp.concatenate([s_n, g_n], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            x2 = jnp.concatenate([s_others, g_others], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out", use_bias=False)(h2)


class VParticleAblation(nn.Module):
    """networks.V_particle_ablation:405-412 (everything under stage-2)."""

    n_h1: int = 64
    n_h2: int = 64

    @nn.compact
    def __call__(self, s_n, g_n, s_others):
        x = jnp.concatenate([s_n, g_n, s_others], axis=-1)

        class _Inner(nn.Module):
            n_h1: int
            n_h2: int

            @nn.compact
            def __call__(self, x):
                h1 = nn.relu(_dense(self.n_h1, name="V_h1")(x))
                h2 = nn.relu(_dense(self.n_h2, name="V_h2")(h1))
                return _dense(1, name="V_out", use_bias=False)(h2)

        return _Inner(self.n_h1, self.n_h2, name="stage2")(x)


class VRoadwayLocal(nn.Module):
    """networks.V_sumo_local:309-330 (IAC critic; conv branch at stage 2)."""

    n_h1_1: int = 64
    n_conv_reduced: int = 64
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, t_obs, v_obs, goal):
        x = jnp.concatenate([v_obs, goal], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="self_branch")(x)
        if self.stage > 1:
            h2 = h2 + ConvBranch(4, (5, 3), self.n_conv_reduced, self.n_h2,
                                 name="stage2")(t_obs)
        h2 = nn.relu(h2)
        return _dense(1, name="out", use_bias=False)(h2)


class VRoadwayGlobal(nn.Module):
    """networks.V_sumo_global:333-353."""

    n_h1_1: int = 64
    n_h1_2: int = 64
    n_h2: int = 64
    stage: int = 1

    @nn.compact
    def __call__(self, s_n, g_n, s_others, g_others):
        x = jnp.concatenate([s_n, g_n], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            x2 = jnp.concatenate([s_others, g_others], axis=-1)
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(x2)
        h2 = nn.relu(h2)
        return _dense(1, name="out", use_bias=False)(h2)


class VCheckersLocal(nn.Module):
    """networks.V_checkers_local:415-435."""

    conv_f: int = 6
    conv_k: Tuple[int, int] = (3, 3)
    n_h1_1: int = 256
    n_h1_2: int = 32
    n_h2: int = 256
    stage: int = 1

    @nn.compact
    def __call__(self, t_obs_self, v_obs_self, v_obs_others, goal):
        conv = _flat_conv(self.conv_f, self.conv_k, "conv", t_obs_self)
        x = jnp.concatenate([conv, v_obs_self, goal], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="self_branch")(x)
        if self.stage > 1:
            h2 = h2 + Branch(self.n_h1_2, self.n_h2,
                             name="stage2")(v_obs_others)
        h2 = nn.relu(h2)
        return _dense(1, name="out")(h2)


class VCheckersGlobal(nn.Module):
    """networks.V_checkers_global:438-458."""

    conv_f: int = 2
    conv_k: Tuple[int, int] = (3, 5)
    n_h1_1: int = 128
    n_h1_2: int = 32
    n_h2: int = 32
    stage: int = 1

    @nn.compact
    def __call__(self, s_grid, s_n, g_n, s_others):
        conv = _flat_conv(self.conv_f, self.conv_k, "conv", s_grid)
        x = jnp.concatenate([conv, s_n, g_n], axis=-1)
        h2 = Branch(self.n_h1_1, self.n_h2, name="branch1")(x)
        if self.stage > 1:
            h2 = h2 + Branch(self.n_h1_2, self.n_h2, name="stage2")(s_others)
        h2 = nn.relu(h2)
        return _dense(1, name="out")(h2)


class VCheckersAblation(nn.Module):
    """networks.V_checkers_ablation:461-470."""

    conv_f: int = 4
    conv_k: Tuple[int, int] = (3, 5)
    n_h1: int = 128
    n_h2: int = 32

    @nn.compact
    def __call__(self, s_grid, s_n, g_n, s_others):
        class _Inner(nn.Module):
            conv_f: int
            conv_k: Tuple[int, int]
            n_h1: int
            n_h2: int

            @nn.compact
            def __call__(self, s_grid, s_n, g_n, s_others):
                conv = _flat_conv(self.conv_f, self.conv_k, "conv", s_grid)
                x = jnp.concatenate([conv, s_n, g_n, s_others], axis=-1)
                h1 = nn.relu(_dense(self.n_h1, name="V_h1")(x))
                h2 = nn.relu(_dense(self.n_h2, name="V_h2")(h1))
                return _dense(1, name="V_out", use_bias=False)(h2)

        return _Inner(self.conv_f, self.conv_k, self.n_h1, self.n_h2,
                      name="stage2")(s_grid, s_n, g_n, s_others)


# --------------------------------------------------------------------- #
# COMA critics (l_action outputs)
# --------------------------------------------------------------------- #


class QComa(nn.Module):
    """networks.Q_global:84-94 — COMA critic for particle/roadway; entirely
    under ``stage-2`` in the reference, i.e. fresh at stage 2."""

    n_actions: int = 5
    units: int = 256

    @nn.compact
    def __call__(self, v_state, a_others, g_n, g_others, labels, v_obs):
        a_flat = a_others.reshape(a_others.shape[:-2] + (-1,))
        x = jnp.concatenate([v_state, a_flat, g_n, g_others, labels, v_obs],
                            axis=-1)
        return FC3(self.units, self.units, self.n_actions, name="stage2")(x)


class QComaCheckers(nn.Module):
    """networks.Q_coma_checkers:293-306."""

    n_actions: int = 5
    units: int = 256
    conv_f1: int = 4
    conv_k1: Tuple[int, int] = (3, 5)
    conv_f2: int = 6
    conv_k2: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, s_grid, s_agents, a_others, g_n, g_others, labels,
                 t_obs, v_obs):
        conv_s = _flat_conv(self.conv_f1, self.conv_k1, "conv_s", s_grid)
        conv_o = _flat_conv(self.conv_f2, self.conv_k2, "conv_o", t_obs)
        a_flat = a_others.reshape(a_others.shape[:-2] + (-1,))
        x = jnp.concatenate(
            [conv_s, s_agents, a_flat, g_n, g_others, labels, conv_o, v_obs],
            axis=-1)
        return FC3(self.units, self.units, self.n_actions, name="stage2")(x)


# --------------------------------------------------------------------- #
# QMIX
# --------------------------------------------------------------------- #


class QmixSingleParticle(nn.Module):
    """networks.Qmix_single_particle:581-594."""

    n_actions: int = 5

    @nn.compact
    def __call__(self, o_others, o_self, goal):
        x = jnp.concatenate([o_others, o_self, goal], axis=-1)
        h = nn.relu(_dense(64, name="h")(x))
        h = nn.relu(_dense(64, name="h2")(h))
        return _dense(self.n_actions, name="out")(h)


class QmixSingleRoadway(nn.Module):
    """networks.Qmix_single_sumo:597-614 (both branches always active)."""

    n_actions: int = 5
    n_h1: int = 64
    n_conv_reduced: int = 64
    n_h2: int = 64

    @nn.compact
    def __call__(self, o_others, o_self, goal):
        x = jnp.concatenate([o_self, goal], axis=-1)
        h2 = Branch(self.n_h1, self.n_h2, name="self_branch")(x)
        h2 = h2 + ConvBranch(4, (5, 3), self.n_conv_reduced, self.n_h2,
                             name="conv_branch")(o_others)
        h2 = nn.relu(h2)
        return _dense(self.n_actions, name="out")(h2)


class QmixSingleCheckers(nn.Module):
    """networks.Qmix_single_checkers:617-637."""

    n_actions: int = 5
    conv_f: int = 3
    conv_k: Tuple[int, int] = (3, 3)
    n_h1: int = 64
    n_h2: int = 64

    @nn.compact
    def __call__(self, a_prev, t_obs_self, v_obs_self, v_obs_others, goal):
        conv = _flat_conv(self.conv_f, self.conv_k, "conv", t_obs_self)
        conv_lin = nn.relu(_dense(32, name="conv_linear")(conv))
        x = jnp.concatenate([conv_lin, v_obs_self, a_prev, goal], axis=-1)
        h2 = Branch(self.n_h1, self.n_h2, name="self_branch")(x)
        h2 = h2 + Branch(self.n_h1, self.n_h2, name="others_branch")(v_obs_others)
        b = self.param("b", _binit, (self.n_h2,))
        h2 = nn.relu(h2 + b)
        return _dense(self.n_actions, name="out")(h2)


class QmixMixer(nn.Module):
    """networks.Qmix_mixer:640-685 — monotonic hypernetwork mixer
    conditioned on (state, all goals); abs() weights, ELU hidden."""

    n_agents: int = 2
    embed_dim: int = 64

    @nn.compact
    def __call__(self, agent_qs, state, goals_all):
        sg = jnp.concatenate([state, goals_all], axis=-1)
        d = sg.shape[-1]
        w1 = jnp.abs(sg @ self.param(
            "hyper_w_1", trunc001, (d, self.embed_dim * self.n_agents)))
        b1 = sg @ self.param("hyper_b_1", _kinit, (d, self.embed_dim))
        w1 = w1.reshape(-1, self.n_agents, self.embed_dim)
        hidden = nn.elu(
            jnp.einsum("bn,bne->be", agent_qs, w1) + b1)
        w_final = jnp.abs(sg @ self.param(
            "hyper_w_final", trunc001, (d, self.embed_dim)))
        b_final = _dense(1, name="hyper_b_final", use_bias=False)(
            nn.relu(_dense(self.embed_dim, name="hyper_b_final_l1",
                           use_bias=False)(sg)))
        q_tot = jnp.sum(hidden * w_final, axis=-1, keepdims=True) + b_final
        return q_tot


class QmixMixerCheckers(nn.Module):
    """networks.Qmix_mixer_checkers:688-734 (conv state branch, embed 128)."""

    n_agents: int = 2
    embed_dim: int = 128
    conv_f: int = 4
    conv_k: Tuple[int, int] = (3, 5)

    @nn.compact
    def __call__(self, agent_qs, state_env, state, goals_all):
        conv = _flat_conv(self.conv_f, self.conv_k, "conv", state_env)
        sg = jnp.concatenate([conv, state, goals_all], axis=-1)
        d = sg.shape[-1]
        w1 = jnp.abs(sg @ self.param(
            "hyper_w_1", trunc001, (d, self.embed_dim * self.n_agents)))
        b1 = sg @ self.param("hyper_b_1", _kinit, (d, self.embed_dim))
        w1 = w1.reshape(-1, self.n_agents, self.embed_dim)
        hidden = nn.elu(jnp.einsum("bn,bne->be", agent_qs, w1) + b1)
        w_final = jnp.abs(sg @ self.param(
            "hyper_w_final", trunc001, (d, self.embed_dim)))
        b_final = _dense(1, name="hyper_b_final", use_bias=False)(
            nn.relu(_dense(self.embed_dim, name="hyper_b_final_l1",
                           use_bias=False)(sg)))
        q_tot = jnp.sum(hidden * w_final, axis=-1, keepdims=True) + b_final
        return q_tot
