"""QMIX: value decomposition with a monotonic hypernetwork mixer.

TPU-native re-design of the reference ``alg/alg_qmix.py`` /
``alg_qmix_checkers.py``: per-agent Q networks + a mixing network whose
weights are produced by hypernetworks conditioned on (global state, all
goals), abs() for monotonicity (``networks.py:640-685``).  Double-Q style
target: argmax actions from the TARGET agent nets, mixed by the TARGET
mixer (``alg_qmix.py:349-369``).  The single ``sess.run`` chain becomes
one fused jitted update; agent nets and mixer train jointly under one
Adam (the reference's ``mixer_op`` minimizes over all trainables,
``alg_qmix.py:186-192``).

Documented deviation: the reference Checkers variant feeds the MAIN
net's q-values into the TARGET mixer (``alg_qmix_checkers.py:106`` — a
latent bug flagged in SURVEY.md §2.1); we implement the intended
semantics (target q-values into the target mixer) for both variants by
default, with ``AlgConfig.qmix_ref_bug`` reproducing the reference's
exact wiring for paper-parity ablation runs (the fixed QMIX is
measurably stronger — PERF.md round 3).

Epsilon-greedy is per-agent action override OUTSIDE the network
(``alg_qmix.py:160-184``), not policy-probability mixing.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cm3_tpu.algs import common
from cm3_tpu.core.config import AlgConfig, NNConfig
from cm3_tpu.models import nets


@struct.dataclass
class QmixState:
    agent: Any
    agent_tgt: Any
    mixer: Any
    mixer_tgt: Any
    opt: Any
    step: jax.Array


class QMIX:

    def __init__(self, experiment: str, spec: Dict[str, int], alg: AlgConfig,
                 nn_cfg: NNConfig = NNConfig()):
        assert experiment in ("checkers", "particle", "roadway")
        self.experiment = experiment
        self.spec = spec
        self.cfg = alg
        self.n_agents = alg.n_agents
        self.n_actions = spec["l_action"]
        self.l_goal = spec["l_goal"]

        if experiment == "particle":
            self.agent_mod = nets.QmixSingleParticle(n_actions=self.n_actions)
        elif experiment == "roadway":
            self.agent_mod = nets.QmixSingleRoadway(n_actions=self.n_actions)
        else:
            self.agent_mod = nets.QmixSingleCheckers(
                n_actions=self.n_actions, conv_f=nn_cfg.A_conv_f,
                conv_k=tuple(nn_cfg.A_conv_k))
        if experiment == "checkers":
            self.mixer_mod = nets.QmixMixerCheckers(n_agents=self.n_agents)
        else:
            self.mixer_mod = nets.QmixMixer(n_agents=self.n_agents)

        self.opt = common.adam(alg.lr_Q, alg.grad_clip)

    # ------------------------------------------------------------------ #

    def _agent_qs(self, params, obs, goals, a_prev):
        """Per-agent action values, [B, N, A]."""
        b, n = goals.shape[0], goals.shape[1]
        f = common.flatten_bn
        if self.experiment == "particle":
            q = self.agent_mod.apply(params, f(obs["others"]),
                                     f(obs["self_v"]), f(goals))
        elif self.experiment == "roadway":
            q = self.agent_mod.apply(params, f(obs["self_t"]),
                                     f(obs["self_v"]), f(goals))
        else:
            a_prev_1h = common.one_hot(a_prev, self.n_actions)
            q = self.agent_mod.apply(params, f(a_prev_1h), f(obs["self_t"]),
                                     f(obs["self_v"]), f(obs["others"]),
                                     f(goals))
        return q.reshape(b, n, self.n_actions)

    def _mix(self, params, agent_q, state, goals):
        """Q_tot, [B]."""
        b, n = goals.shape[0], goals.shape[1]
        vec_flat = state["vec"].reshape(b, -1)
        goals_all = goals.reshape(b, -1)
        if self.experiment == "checkers":
            q_tot = self.mixer_mod.apply(params, agent_q, state["grid"],
                                         vec_flat, goals_all)
        else:
            q_tot = self.mixer_mod.apply(params, agent_q, vec_flat, goals_all)
        return q_tot[:, 0]

    def act(self, ts: QmixState, obs, goals, a_prev, epsilon, key,
            target: bool = False):
        """argmax with per-agent epsilon-random override, [B, N]."""
        params = ts.agent_tgt if target else ts.agent
        q = self._agent_qs(params, obs, goals, a_prev)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32)
        k1, k2 = jax.random.split(key)
        rand_a = jax.random.randint(k1, greedy.shape, 0, self.n_actions)
        explore = jax.random.uniform(k2, greedy.shape) < epsilon
        return jnp.where(explore, rand_a, greedy)

    # ------------------------------------------------------------------ #

    def init_state(self, key, example_obs, example_state, example_goals):
        with nets.init_scheme(self.cfg.init_scheme):
            return self._init_state(key, example_obs, example_state,
                                    example_goals)

    def _init_state(self, key, example_obs, example_state, example_goals):
        obs, state, goals = example_obs, example_state, example_goals
        b, n = goals.shape[0], goals.shape[1]
        a_prev = jnp.zeros((b, n), jnp.int32)
        k_a, k_m = jax.random.split(key)

        f = common.flatten_bn
        if self.experiment == "particle":
            agent = self.agent_mod.init(k_a, f(obs["others"]),
                                        f(obs["self_v"]), f(goals))
        elif self.experiment == "roadway":
            agent = self.agent_mod.init(k_a, f(obs["self_t"]),
                                        f(obs["self_v"]), f(goals))
        else:
            agent = self.agent_mod.init(
                k_a, f(common.one_hot(a_prev, self.n_actions)),
                f(obs["self_t"]), f(obs["self_v"]), f(obs["others"]),
                f(goals))

        agent_q = jnp.zeros((b, n))
        vec_flat = state["vec"].reshape(b, -1)
        goals_all = goals.reshape(b, -1)
        if self.experiment == "checkers":
            mixer = self.mixer_mod.init(k_m, agent_q, state["grid"], vec_flat,
                                        goals_all)
        else:
            mixer = self.mixer_mod.init(k_m, agent_q, vec_flat, goals_all)

        cp = jax.tree_util.tree_map(jnp.copy, (agent, mixer))
        return QmixState(
            agent=agent, agent_tgt=cp[0], mixer=mixer, mixer_tgt=cp[1],
            opt=self.opt.init((agent, mixer)), step=jnp.int32(0))

    # ------------------------------------------------------------------ #

    def update(self, ts: QmixState, batch: Dict[str, Any], epsilon, key,
               with_grads: bool = False):
        """One fused QMIX update (alg_qmix.py:338-378)."""
        del epsilon, key
        cfg = self.cfg
        a_dim = self.n_actions
        obs, obs_next = batch["obs"], batch["obs_next"]
        state, state_next = batch["state"], batch["state_next"]
        goals = batch["goals"]
        a_prev = batch.get("a_prev")
        # next-step prev-action for the checkers agent net is the CURRENT
        # action (mirrors the actor-target call pattern)
        a_prev_next = batch["a"] if a_prev is not None else None
        done_mult = 1.0 - batch["done"].astype(jnp.float32)

        # Double-Q target: argmax from target agent nets
        q_next_tgt = self._agent_qs(ts.agent_tgt, obs_next, goals,
                                    a_prev_next)
        a_star = jnp.argmax(q_next_tgt, axis=-1)
        if cfg.qmix_ref_bug:
            # reference-parity mode: alg_qmix_checkers.py:106 builds
            # Mixer_target on mixer_q_input — the MAIN agent nets' q
            # (here: main nets on obs', selected at the target argmax
            # a*, exactly the train_step feed at :355-374).  The agent-q
            # component of the TD target then tracks the main nets
            # instantly instead of the slow target copy — measurably
            # weaker (PERF.md round-3 QMIX finding); default off.
            q_next_main = self._agent_qs(ts.agent, obs_next, goals,
                                         a_prev_next)
            q_sel_tgt = jnp.take_along_axis(
                q_next_main, a_star[..., None], axis=-1)[..., 0]
        else:
            q_sel_tgt = jnp.take_along_axis(
                q_next_tgt, a_star[..., None], axis=-1)[..., 0]  # [B, N]
        q_sel_tgt = jax.lax.stop_gradient(q_sel_tgt)
        q_tot_tgt = self._mix(ts.mixer_tgt, q_sel_tgt, state_next, goals)
        r_total = jnp.sum(batch["rl"], axis=1)
        y = jax.lax.stop_gradient(
            r_total + cfg.gamma * q_tot_tgt * done_mult)

        a_1h = common.one_hot(batch["a"], a_dim)

        def loss_fn(params):
            agent, mixer = params
            q = self._agent_qs(agent, obs, goals, a_prev)
            q_sel = jnp.sum(q * a_1h, axis=-1)
            q_tot = self._mix(mixer, q_sel, state, goals)
            return jnp.mean(jnp.square(y - q_tot))

        loss, grads = jax.value_and_grad(loss_fn)((ts.agent, ts.mixer))
        upd, opt = self.opt.update(grads, ts.opt, (ts.agent, ts.mixer))
        agent_new, mixer_new = optax.apply_updates((ts.agent, ts.mixer), upd)

        tau = cfg.tau
        new_ts = QmixState(
            agent=agent_new,
            agent_tgt=common.soft_update(ts.agent_tgt, agent_new, tau),
            mixer=mixer_new,
            mixer_tgt=common.soft_update(ts.mixer_tgt, mixer_new, tau),
            opt=opt, step=ts.step + 1)
        metrics = {"loss_mixer": loss}
        if with_grads:
            metrics["grads"] = {"Agent": grads[0], "Mixer": grads[1]}
        return new_ts, metrics
