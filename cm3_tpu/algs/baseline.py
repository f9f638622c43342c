"""COMA / IAC / blended baselines.

TPU-native re-design of the reference ``alg/alg_baseline.py`` /
``alg_baseline_checkers.py`` — one class covering:
  * COMA  (use_Q=1, use_V=0): centralized critic Q(s, a^{-n}, g^n,
    g^{-n}, label_n, o^n) with l_action outputs; counterfactual advantage
    COMA = Q[a_n] - sum_a pi(a) Q[a] (:284-294);
  * IAC   (use_V=1, IAC=True): per-agent local critic V(o^n, g^n); TD
    error advantage per agent row (:302-305);
  * central-V (use_V=1, IAC=False): V(s, g^n) critic; policy loss couples
    the SUMS over agents of log-probs and TD errors (:296-301);
  * blended (use_Q and use_V): alpha*local + (1-alpha)*global (:307-312).

Semantics notes preserved from the reference train_step (:507-655):
  * Q TD target uses the GLOBAL reward (:582), V TD target the local one;
  * Q_res for the COMA advantage is the POST-update critic, the V-based
    advantage uses PRE-update V values (V_res/V_next_res fetched in the
    same runs as the optimizer);
  * all advantage inputs were placeholders -> stop_gradient here.
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
class BaselineState:
    actor: Any
    actor_tgt: Any
    v: Any
    v_tgt: Any
    q: Any
    q_tgt: Any
    opt_actor: Any
    opt_v: Any
    opt_q: Any
    step: jax.Array


class Baseline:
    """experiment in {'checkers','particle','roadway'}; flags in AlgConfig:
    use_Q (COMA), use_V, IAC, alpha."""

    def __init__(self, experiment: str, spec: Dict[str, int], alg: AlgConfig,
                 nn_cfg: NNConfig = NNConfig()):
        assert experiment in ("checkers", "particle", "roadway")
        self.experiment = experiment
        self.spec = spec
        self.cfg = alg
        self.n_agents = alg.n_agents
        self.n_actions = spec["l_action"]
        self.l_goal = spec["l_goal"]
        self.use_q = alg.n_agents > 1 and alg.use_Q
        self.use_v = alg.use_V
        self.iac = alg.IAC
        st = alg.stage

        if experiment == "particle":
            self.actor_mod = nets.ActorParticle(
                n_actions=self.n_actions, n_h1_others=nn_cfg.Actor_n_others,
                n_h2=nn_cfg.Actor_n_h2, stage=st)
            self.v_mod = (nets.VParticleLocal(n_h1_2=nn_cfg.V_n_others,
                                              n_h2=nn_cfg.V_n_h2, stage=st)
                          if alg.IAC else
                          nets.VParticleGlobal(n_h1_2=nn_cfg.V_n_others,
                                               n_h2=nn_cfg.V_n_h2, stage=st))
            self.q_mod = nets.QComa(n_actions=self.n_actions,
                                    units=nn_cfg.Q_units)
        elif experiment == "roadway":
            self.actor_mod = nets.ActorRoadway(n_actions=self.n_actions,
                                               stage=st)
            self.v_mod = (nets.VRoadwayLocal(
                n_conv_reduced=nn_cfg.V_n_others, n_h2=nn_cfg.V_n_h2,
                stage=st) if alg.IAC else
                nets.VRoadwayGlobal(n_h1_2=nn_cfg.V_n_others,
                                    n_h2=nn_cfg.V_n_h2, stage=st))
            self.q_mod = nets.QComa(n_actions=self.n_actions,
                                    units=nn_cfg.Q_units)
        else:
            self.actor_mod = nets.ActorCheckers(
                n_actions=self.n_actions, conv_f=nn_cfg.A_conv_f,
                conv_k=tuple(nn_cfg.A_conv_k), n_h1=nn_cfg.A_n_h1,
                n_h2=nn_cfg.A_n_h2, stage=st)
            self.v_mod = (nets.VCheckersLocal(
                conv_f=nn_cfg.V_conv_f, conv_k=tuple(nn_cfg.V_conv_k),
                n_h1_1=nn_cfg.V_n_h1_1, n_h1_2=nn_cfg.V_n_h1_2,
                n_h2=nn_cfg.V_n_h2, stage=st) if alg.IAC else
                nets.VCheckersGlobal(stage=st))
            self.q_mod = nets.QComaCheckers(n_actions=self.n_actions,
                                            units=nn_cfg.Q_units)

        self.opt_actor = common.adam(alg.lr_actor, alg.grad_clip)
        self.opt_v_tx = common.adam(alg.lr_V, alg.grad_clip)
        self.opt_q_tx = common.adam(alg.lr_Q, alg.grad_clip)

    # ------------------------------------------------------------------ #

    def actor_probs(self, params, obs, goals, a_prev, epsilon):
        b, n = goals.shape[0], goals.shape[1]
        f = common.flatten_bn
        if self.experiment == "particle":
            probs = self.actor_mod.apply(params, f(obs["others"]),
                                         f(obs["self_v"]), f(goals))
        elif self.experiment == "roadway":
            probs = self.actor_mod.apply(params, f(obs["self_t"]),
                                         f(obs["self_v"]), f(goals))
        else:
            a_prev_1h = common.one_hot(a_prev, self.n_actions)
            probs = self.actor_mod.apply(params, f(a_prev_1h),
                                         f(obs["self_t"]), f(obs["self_v"]),
                                         f(obs["others"]), f(goals))
        probs = probs.reshape(b, n, self.n_actions)
        return common.epsilon_probs(probs, epsilon, self.n_actions)

    def act(self, ts, obs, goals, a_prev, epsilon, key, target: bool = False):
        params = ts.actor_tgt if target else ts.actor
        probs = self.actor_probs(params, obs, goals, a_prev, epsilon)
        return common.sample_actions(key, probs)

    def _v_forward(self, params, state, obs, goals):
        """V per agent, [B, N] (local or global variant)."""
        b, n = goals.shape[0], goals.shape[1]
        f = common.flatten_bn
        vec = state["vec"]
        if self.iac:
            if self.experiment == "particle":
                v = self.v_mod.apply(params, f(obs["others"]),
                                     f(obs["self_v"]), f(goals))
            elif self.experiment == "roadway":
                v = self.v_mod.apply(params, f(obs["self_t"]),
                                     f(obs["self_v"]), f(goals))
            else:
                v = self.v_mod.apply(params, f(obs["self_t"]),
                                     f(obs["self_v"]), f(obs["others"]),
                                     f(goals))
        else:
            s_others = common.others_concat(vec)
            g_others = common.others_concat(goals)
            if self.experiment == "checkers":
                grid = jnp.broadcast_to(state["grid"][:, None],
                                        (b, n) + state["grid"].shape[1:])
                v = self.v_mod.apply(params, f(grid), f(vec), f(goals),
                                     f(s_others))
            else:
                v = self.v_mod.apply(params, f(vec), f(goals), f(s_others),
                                     f(g_others))
        return v.reshape(b, n)

    def _q_forward(self, params, state, obs, goals, a_others):
        """COMA critic, all-action outputs [B, N, A]."""
        b, n = goals.shape[0], goals.shape[1]
        f = common.flatten_bn
        vec = state["vec"]
        state_all = jnp.broadcast_to(vec.reshape(b, 1, -1),
                                     (b, n, vec.shape[1] * vec.shape[2]))
        g_others = common.others_concat(goals)
        labels = jnp.broadcast_to(jnp.eye(n)[None], (b, n, n))
        if self.experiment == "checkers":
            grid = jnp.broadcast_to(state["grid"][:, None],
                                    (b, n) + state["grid"].shape[1:])
            q = self.q_mod.apply(params, f(grid), f(state_all), f(a_others),
                                 f(goals), f(g_others), f(labels),
                                 f(obs["self_t"]), f(obs["self_v"]))
        else:
            v_obs = obs["self_v"]
            q = self.q_mod.apply(params, f(state_all), f(a_others), f(goals),
                                 f(g_others), f(labels), f(v_obs))
        return q.reshape(b, n, self.n_actions)

    # ------------------------------------------------------------------ #

    def init_state(self, key, example_obs, example_state, example_goals):
        with nets.init_scheme(self.cfg.init_scheme):
            return self._init_state(key, example_obs, example_state,
                                    example_goals)

    def _init_state(self, key, example_obs, example_state, example_goals):
        obs, state, goals = example_obs, example_state, example_goals
        b, n = goals.shape[0], goals.shape[1]
        k_a, k_v, k_q = jax.random.split(key, 3)

        def ia(k):
            f = common.flatten_bn
            if self.experiment == "particle":
                return self.actor_mod.init(k, f(obs["others"]),
                                           f(obs["self_v"]), f(goals))
            if self.experiment == "roadway":
                return self.actor_mod.init(k, f(obs["self_t"]),
                                           f(obs["self_v"]), f(goals))
            a0 = common.one_hot(jnp.zeros((b, n), jnp.int32), self.n_actions)
            return self.actor_mod.init(k, f(a0), f(obs["self_t"]),
                                       f(obs["self_v"]), f(obs["others"]),
                                       f(goals))

        actor = ia(k_a)

        v = None
        if self.use_v:
            def iv(k):
                f = common.flatten_bn
                vec = state["vec"]
                if self.iac:
                    if self.experiment == "particle":
                        return self.v_mod.init(k, f(obs["others"]),
                                               f(obs["self_v"]), f(goals))
                    if self.experiment == "roadway":
                        return self.v_mod.init(k, f(obs["self_t"]),
                                               f(obs["self_v"]), f(goals))
                    return self.v_mod.init(k, f(obs["self_t"]),
                                           f(obs["self_v"]), f(obs["others"]),
                                           f(goals))
                s_others = common.others_concat(vec)
                g_others = common.others_concat(goals)
                if self.experiment == "checkers":
                    grid = jnp.broadcast_to(state["grid"][:, None],
                                            (b, n) + state["grid"].shape[1:])
                    return self.v_mod.init(k, f(grid), f(vec), f(goals),
                                           f(s_others))
                return self.v_mod.init(k, f(vec), f(goals), f(s_others),
                                       f(g_others))
            v = iv(k_v)

        q = None
        if self.use_q:
            a_others = common.others_stack(
                common.one_hot(jnp.zeros((b, n), jnp.int32), self.n_actions))

            def iq(k):
                f = common.flatten_bn
                vec = state["vec"]
                state_all = jnp.broadcast_to(
                    vec.reshape(b, 1, -1),
                    (b, n, vec.shape[1] * vec.shape[2]))
                g_others = common.others_concat(goals)
                labels = jnp.broadcast_to(jnp.eye(n)[None], (b, n, n))
                if self.experiment == "checkers":
                    grid = jnp.broadcast_to(state["grid"][:, None],
                                            (b, n) + state["grid"].shape[1:])
                    return self.q_mod.init(k, f(grid), f(state_all),
                                           f(a_others), f(goals), f(g_others),
                                           f(labels), f(obs["self_t"]),
                                           f(obs["self_v"]))
                return self.q_mod.init(k, f(state_all), f(a_others), f(goals),
                                       f(g_others), f(labels),
                                       f(obs["self_v"]))
            q = iq(k_q)

        cp = lambda t: None if t is None else jax.tree_util.tree_map(jnp.copy,
                                                                     t)
        return BaselineState(
            actor=actor, actor_tgt=cp(actor),
            v=v, v_tgt=cp(v), q=q, q_tgt=cp(q),
            opt_actor=self.opt_actor.init(actor),
            opt_v=None if v is None else self.opt_v_tx.init(v),
            opt_q=None if q is None else self.opt_q_tx.init(q),
            step=jnp.int32(0))

    # ------------------------------------------------------------------ #

    def update(self, ts: BaselineState, batch: Dict[str, Any], epsilon, key,
               with_grads: bool = False):
        cfg = self.cfg
        n = self.n_agents
        a_dim = self.n_actions
        gamma = cfg.gamma
        obs, obs_next = batch["obs"], batch["obs_next"]
        state, state_next = batch["state"], batch["state_next"]
        goals = batch["goals"]
        a_1h = common.one_hot(batch["a"], a_dim)
        done_mult = 1.0 - batch["done"].astype(jnp.float32)
        rl = batch["rl"]
        metrics = {}

        v_new, opt_v = ts.v, ts.opt_v
        v_adv = None
        if self.use_v:
            v_tgt_next = self._v_forward(ts.v_tgt, state_next, obs_next,
                                         goals)
            v_next_main = self._v_forward(ts.v, state_next, obs_next, goals)
            y_v = jax.lax.stop_gradient(
                rl + gamma * v_tgt_next * done_mult[:, None])

            def v_loss_fn(p):
                v = self._v_forward(p, state, obs, goals)
                return jnp.mean(jnp.square(y_v - v)), v

            (loss_v, v_res), g_v = jax.value_and_grad(
                v_loss_fn, has_aux=True)(ts.v)
            upd_v, opt_v = self.opt_v_tx.update(g_v, ts.opt_v, ts.v)
            v_new = optax.apply_updates(ts.v, upd_v)
            metrics["loss_V"] = loss_v
            # PRE-update values feed the policy TD-error (alg_baseline.py:
            # 533-535, 601-604)
            v_adv = jax.lax.stop_gradient(
                rl + gamma * v_next_main * done_mult[:, None] - v_res)

        q_new, opt_q = ts.q, ts.opt_q
        coma_adv = None
        if self.use_q:
            a_next = self.act(ts, obs_next, goals, batch.get("a"), epsilon,
                              key, target=True)
            a_next_1h = common.one_hot(a_next, a_dim)
            a_others_next = common.others_stack(a_next_1h)
            q_tgt = self._q_forward(ts.q_tgt, state_next, obs_next, goals,
                                    a_others_next)
            q_tgt_sel = jnp.sum(q_tgt * a_next_1h, axis=-1)    # [B, N]
            # GLOBAL reward in the COMA TD target (alg_baseline.py:582)
            r_glob = batch["r"][:, None]
            y_q = jax.lax.stop_gradient(
                r_glob + gamma * q_tgt_sel * done_mult[:, None])

            a_others = common.others_stack(a_1h)

            def q_loss_fn(p):
                q = self._q_forward(p, state, obs, goals, a_others)
                q_sel = jnp.sum(q * a_1h, axis=-1)
                return jnp.mean(jnp.square(y_q - q_sel))

            loss_q, g_q = jax.value_and_grad(q_loss_fn)(ts.q)
            upd_q, opt_q = self.opt_q_tx.update(g_q, ts.opt_q, ts.q)
            q_new = optax.apply_updates(ts.q, upd_q)
            metrics["loss_Q"] = loss_q

            # POST-update critic for the advantage (alg_baseline.py:608-617)
            q_res = jax.lax.stop_gradient(
                self._q_forward(q_new, state, obs, goals, a_others))
            probs_const = jax.lax.stop_gradient(
                self.actor_probs(ts.actor, obs, goals, batch.get("a_prev"),
                                 epsilon))
            coma_adv = (jnp.sum(q_res * a_1h, axis=-1)
                        - jnp.sum(q_res * probs_const, axis=-1))  # [B, N]

        def policy_loss_fn(p):
            probs = self.actor_probs(p, obs, goals, batch.get("a_prev"),
                                     epsilon)
            log_pi = jnp.log(jnp.sum(probs * a_1h, axis=-1) + 1e-15)  # [B,N]
            losses = []
            if self.use_q:
                lg = -jnp.mean(jnp.sum(log_pi * coma_adv, axis=1))
                losses.append(("global", lg))
            if self.use_v:
                if self.iac:
                    ll = -jnp.mean(log_pi * v_adv)
                else:
                    ll = -jnp.mean(jnp.sum(log_pi, axis=1)
                                   * jnp.sum(v_adv, axis=1))
                losses.append(("local", ll))
            if self.use_q and self.use_v:
                loss = (cfg.alpha * dict(losses)["local"]
                        + (1 - cfg.alpha) * dict(losses)["global"])
            else:
                loss = losses[0][1]
            return loss

        loss_pi, g_pi = jax.value_and_grad(policy_loss_fn)(ts.actor)
        upd_pi, opt_actor = self.opt_actor.update(g_pi, ts.opt_actor,
                                                  ts.actor)
        actor_new = optax.apply_updates(ts.actor, upd_pi)
        metrics["policy_loss"] = loss_pi

        if with_grads:
            grads = {"Policy": g_pi}
            if self.use_v:
                grads["V"] = g_v
            if self.use_q:
                grads["Q"] = g_q
            metrics["grads"] = grads

        tau = cfg.tau
        su = lambda t, m: None if m is None else common.soft_update(t, m, tau)
        new_ts = BaselineState(
            actor=actor_new,
            actor_tgt=common.soft_update(ts.actor_tgt, actor_new, tau),
            v=v_new, v_tgt=su(ts.v_tgt, v_new),
            q=q_new, q_tgt=su(ts.q_tgt, q_new),
            opt_actor=opt_actor, opt_v=opt_v, opt_q=opt_q,
            step=ts.step + 1)
        return new_ts, metrics
