"""CM3: multi-goal actor-critic with a counterfactual credit function.

TPU-native re-design of the reference ``alg/alg_credit.py`` /
``alg_credit_checkers.py``.  The reference executes one learning update as
nine+ ``sess.run`` round-trips with host-side ``np.repeat`` reshaping
(``alg_credit.py:559-775``); here the WHOLE update — target-policy action
sampling, both critic TD updates, the T·N²·A counterfactual expansion,
the policy gradient, three Adam applications, and the soft target
updates — is a single jitted program.  The counterfactual expansion is
expressed as broadcasts over a [B, M, N, A] tensor (never materialized on
the host), exactly the "within-batch agent-axis batching" the survey
calls out (SURVEY.md §2.4).

Update ordering matches the reference semantics:
  * Q_global TD target from the slow target critic + eps-mixed target
    policy actions (alg_credit.py:579-596);
  * Q_actual for the policy gradient is the PRE-update Q_global forward
    (same forward that produced the critic loss, :599-614);
  * Q_cf for the counterfactual baseline uses the POST-update Q_credit
    (n>1) or Q_global (n==1) parameters (:720,750);
  * all advantage inputs are constants w.r.t. the policy loss (they were
    feed_dict placeholders), hence stop_gradient here;
  * soft target updates run last with tau (:775).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cm3_tpu.algs import common
from cm3_tpu.core.config import AlgConfig, NNConfig
from cm3_tpu.models import nets


@struct.dataclass
class CM3State:
    actor: Any
    actor_tgt: Any
    qg: Any
    qg_tgt: Any
    qc: Any          # None unless n_agents>1 and use_Q_credit
    qc_tgt: Any
    v: Any           # None unless n_agents>1 and use_V
    v_tgt: Any
    opt_actor: Any
    opt_qg: Any
    opt_qc: Any
    opt_v: Any
    step: jax.Array


class CM3:
    """Experiment-parameterized CM3.  ``experiment`` is one of
    'checkers' | 'particle' | 'roadway'."""

    def __init__(self, experiment: str, spec: Dict[str, int], alg: AlgConfig,
                 nn_cfg: NNConfig = NNConfig()):
        assert experiment in ("checkers", "particle", "roadway")
        self.experiment = experiment
        self.spec = spec
        self.cfg = alg
        self.nn_cfg = nn_cfg
        self.n_agents = alg.n_agents
        self.n_actions = spec["l_action"]
        self.stage = alg.stage
        self.use_credit = alg.n_agents > 1 and alg.use_Q_credit
        self.use_v = alg.n_agents > 1 and alg.use_V

        st = self.stage
        if experiment == "particle":
            self.actor_mod = nets.ActorParticle(
                n_actions=self.n_actions, n_h1_others=nn_cfg.Actor_n_others,
                n_h2=nn_cfg.Actor_n_h2, stage=st)
            self.qg_mod = nets.QGlobalParticle(stage=st)
            self.qc_mod = nets.QCreditParticle(stage=st)
            self.v_mod = nets.VParticleAblation()
        elif experiment == "roadway":
            self.actor_mod = nets.ActorRoadway(n_actions=self.n_actions,
                                               stage=st)
            self.qg_mod = nets.QGlobalRoadway(stage=st)
            self.qc_mod = nets.QCreditRoadway(stage=st)
            self.v_mod = nets.VParticleAblation()
        else:
            self.actor_mod = nets.ActorCheckers(
                n_actions=self.n_actions, conv_f=nn_cfg.A_conv_f,
                conv_k=tuple(nn_cfg.A_conv_k), n_h1=nn_cfg.A_n_h1,
                n_h2=nn_cfg.A_n_h2, stage=st)
            self.qg_mod = nets.QGlobalCheckers(
                conv_f1=nn_cfg.Q_conv_f, conv_k1=tuple(nn_cfg.Q_conv_k),
                n_h1_1=nn_cfg.Q_n_h1_1, n_h1_2=nn_cfg.Q_n_h1_2,
                n_h2=nn_cfg.Q_n_h2, stage=st)
            self.qc_mod = nets.QCreditCheckers(
                conv_f1=nn_cfg.Q_conv_f, conv_k1=tuple(nn_cfg.Q_conv_k),
                n_h1_1=nn_cfg.Q_n_h1_1, n_h1_2=nn_cfg.Q_n_h1_2,
                n_h2=nn_cfg.Q_n_h2, stage=st)
            self.v_mod = nets.VCheckersAblation()

        self.opt_actor = common.adam(alg.lr_actor, alg.grad_clip)
        self.opt_q = common.adam(alg.lr_Q, alg.grad_clip)
        self.opt_v_tx = common.adam(alg.lr_V, alg.grad_clip)
        if alg.fused_opt and alg.grad_clip:
            raise ValueError(
                "fused_opt requires grad_clip == 0 (the global-norm clip "
                "is a different program shape; see AlgConfig)")
        if alg.fused_opt and alg.actor_lr_anneal_updates:
            # the Pallas kernel takes lr as a static float
            # (ops/fused_opt.py float(lr)); a traced lr_scale would
            # raise ConcretizationTypeError at trace time
            raise ValueError(
                "fused_opt is incompatible with actor_lr_anneal_updates "
                "(the fused kernel's lr is static; the anneal is a "
                "traced per-step scale — use the optax path)")

    def _opt_step(self, tx, lr, opt_state, params, tgt, grads,
                  lr_scale=None):
        """Adam apply + soft target update for one network: a single
        fused Pallas kernel when cfg.fused_opt (ops/fused_opt.py), the
        optax chain + tree_map otherwise.  Identical math either way
        (soft update always consumes the POST-update params,
        alg_credit.py:775 ordering).

        ``lr_scale`` (traced scalar, optional) rescales the step — an
        exact learning-rate multiplier, since Adam's moment updates are
        lr-independent; used by the actor lr anneal
        (AlgConfig.actor_lr_anneal_updates)."""
        if self.cfg.fused_opt:
            from cm3_tpu.ops import fused_opt
            if lr_scale is not None:
                lr = lr * lr_scale
            return fused_opt.adam_polyak(opt_state, params, tgt, grads,
                                         lr, self.cfg.tau)
        upd, new_opt = tx.update(grads, opt_state, params)
        if lr_scale is not None:
            upd = jax.tree_util.tree_map(lambda u: u * lr_scale, upd)
        new_p = optax.apply_updates(params, upd)
        return new_p, common.soft_update(tgt, new_p, self.cfg.tau), new_opt

    # ------------------------------------------------------------------ #
    # forward helpers (all take [B, N, ...] and return [B, N, ...])
    # ------------------------------------------------------------------ #

    def _bn(self, x):
        return common.flatten_bn(x)

    def actor_probs(self, params, obs, goals, a_prev, epsilon):
        """eps-mixed policy probabilities, [B, N, A]."""
        b, n = goals.shape[0], goals.shape[1]
        f = self._bn
        if self.experiment == "particle":
            probs = self.actor_mod.apply(
                params, f(obs["others"]), f(obs["self_v"]), f(goals))
        elif self.experiment == "roadway":
            probs = self.actor_mod.apply(
                params, f(obs["self_t"]), f(obs["self_v"]), f(goals))
        else:
            a_prev_1h = common.one_hot(a_prev, self.n_actions)
            probs = self.actor_mod.apply(
                params, f(a_prev_1h), f(obs["self_t"]), f(obs["self_v"]),
                f(obs["others"]), f(goals))
        probs = probs.reshape(b, n, self.n_actions)
        return common.epsilon_probs(probs, epsilon, self.n_actions)

    def act(self, ts: CM3State, obs, goals, a_prev, epsilon, key,
            target: bool = False):
        """Sample actions for all agents as one batch, [B, N]."""
        params = ts.actor_tgt if target else ts.actor
        probs = self.actor_probs(params, obs, goals, a_prev, epsilon)
        return common.sample_actions(key, probs)

    def act_bp(self, ts: CM3State, obs, goals, a_prev, epsilon, key):
        """Sample actions AND return the behavior-policy distribution:
        -> (actions [B, N], probs [B, N, A]).  Used by the drivers when
        cfg.pg_is_clip is set — the per-action probability of whatever
        action is ultimately STORED (the env's feasibility filter may
        replace the sampled one) is gathered from ``probs`` and saved in
        the transition as ``bp``."""
        probs = self.actor_probs(ts.actor, obs, goals, a_prev, epsilon)
        return common.sample_actions(key, probs), probs

    def _q_global(self, params, state, obs, goals, a_1h):
        """Q_n(s, a_all) for every agent, [B, N]."""
        b, n = goals.shape[0], goals.shape[1]
        f = self._bn
        vec = state["vec"]
        s_others = common.others_concat(vec)
        a_others = common.others_stack(a_1h)
        g_others = common.others_concat(goals)
        if self.experiment == "particle":
            q = self.qg_mod.apply(params, f(vec), f(goals), f(a_1h),
                                  f(s_others), f(a_others))
        elif self.experiment == "roadway":
            q = self.qg_mod.apply(params, f(vec), f(goals), f(a_1h),
                                  f(s_others), f(a_others), f(g_others))
        else:
            grid = jnp.broadcast_to(state["grid"][:, None],
                                    (b, n) + state["grid"].shape[1:])
            q = self.qg_mod.apply(params, f(grid), f(vec), f(goals), f(a_1h),
                                  f(s_others), f(a_others), f(obs["self_t"]),
                                  f(obs["self_v"]))
        return q.reshape(b, n)

    def _q_global_cf(self, params, state, obs, goals, a_others_1h):
        """n_agents==1 counterfactual: Q(s, a) for every action, [B, A].

        a_others_1h is fed but unused by the stage-1 net (reference feeds
        the placeholders anyway, alg_credit.py:713-719)."""
        b = goals.shape[0]
        a_dim = self.n_actions
        vec = state["vec"][:, 0]                       # [B, D]
        bc = lambda x: jnp.broadcast_to(x[:, None], (b, a_dim) + x.shape[1:])
        flat = lambda x: x.reshape((b * a_dim,) + x.shape[2:])
        eye = jnp.broadcast_to(jnp.eye(a_dim), (b, a_dim, a_dim))
        s_n = flat(bc(vec))
        g_n = flat(bc(goals[:, 0]))
        a_cf = flat(eye)
        s_others = jnp.zeros((b * a_dim, 0), jnp.float32)
        a_others = jnp.zeros((b * a_dim, 0, a_dim), jnp.float32)
        if self.experiment == "particle":
            q = self.qg_mod.apply(params, s_n, g_n, a_cf, s_others, a_others)
        elif self.experiment == "roadway":
            q = self.qg_mod.apply(params, s_n, g_n, a_cf, s_others, a_others,
                                  jnp.zeros((b * a_dim, 0), jnp.float32))
        else:
            q = self.qg_mod.apply(
                params, flat(bc(state["grid"])), s_n, g_n, a_cf, s_others,
                a_others, flat(bc(obs["self_t"][:, 0])),
                flat(bc(obs["self_v"][:, 0])))
        return q.reshape(b, a_dim)

    def _q_credit_pairs(self, params, state, obs, goals, a_m_1h):
        """Q_n(s, a^m) for all (m, n) pairs, [B, M, N].

        a_m_1h: [B, N, A] actual one-hot actions (indexed by m).
        Broadcast layout mirrors the reference's repeat scheme where m is
        the outer and n the inner index (alg_credit.py:619-658)."""
        b, n = goals.shape[0], goals.shape[1]
        vec = state["vec"]
        s_others = common.others_concat(vec)
        g_others = common.others_concat(goals)
        # pair tensors [B, M, N, ...]
        pn = lambda x: jnp.broadcast_to(x[:, None], (b, n) + x.shape[1:])
        pm = lambda x: jnp.broadcast_to(x[:, :, None],
                                        (b, n, n) + x.shape[2:])
        flat = lambda x: x.reshape((b * n * n,) + x.shape[3:])
        s_n = flat(pn(vec))            # [b,m,n,...] -> varies along n
        g_n = flat(pn(goals))
        s_m = flat(pm(vec))            # varies along m
        a_m = flat(pm(a_m_1h))
        s_oth = flat(pn(s_others))
        g_oth = flat(pn(g_others))
        if self.experiment == "particle":
            q = self.qc_mod.apply(params, s_n, g_n, a_m, s_m, s_oth)
        elif self.experiment == "roadway":
            q = self.qc_mod.apply(params, s_n, g_n, a_m, s_m, s_oth, g_oth)
        else:
            grid = state["grid"]
            grid_p = jnp.broadcast_to(grid[:, None, None],
                                      (b, n, n) + grid.shape[1:])
            t_m = flat(pm(obs["self_t"]))   # obs indexed by m (reference
            v_m = flat(pm(obs["self_v"]))   # alg_credit_checkers.py:634-651)
            q = self.qc_mod.apply(params, flat(grid_p), s_n, g_n, a_m, s_m,
                                  s_oth, t_m, v_m)
        return q.reshape(b, n, n)

    def _q_credit_cf(self, params, state, obs, goals):
        """Counterfactual Q_n(s, a^m = each action): [B, M, N, A]."""
        b, n = goals.shape[0], goals.shape[1]
        a_dim = self.n_actions
        vec = state["vec"]
        s_others = common.others_concat(vec)
        g_others = common.others_concat(goals)
        shape4 = (b, n, n, a_dim)
        pn = lambda x: jnp.broadcast_to(x[:, None, :, None],
                                        shape4 + x.shape[2:])
        pm = lambda x: jnp.broadcast_to(x[:, :, None, None],
                                        shape4 + x.shape[2:])
        flat = lambda x: x.reshape((b * n * n * a_dim,) + x.shape[4:])
        eye = jnp.broadcast_to(jnp.eye(a_dim), shape4 + (a_dim,))
        a_cf = eye.reshape(b * n * n * a_dim, a_dim)
        s_n = flat(pn(vec))
        g_n = flat(pn(goals))
        s_m = flat(pm(vec))
        s_oth = flat(pn(s_others))
        g_oth = flat(pn(g_others))
        if self.experiment == "particle":
            q = self.qc_mod.apply(params, s_n, g_n, a_cf, s_m, s_oth)
        elif self.experiment == "roadway":
            q = self.qc_mod.apply(params, s_n, g_n, a_cf, s_m, s_oth, g_oth)
        else:
            grid = state["grid"]
            grid_p = jnp.broadcast_to(grid[:, None, None, None],
                                      shape4 + grid.shape[1:])
            t_m = flat(pm(obs["self_t"]))
            v_m = flat(pm(obs["self_v"]))
            q = self.qc_mod.apply(params, flat(grid_p), s_n, g_n, a_cf, s_m,
                                  s_oth, t_m, v_m)
        return q.reshape(b, n, n, a_dim)

    def _v_forward(self, params, state, goals):
        """V(s, g^n) ablation baseline, [B, N]."""
        b, n = goals.shape[0], goals.shape[1]
        f = self._bn
        vec = state["vec"]
        s_others = common.others_concat(vec)
        if self.experiment == "checkers":
            grid = jnp.broadcast_to(state["grid"][:, None],
                                    (b, n) + state["grid"].shape[1:])
            v = self.v_mod.apply(params, f(grid), f(vec), f(goals),
                                 f(s_others))
        else:
            v = self.v_mod.apply(params, f(vec), f(goals), f(s_others))
        return v.reshape(b, n)

    # ------------------------------------------------------------------ #
    # init
    # ------------------------------------------------------------------ #

    def init_state(self, key, example_obs, example_state, example_goals):
        """Initialize all parameter trees and optimizers from example
        [B, N, ...] pytrees (one env instance's reset output, batched)."""
        with nets.init_scheme(self.cfg.init_scheme):
            return self._init_state(key, example_obs, example_state,
                                    example_goals)

    def _init_state(self, key, example_obs, example_state, example_goals):
        obs = example_obs
        state = example_state
        goals = example_goals
        b, n = goals.shape[0], goals.shape[1]
        a = jnp.zeros((b, n), jnp.int32)
        a_1h = common.one_hot(a, self.n_actions)

        k_actor, k_qg, k_qc, k_v = jax.random.split(key, 4)

        def init_actor(k):
            f = self._bn
            if self.experiment == "particle":
                return self.actor_mod.init(k, f(obs["others"]),
                                           f(obs["self_v"]), f(goals))
            if self.experiment == "roadway":
                return self.actor_mod.init(k, f(obs["self_t"]),
                                           f(obs["self_v"]), f(goals))
            return self.actor_mod.init(
                k, f(common.one_hot(a, self.n_actions)), f(obs["self_t"]),
                f(obs["self_v"]), f(obs["others"]), f(goals))

        actor = init_actor(k_actor)

        def init_qg(k):
            f = self._bn
            vec = state["vec"]
            s_others = common.others_concat(vec)
            a_others = common.others_stack(a_1h)
            g_others = common.others_concat(goals)
            if self.experiment == "particle":
                return self.qg_mod.init(k, f(vec), f(goals), f(a_1h),
                                        f(s_others), f(a_others))
            if self.experiment == "roadway":
                return self.qg_mod.init(k, f(vec), f(goals), f(a_1h),
                                        f(s_others), f(a_others), f(g_others))
            grid = jnp.broadcast_to(state["grid"][:, None],
                                    (b, n) + state["grid"].shape[1:])
            return self.qg_mod.init(k, f(grid), f(vec), f(goals), f(a_1h),
                                    f(s_others), f(a_others), f(obs["self_t"]),
                                    f(obs["self_v"]))

        qg = init_qg(k_qg)

        qc = None
        if self.use_credit:
            def init_qc(k):
                f = self._bn
                vec = state["vec"]
                s_others = common.others_concat(vec)
                g_others = common.others_concat(goals)
                if self.experiment == "particle":
                    return self.qc_mod.init(k, f(vec), f(goals), f(a_1h),
                                            f(vec), f(s_others))
                if self.experiment == "roadway":
                    return self.qc_mod.init(k, f(vec), f(goals), f(a_1h),
                                            f(vec), f(s_others), f(g_others))
                grid = jnp.broadcast_to(state["grid"][:, None],
                                        (b, n) + state["grid"].shape[1:])
                return self.qc_mod.init(k, f(grid), f(vec), f(goals), f(a_1h),
                                        f(vec), f(s_others), f(obs["self_t"]),
                                        f(obs["self_v"]))
            qc = init_qc(k_qc)

        v = None
        if self.use_v:
            def init_v(k):
                f = self._bn
                vec = state["vec"]
                s_others = common.others_concat(vec)
                if self.experiment == "checkers":
                    grid = jnp.broadcast_to(state["grid"][:, None],
                                            (b, n) + state["grid"].shape[1:])
                    return self.v_mod.init(k, f(grid), f(vec), f(goals),
                                           f(s_others))
                return self.v_mod.init(k, f(vec), f(goals), f(s_others))
            v = init_v(k_v)

        return CM3State(
            actor=actor, actor_tgt=jax.tree_util.tree_map(jnp.copy, actor),
            qg=qg, qg_tgt=jax.tree_util.tree_map(jnp.copy, qg),
            qc=qc,
            qc_tgt=None if qc is None else jax.tree_util.tree_map(jnp.copy, qc),
            v=v,
            v_tgt=None if v is None else jax.tree_util.tree_map(jnp.copy, v),
            opt_actor=self.opt_actor.init(actor),
            opt_qg=self.opt_q.init(qg),
            opt_qc=None if qc is None else self.opt_q.init(qc),
            opt_v=None if v is None else self.opt_v_tx.init(v),
            step=jnp.int32(0))

    # ------------------------------------------------------------------ #
    # the fused learning update
    # ------------------------------------------------------------------ #

    def update(self, ts: CM3State, batch: Dict[str, Any], epsilon, key,
               with_grads: bool = False):
        """One CM3 learning step.  batch fields are [B, ...] pytrees:
        state/obs (dicts), a [B,N] int, r [B], rl [B,N], state_next,
        obs_next, done [B], goals [B,N,G], and (checkers) a_prev [B,N].

        ``with_grads`` additionally returns the raw gradient pytrees in
        ``metrics["grads"]`` for per-gradient histogram observability
        (the reference's tf.summary.histogram(grad) loop,
        alg_credit.py:384-403)."""
        cfg = self.cfg
        n = self.n_agents
        a_dim = self.n_actions
        gamma = cfg.gamma
        obs, obs_next = batch["obs"], batch["obs_next"]
        state, state_next = batch["state"], batch["state_next"]
        goals = batch["goals"]
        a_1h = common.one_hot(batch["a"], a_dim)
        done_mult = 1.0 - batch["done"].astype(jnp.float32)  # [B]
        rl = batch["rl"]
        metrics = {}

        # ---- target-policy actions a' (alg_credit.py:579-583) and the
        # current-policy probs used inside the counterfactual sum
        # (:725-729), evaluated as ONE stacked forward: same
        # architecture, different (params, inputs) -> vmap over a
        # leading [2] axis halves the sequential actor kernel chain.
        # Both use pre-update parameter trees, so fusing them preserves
        # the reference's update ordering.
        # checkers target actor conditions on previous action = current a
        stack2 = lambda a, b: jnp.stack([a, b])
        ap_cur = batch.get("a_prev")
        ap_cur = batch["a"] if ap_cur is None else ap_cur  # unused if no
        p_pair = jax.tree_util.tree_map(stack2, ts.actor_tgt, ts.actor)
        obs_pair = jax.tree_util.tree_map(stack2, obs_next, obs)
        ap_pair = stack2(batch["a"], ap_cur)
        probs_pair = jax.vmap(
            lambda p, o, ap: self.actor_probs(p, o, goals, ap, epsilon))(
            p_pair, obs_pair, ap_pair)
        a_next = common.sample_actions(key, probs_pair[0])
        a_next_1h = common.one_hot(a_next, a_dim)

        # ---- Q_global + Q_credit critic updates (:586-673), fused ----
        # Both critics train on PRE-update params with independent
        # (disjoint) parameter trees, so one backward pass over the sum
        # of their TD losses yields gradients identical to two separate
        # passes while halving the sequential backward kernel chain —
        # the single-seed learner is op-latency bound (PERF.md).
        # optional bounded-TD-target clamp (cfg.target_clip; round-4
        # divergence fix — a no-op on targets the true returns can reach)
        tclip = (lambda y: jnp.clip(y, -cfg.target_clip, cfg.target_clip)) \
            if cfg.target_clip else (lambda y: y)
        q_tgt_next = self._q_global(ts.qg_tgt, state_next, obs_next, goals,
                                    a_next_1h)
        y_g = rl + gamma * q_tgt_next * done_mult[:, None]
        y_g = jax.lax.stop_gradient(tclip(y_g))
        if self.use_credit:
            qc_tgt_next = self._q_credit_pairs(
                ts.qc_tgt, state_next, obs_next, goals, a_next_1h)  # [B,M,N]
            y_c = jax.lax.stop_gradient(tclip(
                rl[:, None, :] + gamma * qc_tgt_next
                * done_mult[:, None, None]))

        def critics_loss_fn(ps):
            pg, pc = ps
            q = self._q_global(pg, state, obs, goals, a_1h)
            loss_qg = jnp.mean(jnp.square(y_g - q))
            if self.use_credit:
                qc = self._q_credit_pairs(pc, state, obs, goals, a_1h)
                loss_qc = jnp.mean(jnp.square(y_c - qc))
            else:
                loss_qc = 0.0
            return loss_qg + loss_qc, (loss_qg, loss_qc, q)

        qc_new, qc_tgt_new, opt_qc = ts.qc, ts.qc_tgt, ts.opt_qc
        (_, (loss_qg, loss_qc, q_actual)), (g_qg, g_qc) = jax.value_and_grad(
            critics_loss_fn, has_aux=True)(
            (ts.qg, ts.qc if self.use_credit else None))
        qg_new, qg_tgt_new, opt_qg = self._opt_step(
            self.opt_q, cfg.lr_Q, ts.opt_qg, ts.qg, ts.qg_tgt, g_qg)
        metrics["loss_Q_global"] = loss_qg
        q_actual = jax.lax.stop_gradient(q_actual)   # [B, N]
        if self.use_credit:
            qc_new, qc_tgt_new, opt_qc = self._opt_step(
                self.opt_q, cfg.lr_Q, ts.opt_qc, ts.qc, ts.qc_tgt, g_qc)
            metrics["loss_Q_credit"] = loss_qc

        # ---- V ablation critic update (:675-697) ----
        v_new, v_tgt_new, opt_v = ts.v, ts.v_tgt, ts.opt_v
        v_res = None
        if self.use_v:
            v_tgt_next = self._v_forward(ts.v_tgt, state_next, goals)
            y_v = jax.lax.stop_gradient(tclip(
                rl + gamma * v_tgt_next * done_mult[:, None]))

            def v_loss_fn(p):
                v = self._v_forward(p, state, goals)
                return jnp.mean(jnp.square(y_v - v))

            loss_v, g_v = jax.value_and_grad(v_loss_fn)(ts.v)
            v_new, v_tgt_new, opt_v = self._opt_step(
                self.opt_v_tx, cfg.lr_V, ts.opt_v, ts.v, ts.v_tgt, g_v)
            v_res = jax.lax.stop_gradient(
                self._v_forward(v_new, state, goals))  # post-update (:695)
            metrics["loss_V"] = loss_v

        # ---- policy gradient (:699-773) ----
        # pi used inside the counterfactual sum: evaluated with the CURRENT
        # actor and treated as a constant (it was a placeholder feed);
        # computed above in the stacked actor forward
        probs_const = jax.lax.stop_gradient(probs_pair[1])

        if n == 1:
            q_cf = jax.lax.stop_gradient(
                self._q_global_cf(qg_new, state, obs, goals, None))  # [B,A]
            baseline = jnp.sum(probs_const[:, 0] * q_cf, axis=-1)     # [B]
            adv = q_actual[:, 0] - baseline
            sum_a = adv[:, None]                                      # [B,1]
        elif self.use_credit:
            q_cf = jax.lax.stop_gradient(
                self._q_credit_cf(qc_new, state, obs, goals))   # [B,M,N,A]
            cf = jnp.einsum("bma,bmna->bmn", probs_const, q_cf)
            adv = q_actual[:, None, :] - cf                     # [B,M,N]
            sum_a = jnp.sum(adv, axis=2)                        # [B,M]
        elif self.use_v:
            adv = q_actual[:, None, :] - v_res[:, None, :]
            sum_a = jnp.sum(jnp.broadcast_to(adv, (adv.shape[0], n, n)),
                            axis=2)
        else:
            sum_a = jnp.broadcast_to(
                jnp.sum(q_actual, axis=1, keepdims=True),
                (q_actual.shape[0], n))

        # optional batch advantage standardization (cfg.adv_norm;
        # round-4 retention finding — invariance to critic scale drift)
        if cfg.adv_norm:
            mu = jnp.mean(sum_a)
            sd = jnp.std(sum_a)
            sum_a = (sum_a - mu) / (sd + 1e-8)
        # clipped per-action importance weighting (cfg.pg_is_clip): the
        # off-policy correction the reference's vanilla PG lacks
        # (alg_credit.py:314-360).  w = min(pi_now(a)/mu(a), c) with mu
        # the stored behavior prob of the taken action; both numerator
        # and denominator are eps-mixed so w is bounded away from 0/inf
        # by the eps floor.  On-policy (no drift) w == 1 exactly for
        # c >= 1; stale actions the current policy no longer takes are
        # damped toward zero.  Weighted per (batch, acting agent) —
        # sum_a's leading agent axis is m, the ACTING agent, matching
        # log_pi's.  See AlgConfig.pg_is_clip.
        if cfg.pg_is_clip and "bp" in batch:
            taken_now = jnp.sum(probs_const * a_1h, axis=-1)     # [B,N]
            w = jnp.clip(taken_now / jnp.maximum(batch["bp"], 1e-8),
                         0.0, cfg.pg_is_clip)
            metrics["is_weight_mean"] = jnp.mean(w)
            sum_a = sum_a * (w[:, :1] if n == 1 else w)
        sum_a = jax.lax.stop_gradient(sum_a)

        def policy_loss_fn(p):
            probs = self.actor_probs(p, obs, goals, batch.get("a_prev"),
                                     epsilon)
            taken = jnp.sum(probs * a_1h, axis=-1)
            log_pi = jnp.log(taken + 1e-15)                     # [B,N]
            if n == 1:
                loss = -jnp.mean(log_pi[:, 0] * sum_a[:, 0])
            else:
                loss = -jnp.mean(jnp.sum(log_pi * sum_a, axis=1))
            ent = jnp.zeros(())
            if cfg.pg_ent_coef:
                # entropy floor on the PURE softmax (eps=0 forward):
                # the eps-mix already floors the BEHAVIOR probs, so
                # entropy of the mixed distribution stays bounded even
                # when the softmax underneath has collapsed to a corner
                # — the bonus must see the corner (cfg.pg_ent_coef).
                pure = self.actor_probs(p, obs, goals,
                                        batch.get("a_prev"), 0.0)
                ent = -jnp.mean(
                    jnp.sum(pure * jnp.log(pure + 1e-15), axis=-1))
                loss = loss - cfg.pg_ent_coef * ent
            return loss, ent

        (loss_pi, ent_pi), g_pi = jax.value_and_grad(
            policy_loss_fn, has_aux=True)(ts.actor)
        if cfg.pg_ent_coef:
            metrics["policy_entropy"] = ent_pi
        # actor lr anneal (retention recipe part 2): linear 1 -> 0 over
        # actor_lr_anneal_updates, counted after the freeze window ends
        # (cfg docstring; exact lr scaling — see _opt_step)
        lr_scale = None
        if cfg.actor_lr_anneal_updates:
            lived = jnp.asarray(ts.step - cfg.actor_freeze_updates,
                                jnp.float32)
            lr_scale = jnp.clip(
                1.0 - lived / float(cfg.actor_lr_anneal_updates), 0.0, 1.0)
        actor_new, actor_tgt_new, opt_actor = self._opt_step(
            self.opt_actor, cfg.lr_actor, ts.opt_actor, ts.actor,
            ts.actor_tgt, g_pi, lr_scale=lr_scale)
        metrics["policy_loss"] = loss_pi

        # stage-2 retention: keep the grafted actor (and its Adam state)
        # frozen for the first actor_freeze_updates updates while the
        # fresh critic branches burn in (cfg docstring; PERF.md round-3
        # post-graft-drift diagnosis).  The critic updates above are
        # unaffected; the target keeps blending toward the FROZEN actor.
        if cfg.actor_freeze_updates:
            live = ts.step >= cfg.actor_freeze_updates
            frozen_tgt = common.soft_update(ts.actor_tgt, ts.actor, cfg.tau)
            actor_new, opt_actor, actor_tgt_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(live, new, old),
                (actor_new, opt_actor, actor_tgt_new),
                (ts.actor, ts.opt_actor, frozen_tgt))

        if with_grads:
            grads = {"Policy": g_pi, "Q_global": g_qg}
            if self.use_credit:
                grads["Q_credit"] = g_qc
            if self.use_v:
                grads["V"] = g_v
            metrics["grads"] = grads

        # ---- soft target updates (:775; computed in _opt_step from the
        # post-update params, fused with the Adam apply) ----
        new_ts = CM3State(
            actor=actor_new, actor_tgt=actor_tgt_new,
            qg=qg_new, qg_tgt=qg_tgt_new,
            qc=qc_new, qc_tgt=qc_tgt_new,
            v=v_new, v_tgt=v_tgt_new,
            opt_actor=opt_actor, opt_qg=opt_qg, opt_qc=opt_qc, opt_v=opt_v,
            step=ts.step + 1)
        return new_ts, metrics
