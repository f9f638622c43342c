"""Typed configuration schema.

Mirrors the reference's three-tier JSON config system (master config +
per-experiment stage configs; see reference ``alg/config.json`` and
``alg/config_{checkers,sumo}_stage{1,2}.json``,
``alg/config_particle_*.json``) as frozen dataclasses so that configs are
hashable and can be closed over by ``jit``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


def _freeze(seq):
    return tuple(seq) if seq is not None else None


@dataclasses.dataclass(frozen=True)
class CheckersEnvConfig:
    """Checkers grid world (reference ``env/checkers.py:5-36``)."""

    n_rows: int = 3
    n_columns: int = 8
    n_obs: int = 2
    agents_r: Tuple[int, ...] = (0, 2)
    agents_c: Tuple[int, ...] = (8, 8)
    n_agents: int = 2
    max_steps: int = 50

    @property
    def total_rows(self) -> int:
        return self.n_rows + 2 * self.n_obs

    @property
    def total_columns(self) -> int:
        return self.n_columns + 2 * self.n_obs + 1

    @property
    def max_collectible(self) -> int:
        return self.n_rows * self.n_columns


@dataclasses.dataclass(frozen=True)
class ParticleEnvConfig:
    """Cooperative navigation particle env
    (reference ``multiagent/core.py`` + ``scenarios/multi-goal_spread.py``)."""

    n_agents: int = 4
    agents_x: Tuple[float, ...] = (-0.9, 0.9, -0.9, 0.9)
    agents_y: Tuple[float, ...] = (-0.9, 0.9, 0.9, -0.9)
    landmarks_x: Tuple[float, ...] = (0.9, -0.9, 0.9, -0.9)
    landmarks_y: Tuple[float, ...] = (0.9, -0.9, -0.9, 0.9)
    initial_std: float = 0.0
    prob_random: float = 0.2
    max_steps: int = 33
    # physics constants (reference core.py:94-99)
    dt: float = 0.1
    damping: float = 0.25
    contact_force: float = 100.0
    contact_margin: float = 1e-3
    agent_size: float = 0.15
    accel: float = 5.0  # action force sensitivity (environment.py:211)


@dataclasses.dataclass(frozen=True)
class RoadwayEnvConfig:
    """Kinematic sublane lane-change roadway — the TPU-native replacement for
    the SUMO merge network (reference ``env_sumo/simple/*`` +
    ``env/egocar_simple.py`` + ``env/multicar_simple.py``).

    Geometry: one straight edge, 4 lanes x 3.2 m, 200 m long, 0.8 m sublane
    resolution (16 absolute sublanes), 0.2 s control step — exactly the
    observable surface of the reference's "simple" network.
    """

    n_agents: int = 2
    goal_lane: Tuple[int, ...] = (3, 0)
    goal_pos: Tuple[float, ...] = (190.0, 190.0)
    speed: Tuple[float, ...] = (30.0, 30.0)
    lane: Tuple[int, ...] = (1, 2)
    init_position: Tuple[float, ...] = (0.0, 0.0)
    depart_mean: Tuple[float, ...] = (0.0, 0.0)
    depart_stdev: float = 0.5
    total_length: float = 200.0
    total_width: float = 12.8
    save_threshold: float = 18.0
    prob_random: float = 0.2
    # dynamics (egocar_simple.py:63-92)
    dt: float = 0.2
    n_lanes: int = 4
    sublanes_per_lane: int = 4
    sublane_res: float = 0.8
    car_length: float = 5.0
    car_width: float = 1.8
    acc_val: float = 2.5
    dec_val: float = 2.5
    v_max: float = 50.0  # vType maxSpeed (merge_stage2.rou.xml)
    v_min: float = 10.0
    overspeed: float = 35.7
    ttc_thres: float = 2.0
    # observation grid (egocar_simple.py:75, observation.py:13-44)
    obs_front: float = 15.0
    obs_back: float = 15.0
    obs_left: int = 4
    obs_right: int = 4
    res_forward: float = 2.5
    # ray-cast shadow occlusion on the egocentric grid
    # (observation.py:180-303; off by default like the reference)
    occlusion: bool = False
    # traffic metrics (multicar_simple.py:19-20,37-38)
    follow_threshold: float = 15.0
    v_threshold: float = 29.05
    # max_step = round((total_length/25)/dt) (egocar_simple.py:79)

    @property
    def n_sublanes(self) -> int:
        return self.n_lanes * self.sublanes_per_lane

    @property
    def max_step(self) -> int:
        return round((self.total_length / 25.0) / self.dt)

    @property
    def obs_rows(self) -> int:
        return int(round(self.obs_front / self.res_forward)) + int(
            round(self.obs_back / self.res_forward)) + 1

    @property
    def obs_cols(self) -> int:
        return self.obs_left + self.obs_right + 1

    # global-tensor grid over the whole road (multicar_simple.py:62-63)
    @property
    def n_rows(self) -> int:
        return int(self.total_length / self.res_forward)

    @property
    def n_cols(self) -> int:
        return int(self.total_width / self.sublane_res)


@dataclasses.dataclass(frozen=True)
class NNConfig:
    """Network sizes, superset of the per-experiment ``nn`` dicts."""

    # generic staged nets (config.json "nn")
    Q_units: int = 256
    V_n_others: int = 128
    V_n_h2: int = 64
    Actor_n_others: int = 128
    Actor_n_h2: int = 64
    # checkers conv nets (config_checkers_stage*.json "nn")
    Q_conv_f: int = 4
    Q_conv_k: Tuple[int, int] = (3, 5)
    Q_n_h1_1: int = 256
    Q_n_h1_2: int = 32
    Q_n_h2: int = 256
    A_conv_f: int = 6
    A_conv_k: Tuple[int, int] = (3, 3)
    A_n_h1: int = 256
    A_n_h2: int = 256
    V_conv_f: int = 6
    V_conv_k: Tuple[int, int] = (3, 3)
    V_n_h1_1: int = 256
    V_n_h1_2: int = 32


@dataclasses.dataclass(frozen=True)
class AlgConfig:
    """Algorithm hyperparameters (reference ``alg/config.json:40-67``)."""

    alg_name: str = "cm3"  # cm3 | coma | iac | qmix
    stage: int = 1
    n_agents: int = 1
    use_Q_credit: bool = True
    use_V: bool = False
    use_Q: bool = False
    IAC: bool = False
    alpha: float = 0.7
    tau: float = 0.01
    gamma: float = 0.99
    lr_Q: float = 1e-3
    lr_V: float = 1e-3
    lr_actor: float = 1e-4
    # global-norm gradient clip, 0 = off (reference-exact; see
    # common.adam — stabilizes stage-2 roadway critic divergence)
    grad_clip: float = 0.0
    # reproduce the reference checkers QMIX target-mixer bug
    # (alg_qmix_checkers.py:106: MAIN agent q-values into the target
    # mixer).  Default False = intended QMIX semantics, which are
    # MEASURABLY STRONGER than the paper's baseline (PERF.md round 3)
    qmix_ref_bug: bool = False
    # parameter-init scheme (ordering-ablation knob): "ref" (rounds 1-3
    # default), "tf1" (exact TF1 parity: h2 combination bias glorot),
    # "trunc001" (all kernels truncated-normal 0.01) — see the audit in
    # cm3_tpu/models/nets.py
    init_scheme: str = "ref"
    # standardize the policy-gradient advantages across each update
    # batch (zero mean, unit variance) before the log-pi weighting
    # (0 = off, reference-exact).  Round-4 retention finding: with
    # bounded critics the PG advantage SIGNAL still drifts in scale as
    # the critics rail against the clamp (|policy_loss| to ~±300-570,
    # rd_s2r2/r3 curves) and erodes a near-optimal actor regardless of
    # lr_actor; normalization makes the PG invariant to critic scale
    # drift — the standard actor-critic variance control the reference
    # lacks.
    adv_norm: bool = False
    # clamp TD targets to [-target_clip, +target_clip] before the MSE
    # (0 = off, reference-exact).  Round-4 finding: stage-2 roadway
    # Q_credit diverges exponentially (loss 2 -> 1e10 by ~11k episodes)
    # even under grad_clip + a frozen actor — the classic unbounded TD
    # bootstrap.  Episodes here are finite-horizon with bounded rewards
    # (|return| <= ~20 on every task), so clamping targets to a bound
    # the true returns never exceed changes nothing about the fixed
    # point while removing the runaway direction (PERF.md round-4
    # retention section).
    target_clip: float = 0.0
    # fuse each network's Adam moments + parameter apply + Polyak target
    # blend into ONE Pallas kernel per network (ops/fused_opt.py) —
    # the update tail is kernel-launch-bound at these model sizes
    # (PERF.md).  Opt-in; requires grad_clip == 0 (the global-norm clip
    # is a different program shape).  Numerics match optax to float32
    # rounding (tests/test_fused_opt.py).
    fused_opt: bool = False
    # clipped importance weighting on the policy gradient (CM3 only):
    # 0 = off (reference-exact).  When c > 0, each replayed action's PG
    # term is weighted by w = min(pi_now(a|o,g) / mu(a|o,g), c), where
    # mu is the stored behavior-policy probability of the TAKEN action
    # at collection time (the eps-mixed policy, or 1/A for random-fill
    # actions) — the standard clipped per-action IS correction
    # (Degris et al. off-policy actor-critic; IMPALA's clipped rho).
    # Round-4 dissection (PERF.md retention section) established that
    # the roadway stage-2 erosion is the DIRECTION of the reference's
    # uncorrected off-policy vanilla PG on stale replayed actions
    # (alg_credit.py:314-360): once the grafted actor has moved on,
    # replayed exploratory actions keep full gradient weight and walk
    # it off the optimum.  With w, actions the current policy no longer
    # takes have pi_now(a) ~ 0 and contribute ~nothing, while in-
    # distribution data keeps weight ~1 (exactly 1 when the policy
    # hasn't drifted, so the correction is a no-op on-policy).  c=1 is
    # the conservative IMPALA-style choice.  Requires the driver to
    # store behavior probs in the replay transition ("bp" field —
    # train/offpolicy.py stores them automatically when this is set).
    pg_is_clip: float = 0.0
    # opt-in entropy floor on the policy loss (0 = reference-exact, no
    # entropy term — alg_credit.py:314-360 has none).  Round-5 retention
    # finding: clipped importance weighting (pg_is_clip) removes the
    # STALE-action erosion, but once the replay buffer turns on-policy
    # (mean IS weight ~1) the vanilla PG still drives the softmax to the
    # simplex corners; the resulting hard-deterministic policies flip
    # between near-equivalent optima under critic noise and eventually
    # collapse an agent (rd_s2r6: healthy to ~16k episodes, agent-1
    # eval 7.9 -> 1.7 at ~29k).  The bonus  -coef * mean(H(pi))  is
    # computed on the PURE softmax (an eps=0 actor forward), not the
    # eps-mixed probs, so the eps floor cannot mask a collapsed softmax.
    pg_ent_coef: float = 0.0
    # stage-2 retention recipe (CM3 only): skip the first K actor/Adam
    # applications so the fresh stage-2 critic branches burn in on data
    # from the frozen grafted actor before policy-gradient updates begin
    # (counters the post-graft drift diagnosed in PERF.md round 3;
    # 0 = reference-exact, no freeze).  Counted in UPDATES: with the
    # reference's 1-update-per-10-single-env-steps ratio, K updates
    # correspond to ~K*10/max_steps episodes.
    actor_freeze_updates: int = 0
    # stage-2 retention recipe, part 2 (CM3 only): linearly anneal the
    # ACTOR learning rate to zero over this many updates counted from
    # the end of the freeze window (0 = reference-exact, constant lr).
    # Round-4 finding (PERF.md retention section): with bounded targets
    # and clipped gradients the critics stay sane, but the off-policy
    # vanilla policy gradient on replayed actions still erodes a
    # near-optimal grafted actor from ~12k episodes on — at lr_actor/3
    # just as surely as at lr_actor (v3), and faster with standardized
    # advantages (v4); the erosion is the update DIRECTION, not its
    # size.  The principled endgame for a finite training budget is lr
    # annealing: a finite adaptation window after the critic burn-in,
    # then a policy that converges to rest — so the FINAL policy is the
    # annealed policy rather than whatever the last erosive update
    # produced (the reference instead relies on threshold snapshots,
    # train_offpolicy.py:385-398).  Implemented as an exact lr scale on
    # the actor's Adam update (moments are lr-independent).
    actor_lr_anneal_updates: int = 0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Driver schedule (reference ``alg/config.json`` + trainers)."""

    N_train: int = 50000
    period: int = 100
    N_eval: int = 10
    epsilon_start: float = 0.5
    epsilon_end: float = 0.05
    epsilon_div: float = 1000.0
    dual_buffer: bool = False
    buffer_size: int = 20000
    threshold: float = 16.0
    batch_size: int = 128
    pretrain_episodes: int = 50
    steps_per_train: int = 10
    episodes_per_train: int = 10
    epochs: int = 24
    max_steps: int = 33
    prob_random: float = 0.2
    seed: int = 12341
    n_seeds: int = 1
    # TPU-native extension: number of vectorized env instances stepped in
    # lockstep (the reference steps exactly one).
    n_envs: int = 1
    # learning updates per rollout chunk; 0 = auto (= n_envs), which keeps
    # the reference's update-to-data ratio of one update per
    # steps_per_train SINGLE-env transitions
    updates_per_chunk: int = 0
    save_threshold: Optional[float] = None
    dir_name: str = "try"
    # TensorBoard summaries incl. per-variable/per-gradient histograms
    # (reference config.json:64 "summarize"; emission alg_credit.py:362-403)
    summarize: bool = False
    # TPU-native extension: training chunks executed per host sync.  With
    # 1 (default) the driver reads the episode count after every chunk —
    # one host round-trip per steps_per_train env steps, which dominates
    # wall-clock on a remote/tunneled device.  With K>1 the driver scans
    # K chunks inside one jit, decaying epsilon ON DEVICE from the live
    # episode count (closer to the reference's per-episode decay than
    # the host-side once-per-chunk update); eval/log cadence then
    # quantizes to K-chunk groups.
    chunks_per_sync: int = 1
    # per-device replay shards (SURVEY.md §7: "keep per-host buffers to
    # avoid cross-host gathers").  With 1 (default) the buffer is one
    # ring gathered globally per sample; with D>1 the buffer leaves
    # carry a leading [D] shard axis aligned with the data-parallel env
    # sharding — each device appends and samples batch/D rows locally,
    # eliminating the per-update cross-device gather (the gradient psum
    # becomes the only collective).  Requires n_envs, batch_size and
    # buffer_size divisible by D.  Set to the mesh size for multi-chip
    # runs; 1 and D=1 are identical programs.
    replay_shards: int = 1
    # per-episode log.csv stream (reference train_offpolicy.py:208-218,
    # 399-403 writes EVERY episode; at vectorized rates that is pure
    # overhead, so completed-episode returns land in a device-side ring
    # of this many rows, flushed to log.csv once per period — a sampled
    # stream that keeps the reference's columns.  0 disables.
    episode_log: int = 1024

    @property
    def epsilon_step(self) -> float:
        return (self.epsilon_start - self.epsilon_end) / float(self.epsilon_div)


def load_json(name_or_path: str) -> dict:
    path = name_or_path
    if not os.path.exists(path):
        path = os.path.join(_CONFIG_DIR, name_or_path)
    with open(path) as f:
        return json.load(f)


def checkers_env_config(stage: int, max_steps: int = 50) -> CheckersEnvConfig:
    cfg = load_json(f"checkers_stage{stage}.json")
    init = cfg["init"]
    return CheckersEnvConfig(
        n_rows=init["n_rows"], n_columns=init["n_columns"], n_obs=init["n_obs"],
        agents_r=_freeze(init["agents_r"]), agents_c=_freeze(init["agents_c"]),
        n_agents=cfg["n_agents"], max_steps=max_steps)


def particle_env_config(name: str, prob_random: float = 0.2,
                        max_steps: int = 33) -> ParticleEnvConfig:
    cfg = load_json(f"particle_{name}.json")
    return ParticleEnvConfig(
        n_agents=cfg["n_agents"],
        agents_x=_freeze(cfg["agents_x"]), agents_y=_freeze(cfg["agents_y"]),
        landmarks_x=_freeze(cfg["landmarks_x"]),
        landmarks_y=_freeze(cfg["landmarks_y"]),
        initial_std=cfg["initial_std"], prob_random=prob_random,
        max_steps=max_steps)


def roadway_env_config(stage: int, prob_random: float = 0.2) -> RoadwayEnvConfig:
    cfg = load_json(f"roadway_stage{stage}.json")
    return RoadwayEnvConfig(
        n_agents=cfg["n_agents"], goal_lane=_freeze(cfg["goal_lane"]),
        goal_pos=_freeze(cfg["goal_pos"]), speed=_freeze(cfg["speed"]),
        lane=_freeze(cfg["lane"]), init_position=_freeze(cfg["init_position"]),
        depart_mean=_freeze(cfg["depart_mean"]),
        depart_stdev=cfg["depart_stdev"], total_length=cfg["total_length"],
        total_width=cfg["total_width"], save_threshold=cfg["save_threshold"],
        prob_random=prob_random)
