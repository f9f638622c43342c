"""Config-driven training entry point.

The equivalent of the reference's ``alg/train_offpolicy.py`` /
``train_onpolicy.py`` mains + ``train_multiprocess.py`` launcher: reads
the master JSON config (same keys as ``alg/config.json``), builds env +
algorithm + driver, applies the curriculum restore logic
(``train_from_nothing`` / ``restore_same_stage`` / stage-2 graft from
``dir_restore``), trains with periodic eval + CSV logging + threshold
snapshots, and saves ``model_final``.

Trainer selection follows the reference convention
(``train_multiprocess.py:22-29``): on-policy for particle CM3/COMA/IAC,
off-policy for checkers/roadway and for QMIX everywhere.

Usage:
    python -m cm3_tpu.train.runner --config cm3_tpu/configs/master.json \
        [--experiment checkers --stage 1 --episodes 5000 --n-envs 32]

Multi-seed: ``train_multiseed`` runs ``n_seeds`` replicas with
deterministically folded keys (the reference forks one OS process per
seed, ``train_multiprocess.py:31-43``; here seeds share the process —
each run is a fresh jitted program, and large-scale replication is done
by vectorizing envs or by independent jobs per slice).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.algs.baseline import Baseline
from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.algs.qmix import QMIX
from cm3_tpu.core import config as cfgmod
from cm3_tpu.core import prng
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.envs.particle import Particle
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.train import checkpoint, tboard
from cm3_tpu.train.experiments import make_hooks
from cm3_tpu.train.logging import CSVLogger, stdout_log
from cm3_tpu.train.offpolicy import OffPolicyDriver, init_rollout
from cm3_tpu.train.onpolicy import OnPolicyDriver


def _nn_config(master: Dict, experiment: str, stage: int) -> cfgmod.NNConfig:
    nn = dict(master.get("nn", {}))
    if experiment == "checkers":
        sub = cfgmod.load_json(f"checkers_stage{stage}.json")["nn"]
        nn.update(sub)
    known = {f.name for f in dataclasses.fields(cfgmod.NNConfig)}
    return cfgmod.NNConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                              for k, v in nn.items() if k in known})


def build_env(master: Dict, experiment: str, stage: int):
    max_steps = master.get("max_steps", 33)
    prob_random = master.get("prob_random", 0.2)
    if experiment == "checkers":
        # the reference passes the master max_steps into Checkers
        # (train_offpolicy.py:127)
        return Checkers(cfgmod.checkers_env_config(stage,
                                                   max_steps=max_steps))
    if experiment == "particle":
        name = master.get("particle_config", f"stage{stage}")
        name = name.replace("config_particle_", "").replace(".json", "")
        return Particle(cfgmod.particle_env_config(
            name, prob_random=prob_random, max_steps=max_steps))
    if experiment == "roadway":
        return Roadway(cfgmod.roadway_env_config(stage,
                                                 prob_random=prob_random))
    raise ValueError(experiment)


def select_alg_name(master: Dict) -> str:
    if master.get("alg_name"):
        return master["alg_name"]
    if master.get("use_alg_credit", 1):
        return "cm3"
    if master.get("use_qmix", 0):
        return "qmix"
    if master.get("IAC", 0):
        return "iac"
    return "coma"


def build(master: Dict, experiment: Optional[str] = None,
          stage: Optional[int] = None):
    """-> (driver, alg, hooks, train_cfg)."""
    experiment = experiment or master.get("experiment", "checkers")
    stage = stage or master.get("stage", 1)
    env = build_env(master, experiment, stage)
    n_agents = env.spec()["n_agents"]

    alg_name = select_alg_name(master)
    alg_cfg = cfgmod.AlgConfig(
        alg_name=alg_name, stage=stage, n_agents=n_agents,
        use_Q_credit=bool(master.get("use_Q_credit", 1)),
        use_V=bool(master.get("use_V", 0)),
        use_Q=bool(master.get("use_Q", alg_name == "coma")),
        IAC=alg_name == "iac" or bool(master.get("IAC", 0)),
        alpha=master.get("alpha", 0.7),
        lr_Q=master.get("lr_Q", 1e-3), lr_V=master.get("lr_V", 1e-3),
        lr_actor=master.get("lr_actor", 1e-4),
        grad_clip=master.get("grad_clip", 0.0),
        qmix_ref_bug=bool(master.get("qmix_ref_bug", 0)),
        init_scheme=master.get("init_scheme", "ref"),
        actor_freeze_updates=int(master.get("actor_freeze_updates", 0)),
        actor_lr_anneal_updates=int(master.get("actor_lr_anneal_updates",
                                               0)),
        target_clip=master.get("target_clip", 0.0),
        pg_is_clip=master.get("pg_is_clip", 0.0),
        pg_ent_coef=master.get("pg_ent_coef", 0.0),
        adv_norm=bool(master.get("adv_norm", 0)),
        fused_opt=bool(master.get("fused_opt", 0)))
    nn_cfg = _nn_config(master, experiment, stage)

    if alg_name == "cm3":
        alg = CM3(experiment, env.spec(), alg_cfg, nn_cfg)
    elif alg_name == "qmix":
        alg = QMIX(experiment, env.spec(), alg_cfg, nn_cfg)
    else:  # coma / iac / central-V baselines
        if alg_name == "iac":
            alg_cfg = dataclasses.replace(alg_cfg, use_V=True, IAC=True,
                                          use_Q=False)
        elif alg_name == "coma" and not alg_cfg.use_V:
            alg_cfg = dataclasses.replace(alg_cfg, use_Q=True)
        alg = Baseline(experiment, env.spec(), alg_cfg, nn_cfg)

    known = {f.name for f in dataclasses.fields(cfgmod.TrainConfig)}
    tc_kwargs = {k: v for k, v in master.items() if k in known}
    tc_kwargs["buffer_size"] = int(master.get("buffer_size", 2e4))
    train_cfg = cfgmod.TrainConfig(**tc_kwargs)

    hooks = make_hooks(experiment, env, threshold=train_cfg.threshold)
    onpolicy = (experiment == "particle" and alg_name in
                ("cm3", "coma", "iac"))
    driver_cls = OnPolicyDriver if onpolicy else OffPolicyDriver
    driver = driver_cls(hooks, alg, train_cfg)
    return driver, alg, hooks, train_cfg


def train_function(master: Dict, workdir: str = ".",
                   n_episodes: Optional[int] = None,
                   verbose: bool = True) -> Tuple[Any, Dict]:
    """The reference's train_function(config), TPU-native."""
    experiment = master.get("experiment", "checkers")
    stage = master.get("stage", 1)
    seed = master.get("seed", 12341)
    dir_name = master.get("dir_name", "try")

    driver, alg, hooks, train_cfg = build(master)
    key = prng.root_key(seed)
    rs = init_rollout(hooks, prng.for_purpose(key, prng.RESET),
                      train_cfg.n_envs)
    ts = alg.init_state(prng.for_purpose(key, prng.PARAMS), rs.obs, rs.state,
                        rs.goals)

    # ---- curriculum restore (train_offpolicy.py:154-198) ----
    train_from_nothing = master.get("train_from_nothing", 1)
    restore_same_stage = master.get("restore_same_stage", 0)

    def _restore_flexible(restore_dir, mk_state, m):
        """Restore with the configured template; if the checkpoint's
        optimizer-state layout differs (grad_clip changes the flattened
        Adam chain's structure), retry with grad_clip toggled off and
        graft the non-optimizer fields — init-time restores only
        consume params/targets, the optimizer restarts fresh."""
        template = mk_state(m)
        try:
            return checkpoint.restore(restore_dir, template)
        except ValueError:
            alt = dict(m)
            alt["grad_clip"] = 0.0 if m.get("grad_clip") else 10.0
            restored = checkpoint.restore(restore_dir, mk_state(alt))
            return checkpoint.merge_non_opt(template, restored)

    def _mk_state(m):
        _, alg_, hooks_, tc_ = build(m)
        rs_ = init_rollout(hooks_, prng.for_purpose(key, prng.RESET),
                           tc_.n_envs)
        return alg_.init_state(prng.for_purpose(key, prng.PARAMS),
                               rs_.obs, rs_.state, rs_.goals)

    if not train_from_nothing:
        restore_dir = os.path.join(workdir, "saved",
                                   master.get("dir_restore", dir_name),
                                   master.get("model_name", "model_final"))
        if restore_same_stage:
            ts = _restore_flexible(restore_dir, _mk_state, dict(master))
        elif stage == 2:
            # rebuild the stage-1 TrainState structure to restore into,
            # then graft the shared-architecture weights.  The stage-1
            # model must be built with the STAGE-1 env config — an
            # explicit stage-2 particle_config would otherwise leak into
            # the rebuild and change the parameter structure (the
            # reference selects by filename convention,
            # train_offpolicy.py:91,115,122)
            m1 = dict(master)
            m1["stage"] = 1
            m1.pop("particle_config", None)
            ts1 = _restore_flexible(restore_dir, _mk_state, m1)
            if isinstance(alg, CM3):
                ts = checkpoint.stage2_init_cm3(ts, ts1.actor, ts1.qg)
            elif isinstance(alg, Baseline):
                ts = checkpoint.stage2_init_baseline(
                    ts, ts1.actor, getattr(ts1, "v", None))

    log_dir = os.path.join(workdir, "log", dir_name)
    save_dir = os.path.join(workdir, "saved", dir_name)
    os.makedirs(save_dir, exist_ok=True)
    logger = CSVLogger(log_dir, hooks.n_agents,
                       resume=bool(master.get("auto_resume", 0)))
    # TensorBoard event stream when summarize:true (config.json:64;
    # FileWriter at train_offpolicy.py:176, emission at :350-356)
    tb = tboard.SummaryWriter(log_dir) if master.get("summarize") else None

    # ---- elastic resume (TPU-native addition; reference has none —
    # SURVEY.md §5 failure-detection bullet) ----
    initial_episodes = 0
    autosave_path = os.path.join(save_dir, "model_autosave")
    if master.get("auto_resume", 0) and os.path.isdir(autosave_path):
        restored = checkpoint.restore(
            autosave_path, {"ts": ts, "episodes": jnp.int32(0)})
        ts = restored["ts"]
        initial_episodes = int(restored["episodes"])
        if verbose:
            print(f"auto-resume from episode {initial_episodes}")
    elif master.get("require_resume", 0):
        # a cell that is SEMANTICALLY a resume (e.g. a budget extension
        # of a finished run) must not silently train from scratch and
        # overwrite the original run's artifacts when the autosave is
        # missing (run scripts/extend_run.py first to synthesize one
        # from model_final)
        raise FileNotFoundError(
            f"require_resume=1 but no autosave at {autosave_path}")

    save_threshold = master.get("save_threshold")
    if save_threshold is None and experiment == "roadway":
        save_threshold = cfgmod.load_json(
            f"roadway_stage{stage}.json")["save_threshold"]

    best_good = [-np.inf]

    def log_fn(row):
        if "_episodes" in row:
            logger.log_episodes(*row.pop("_episodes"))
        logger.log_period(row)
        if verbose:
            stdout_log(row)
        if tb is not None:
            step = int(row["episode"])
            for k, v in row.items():
                if isinstance(v, (int, float)) and k != "episode":
                    tb.scalar(k, v, step)
            for i, r in enumerate(np.asarray(row["r_eval_local"]).ravel()):
                tb.scalar(f"r_eval_local/agent_{i}", float(r), step)
            tboard.log_train_state(tb, row["_ts"], step)
            if "_grads" in row:
                # per-gradient histograms (alg_credit.py:384-403)
                tboard.log_train_state(tb, row["_grads"], step,
                                       prefix="grads")
            tb.flush()
        # threshold-gated snapshots (train_offpolicy.py:391-398).  The
        # reference saves on EVERY crossing; a vectorized run crosses
        # hundreds of times once converged, so snapshots additionally
        # require a new best eval statistic
        r_eval = row["r_eval_local"]
        good, stat = False, -np.inf
        if save_threshold is not None:
            stat = float(np.min(r_eval))
            good = bool((r_eval > save_threshold).all())
        elif experiment == "checkers" and stage == 1:
            stat = float(r_eval.sum())
            good = stat > 9.0
        if good and stat > best_good[0]:
            best_good[0] = stat
            checkpoint.save(
                os.path.join(save_dir, f"model_good_{row['episode']}"),
                row["_ts"])
        # rolling autosave for elastic restart
        checkpoint.save(autosave_path,
                        {"ts": row["_ts"],
                         "episodes": jnp.int32(row["episode"])})

    run_kwargs = {}
    if not isinstance(driver, OnPolicyDriver):
        run_kwargs["initial_episodes"] = initial_episodes
    # learning runs use f32 matmuls: the TPU default (bf16 inputs)
    # systematically degrades this tiny-margin credit-assignment task
    # (checkers stage-1 locks into the +6.0 full-sweep optimum under
    # bf16; escapes it under f32 — see PERF.md), and f32 is what the
    # reference's TF1 CPU/GPU runs compute with.  Throughput benches
    # keep the hardware-native default.
    with jax.default_matmul_precision("float32"):
        ts, stats = driver.run(ts, prng.for_purpose(key, prng.ROLLOUT),
                               n_episodes=n_episodes, log_fn=log_fn,
                               **run_kwargs)
    checkpoint.save(os.path.join(save_dir, "model_final"), ts)
    return ts, stats


def _restore_stage1_state(master: Dict, workdir: str, key):
    """Restore the stage-1 winner checkpoint for a stage-2 graft
    (train_offpolicy.py:154-198), tolerant of optimizer-layout drift
    (see train_function._restore_flexible)."""
    restore_dir = os.path.join(workdir, "saved",
                               master.get("dir_restore",
                                          master.get("dir_name", "try")),
                               master.get("model_name", "model_final"))

    def mk(m):
        _, alg_, hooks_, tc_ = build(m)
        rs_ = init_rollout(hooks_, prng.for_purpose(key, prng.RESET),
                           tc_.n_envs)
        return alg_.init_state(prng.for_purpose(key, prng.PARAMS),
                               rs_.obs, rs_.state, rs_.goals)

    m1 = dict(master)
    m1["stage"] = 1
    m1.pop("particle_config", None)
    template = mk(m1)
    try:
        return checkpoint.restore(restore_dir, template)
    except ValueError:
        alt = dict(m1)
        alt["grad_clip"] = 0.0 if m1.get("grad_clip") else 10.0
        restored = checkpoint.restore(restore_dir, mk(alt))
        return checkpoint.merge_non_opt(template, restored)


def train_multiseed(master: Dict, workdir: str = ".",
                    n_episodes: Optional[int] = None):
    """n_seeds replicas, seed_base + i, dir_name_<i>
    (train_multiprocess.py:31-43).  With ``vmapped_seeds: true`` all
    seeds train simultaneously in one jitted program (vmap over the
    seed axis, SURVEY.md §2.4) instead of sequentially; final per-seed
    checkpoints land in saved/<dir_name>_<i>/."""
    if master.get("vmapped_seeds"):
        from cm3_tpu.train.multiseed import train_vmapped_seeds
        driver, alg, hooks, train_cfg = build(master)
        n_seeds = master.get("n_seeds", 1)
        experiment = master.get("experiment", "checkers")
        stage = master.get("stage", 1)
        base_dir = master.get("dir_name", "try")
        start = master.get("dir_idx_start", 1)
        onpolicy = isinstance(driver, OnPolicyDriver)

        save_threshold = master.get("save_threshold")
        if save_threshold is None and experiment == "roadway":
            save_threshold = cfgmod.load_json(
                f"roadway_stage{stage}.json")["save_threshold"]

        # per-seed CSV/metrics streams, like one reference process each
        log_dirs = [os.path.join(workdir, "log", f"{base_dir}_{start + i}")
                    for i in range(n_seeds)]
        loggers = [CSVLogger(d, hooks.n_agents,
                             resume=bool(master.get("auto_resume", 0)))
                   for d in log_dirs]
        # per-seed TensorBoard streams when summarize:true, with param
        # AND per-gradient histograms like the single-seed path
        tbs = [tboard.SummaryWriter(d) if master.get("summarize") else None
               for d in log_dirs]
        save_dirs = [os.path.join(workdir, "saved",
                                  f"{base_dir}_{start + i}")
                     for i in range(n_seeds)]
        for d in save_dirs:
            os.makedirs(d, exist_ok=True)

        # elastic resume of the WHOLE stacked sweep (one autosave holds
        # all seeds; replay buffers warm up after restart, like the
        # single-seed path)
        autosave = os.path.join(workdir, "saved", f"{base_dir}_vmapped",
                                "model_autosave")
        resume = None
        # curriculum graft into EVERY seed replica (vmapped counterpart
        # of train_function's stage-2 restore): per-seed fresh states,
        # the stage-1 winner's shared-architecture weights grafted into
        # each, passed to train_vmapped_seeds as the initial state
        if (not master.get("train_from_nothing", 1) and stage == 2
                and not master.get("restore_same_stage", 0)):
            key0 = prng.root_key(master.get("seed", 12341))
            ts1 = _restore_stage1_state(master, workdir, key0)
            base_seed = master.get("seed", 12341)
            kseeds = [prng.root_key(base_seed + i) for i in range(n_seeds)]
            singles = []
            for kk in kseeds:
                rs_i = init_rollout(hooks, prng.for_purpose(kk, prng.RESET),
                                    train_cfg.n_envs)
                ts_i = alg.init_state(prng.for_purpose(kk, prng.PARAMS),
                                      rs_i.obs, rs_i.state, rs_i.goals)
                if isinstance(alg, CM3):
                    ts_i = checkpoint.stage2_init_cm3(ts_i, ts1.actor,
                                                      ts1.qg)
                elif isinstance(alg, Baseline):
                    ts_i = checkpoint.stage2_init_baseline(
                        ts_i, ts1.actor, getattr(ts1, "v", None))
                singles.append(ts_i)
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *singles)
            resume = (stacked, np.zeros(n_seeds, np.int64))
        if (master.get("require_resume", 0)
                and not (master.get("auto_resume", 0)
                         and os.path.isdir(autosave))):
            raise FileNotFoundError(
                f"require_resume=1 but no vmapped autosave at {autosave}")
        if master.get("auto_resume", 0) and os.path.isdir(autosave):
            key0 = prng.root_key(master.get("seed", 12341))
            rs0 = init_rollout(hooks, prng.for_purpose(key0, prng.RESET),
                               train_cfg.n_envs)
            ts0 = alg.init_state(prng.for_purpose(key0, prng.PARAMS),
                                 rs0.obs, rs0.state, rs0.goals)
            stacked0 = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(
                    x[None], (n_seeds,) + x.shape).copy(), ts0)
            restored = checkpoint.restore(
                autosave, {"ts": stacked0,
                           "episodes": jnp.zeros(n_seeds, jnp.int32)})
            resume = (restored["ts"], np.asarray(restored["episodes"]))

        best_good = [-np.inf] * n_seeds

        def log_fn(row):
            _ts = row.pop("_ts")
            _grads = row.pop("_grads", None)
            _eps = row.pop("_episodes", None)
            for i in range(n_seeds):
                r_i = {k: (np.asarray(v)[i] if np.ndim(v) >= 1
                           and np.shape(v)[0] == n_seeds else v)
                       for k, v in row.items()}
                r_i["episode"] = int(row["episode"][i])
                if _eps is not None:
                    loggers[i].log_episodes(*_eps[i])
                loggers[i].log_period(r_i)
                if tbs[i] is not None:
                    step = r_i["episode"]
                    for k, v in r_i.items():
                        if isinstance(v, (int, float)) and k != "episode":
                            tbs[i].scalar(k, float(v), step)
                    for a, r in enumerate(
                            np.asarray(r_i["r_eval_local"]).ravel()):
                        tbs[i].scalar(f"r_eval_local/agent_{a}", float(r),
                                      step)
                    ts_i = jax.tree_util.tree_map(lambda x: x[i], _ts)
                    tboard.log_train_state(tbs[i], ts_i, step)
                    if _grads is not None:
                        g_i = jax.tree_util.tree_map(lambda x: x[i], _grads)
                        tboard.log_train_state(tbs[i], g_i, step,
                                               prefix="grads")
                    tbs[i].flush()
                # per-seed threshold-gated snapshots, on new best only
                # (train_offpolicy.py:391-398)
                r_eval = np.asarray(row["r_eval_local"][i])
                good, stat = False, -np.inf
                if save_threshold is not None:
                    stat = float(np.min(r_eval))
                    good = bool((r_eval > save_threshold).all())
                elif experiment == "checkers" and stage == 1:
                    stat = float(r_eval.sum())
                    good = stat > 9.0
                if good and stat > best_good[i]:
                    best_good[i] = stat
                    ts_i = jax.tree_util.tree_map(lambda x: x[i], _ts)
                    checkpoint.save(
                        os.path.join(save_dirs[i],
                                     f"model_good_{r_i['episode']}"), ts_i)
            checkpoint.save(autosave,
                            {"ts": _ts,
                             "episodes": jnp.asarray(row["episode"],
                                                     jnp.int32)})

        # f32 matmuls for learning parity (see train_function)
        with jax.default_matmul_precision("float32"):
            ts, history = train_vmapped_seeds(
                hooks, alg, train_cfg, n_seeds=n_seeds,
                base_seed=master.get("seed", 12341),
                n_episodes=n_episodes, log_fn=log_fn, onpolicy=onpolicy,
                resume=resume)
        for i in range(n_seeds):
            ts_i = jax.tree_util.tree_map(lambda x: x[i], ts)
            checkpoint.save(os.path.join(save_dirs[i], "model_final"), ts_i)
        return ts, history
    results = []
    base_seed = master.get("seed", 12341)
    base_dir = master.get("dir_name", "try")
    start = master.get("dir_idx_start", 1)
    for i in range(master.get("n_seeds", 1)):
        cfg = dict(master)
        cfg["seed"] = base_seed + i
        cfg["dir_name"] = f"{base_dir}_{start + i}"
        results.append(train_function(cfg, workdir, n_episodes))
    return results


def render_episodes(master: Dict, ts, workdir: str = ".",
                    n_episodes: int = 3, restore: bool = False):
    """Dump ``n_episodes`` greedy-policy episodes as animated SVG files
    under ``workdir/render/<dir_name>/`` — the headless counterpart of
    the reference's pyglet episode viewer
    (``multiagent/rendering.py:1-345``; SURVEY.md §2.4 item 3).  Pass
    ``ts=None`` with ``restore=True`` to render a saved ``model_final``
    from ``workdir/saved/<dir_name>``."""
    from cm3_tpu.envs import render as rndr

    experiment = master.get("experiment", "checkers")
    _, alg, hooks, train_cfg = build(master)
    key = prng.root_key(master.get("seed", 12341))
    if ts is None and restore:
        rs = init_rollout(hooks, prng.for_purpose(key, prng.RESET),
                          train_cfg.n_envs)
        template = alg.init_state(prng.for_purpose(key, prng.PARAMS),
                                  rs.obs, rs.state, rs.goals)
        ts = checkpoint.restore(
            os.path.join(workdir, "saved", master.get("dir_name", "try"),
                         master.get("model_name", "model_final")), template)
    env_cfg = hooks.env.cfg
    max_steps = getattr(env_cfg, "max_steps", None) or env_cfg.max_step
    out_dir = os.path.join(workdir, "render", master.get("dir_name", "try"))
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_episodes):
        states = rndr.collect_episode(
            hooks, alg, ts, jax.random.fold_in(
                prng.for_purpose(key, prng.ROLLOUT), 777_000 + i),
            max_steps)
        svg = rndr.render_episode_svg(experiment, states, env_cfg)
        path = os.path.join(out_dir, f"episode_{i}.svg")
        with open(path, "w") as f:
            f.write(svg)
        paths.append(path)
    return paths


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="cm3_tpu/configs/master.json")
    p.add_argument("--experiment", default=None)
    p.add_argument("--stage", type=int, default=None)
    p.add_argument("--episodes", type=int, default=None)
    p.add_argument("--n-envs", type=int, default=None)
    p.add_argument("--alg", default=None)
    p.add_argument("--workdir", default=".")
    p.add_argument("--multiseed", action="store_true")
    p.add_argument("--render-episodes", type=int, default=0, metavar="K",
                   help="after training (or, with --render-only, from the "
                   "saved model_final) dump K greedy episodes as animated "
                   "SVGs under workdir/render/<dir_name>/")
    p.add_argument("--render-only", action="store_true",
                   help="skip training; restore model_final and render")
    args = p.parse_args()

    master = cfgmod.load_json(args.config)
    if args.experiment:
        master["experiment"] = args.experiment
    if args.stage:
        master["stage"] = args.stage
    if args.n_envs:
        master["n_envs"] = args.n_envs
    if args.alg:
        master["alg_name"] = args.alg

    if args.render_only:
        paths = render_episodes(master, None, args.workdir,
                                args.render_episodes or 3, restore=True)
        print("\n".join(paths))
        return

    if args.multiseed:
        train_multiseed(master, args.workdir, args.episodes)
    else:
        ts, _ = train_function(master, args.workdir, args.episodes)
        if args.render_episodes:
            paths = render_episodes(master, ts, args.workdir,
                                    args.render_episodes)
            print("\n".join(paths))


if __name__ == "__main__":
    main()
