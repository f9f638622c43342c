"""Config-driven runner tests: build matrix, full train_function with CSV
logs + checkpoints, and the stage-1 -> stage-2 restore path."""

import pytest

pytestmark = [pytest.mark.slow]


import json
import os

import numpy as np
import pytest

from cm3_tpu.train import runner


def _master(**over):
    m = {
        "experiment": "checkers", "stage": 1, "seed": 1,
        "dir_name": "t1", "dir_restore": "t1",
        "alg_name": "cm3", "use_Q_credit": 1,
        "N_train": 300, "period": 150, "N_eval": 4,
        "epsilon_start": 0.5, "epsilon_end": 0.05, "epsilon_div": 100.0,
        "buffer_size": 1000, "batch_size": 16, "pretrain_episodes": 10,
        "steps_per_train": 10, "episodes_per_train": 10, "epochs": 4,
        "max_steps": 33, "prob_random": 0.2, "n_envs": 4,
        "train_from_nothing": 1,
        "nn": {"Q_units": 32, "V_n_others": 16, "V_n_h2": 16,
               "Actor_n_others": 16, "Actor_n_h2": 16},
    }
    m.update(over)
    return m


@pytest.mark.parametrize("experiment,alg", [
    ("checkers", "cm3"), ("checkers", "qmix"), ("checkers", "coma"),
    ("particle", "cm3"), ("particle", "iac"),
    ("roadway", "cm3"), ("roadway", "qmix"),
])
def test_build_matrix(experiment, alg):
    m = _master(experiment=experiment, alg_name=alg,
                stage=2 if alg == "coma" else 1)
    driver, algo, hooks, tc = runner.build(m)
    assert driver is not None and hooks.n_agents >= 1


def test_train_function_end_to_end(tmp_path):
    m = _master()
    ts, stats = runner.train_function(m, workdir=str(tmp_path),
                                      n_episodes=300, verbose=False)
    # CSV written
    century = os.path.join(str(tmp_path), "log", "t1", "log_century.csv")
    assert os.path.exists(century)
    lines = open(century).read().strip().split("\n")
    assert len(lines) >= 2  # header + >=1 period row
    # final checkpoint written
    assert os.path.isdir(os.path.join(str(tmp_path), "saved", "t1",
                                      "model_final"))


def test_stage2_restore_path(tmp_path):
    m1 = _master()
    runner.train_function(m1, workdir=str(tmp_path), n_episodes=200,
                          verbose=False)
    m2 = _master(stage=2, dir_name="t2", dir_restore="t1",
                 train_from_nothing=0, model_name="model_final")
    ts2, stats2 = runner.train_function(m2, workdir=str(tmp_path),
                                        n_episodes=200, verbose=False)
    assert stats2["episodes"] >= 200
    assert os.path.isdir(os.path.join(str(tmp_path), "saved", "t2",
                                      "model_final"))


def test_multiseed(tmp_path):
    m = _master(n_seeds=2, N_train=150, period=100)
    out = runner.train_multiseed(m, workdir=str(tmp_path), n_episodes=150)
    assert len(out) == 2
    assert os.path.isdir(os.path.join(str(tmp_path), "saved", "t1_1"))
    assert os.path.isdir(os.path.join(str(tmp_path), "saved", "t1_2"))


def test_per_episode_log_stream(tmp_path):
    """Sampled per-episode log.csv (reference train_offpolicy.py:208-218,
    399-403): completed-episode returns stream out of the device ring."""
    import csv
    import os

    from cm3_tpu.train import runner

    m = runner.cfgmod.load_json("master.json")
    m.update(experiment="checkers", stage=1, n_envs=8, dir_name="eplog",
             seed=3, N_train=120, period=40, N_eval=4,
             pretrain_episodes=10, batch_size=16, buffer_size=512,
             steps_per_train=4, updates_per_chunk=1, episode_log=256)
    wd = str(tmp_path)
    runner.train_function(m, workdir=wd, verbose=False)
    path = os.path.join(wd, "log", "eplog", "log.csv")
    assert os.path.isfile(path)
    rows = list(csv.DictReader(open(path)))
    assert len(rows) >= 80  # most episodes stream out (ring > period)
    eps = [int(r["Episode"]) for r in rows]
    assert eps == sorted(eps) and len(set(eps)) == len(eps)
    assert all("r_0" in r and "r_global" in r for r in rows)
