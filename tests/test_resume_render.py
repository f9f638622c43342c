"""Elastic resume + rendering tests."""

import pytest

pytestmark = [pytest.mark.slow]


import os

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core import config as cfgmod
from cm3_tpu.envs import render
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.envs.particle import Particle
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.train import runner


def test_auto_resume(tmp_path):
    m = {
        "experiment": "checkers", "stage": 1, "seed": 1, "dir_name": "r1",
        "alg_name": "cm3", "N_train": 400, "period": 100, "N_eval": 4,
        "epsilon_start": 0.5, "epsilon_end": 0.05, "epsilon_div": 100.0,
        "buffer_size": 1000, "batch_size": 16, "pretrain_episodes": 10,
        "steps_per_train": 10, "max_steps": 33, "prob_random": 0.2,
        "n_envs": 4, "train_from_nothing": 1, "auto_resume": 1,
        "nn": {"Q_units": 32},
    }
    # first (partial) run
    runner.train_function(m, workdir=str(tmp_path), n_episodes=200,
                          verbose=False)
    assert os.path.isdir(os.path.join(str(tmp_path), "saved", "r1",
                                      "model_autosave"))
    # resume continues from the autosaved episode count
    ts, stats = runner.train_function(m, workdir=str(tmp_path),
                                      n_episodes=400, verbose=False)
    assert stats["episodes"] >= 400
    # the resumed run decayed epsilon past a fresh run's first periods
    assert stats["epsilon"] < 0.5


def test_renderers_smoke():
    env = Checkers(cfgmod.checkers_env_config(2))
    st, _ = env.reset(jax.random.PRNGKey(0), jnp.eye(2))
    txt = render.render_checkers(st)
    assert "0" in txt and "1" in txt and "g" in txt and "#" in txt

    penv = Particle(cfgmod.particle_env_config("stage2_merge"))
    ps, _ = penv.reset(jax.random.PRNGKey(0))
    ptxt = render.render_particle(ps)
    assert "0" in ptxt and "A" in ptxt

    renv = Roadway(cfgmod.roadway_env_config(2))
    rs, _ = renv.reset(jax.random.PRNGKey(0), None)
    rtxt = render.render_roadway(rs, renv.cfg)
    assert "0" in rtxt and "1" in rtxt
