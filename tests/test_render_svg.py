"""Animated-SVG episode rendering (the reference's pyglet viewer row,
multiagent/rendering.py, served headlessly)."""

import xml.etree.ElementTree as ET

import jax
import numpy as np
import pytest

from cm3_tpu.algs.cm3 import CM3
from cm3_tpu.core.config import (AlgConfig, CheckersEnvConfig,
                                 ParticleEnvConfig, RoadwayEnvConfig)
from cm3_tpu.envs import render as rndr
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.envs.particle import Particle
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.train.experiments import make_hooks

SVG = "{http://www.w3.org/2000/svg}"


def _check_svg(svg: str, min_animates: int):
    root = ET.fromstring(svg)          # well-formed XML
    assert root.tag == f"{SVG}svg"
    animates = root.iter(f"{SVG}animate")
    n = sum(1 for _ in animates)
    assert n >= min_animates, f"{n} < {min_animates} animate elements"
    return root


def _collect(experiment, env, n_agents, stage=2):
    hooks = make_hooks(experiment, env)
    alg = CM3(experiment, env.spec(),
              AlgConfig(n_agents=n_agents, stage=stage))
    key = jax.random.PRNGKey(0)
    _, ts0, goals = hooks.episode_init(key)
    obs = jax.tree_util.tree_map(lambda x: x[None], ts0.obs)
    state = jax.tree_util.tree_map(lambda x: x[None], ts0.state)
    ts = alg.init_state(key, obs, state, goals[None])
    states = rndr.collect_episode(hooks, alg, ts, key, max_steps=12)
    assert 2 <= len(states) <= 13
    return states


def test_checkers_episode_svg():
    env = Checkers(CheckersEnvConfig(n_agents=2, agents_r=(0, 2),
                                     agents_c=(8, 8), max_steps=50))
    states = _collect("checkers", env, 2)
    svg = rndr.render_episode_svg("checkers", states)
    # 2 agents x (cx, cy) + reward-cell opacity animations
    _check_svg(svg, 2 * 2 + 10)


def test_particle_episode_svg():
    env = Particle(ParticleEnvConfig())
    states = _collect("particle", env, 4)
    svg = rndr.render_episode_svg("particle", states)
    # 4 agents x 2 + 4 landmarks x 2
    _check_svg(svg, 16)


def test_roadway_episode_svg():
    cfg = RoadwayEnvConfig()
    env = Roadway(cfg)
    states = _collect("roadway", env, 2)
    svg = rndr.render_episode_svg("roadway", states, cfg)
    # 2 cars x (x, y, fill, opacity)
    root = _check_svg(svg, 8)
    # road geometry: 3 interior lane-divider lines
    assert sum(1 for _ in root.iter(f"{SVG}line")) == cfg.n_lanes - 1


def test_runner_render_episodes_entry(tmp_path):
    from cm3_tpu.train import runner
    m = runner.cfgmod.load_json("master.json")
    m.update(experiment="checkers", stage=2, n_envs=4, dir_name="rdr",
             train_from_nothing=1, seed=3)
    _, alg, hooks, _ = runner.build(m)
    key = jax.random.PRNGKey(3)
    _, ts0, goals = hooks.episode_init(key)
    obs = jax.tree_util.tree_map(lambda x: x[None], ts0.obs)
    state = jax.tree_util.tree_map(lambda x: x[None], ts0.state)
    ts = alg.init_state(key, obs, state, goals[None])
    paths = runner.render_episodes(m, ts, str(tmp_path), n_episodes=2)
    assert len(paths) == 2
    for p in paths:
        _check_svg(open(p).read(), 4)


def test_render_index_html(tmp_path):
    """scripts/render_index.py builds a browsable index embedding every
    episode SVG below the root (the reference-viewer-session surface)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.render_index import build_index

    run = tmp_path / "run_a"
    run.mkdir()
    (run / "episode_0.svg").write_text("<svg></svg>")
    (tmp_path / "root.svg").write_text("<svg></svg>")
    out = build_index(str(tmp_path))
    html_text = open(out).read()
    assert "run_a/episode_0.svg" in html_text
    assert "root.svg" in html_text
    assert html_text.count("<object") == 2
    # empty root -> None
    empty = tmp_path / "empty"
    empty.mkdir()
    assert build_index(str(empty)) is None
