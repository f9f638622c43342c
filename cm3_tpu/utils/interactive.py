"""Interactive manual test harness.

The reference ships a keyboard driver for the particle env
(``multiagent-particle-envs/test.py`` + ``bin/interactive.py``): print
state, read comma-separated action indices, step, render.  Same here for
all three envs, headless (ASCII rendering).

Usage:
    python -m cm3_tpu.utils.interactive --experiment checkers [--stage 2]

Actions: 0=stay/noop 1=up/-x/acc 2=down/+x/dec 3=left/-y 4=right/+y
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from cm3_tpu.core import config as cfgmod
from cm3_tpu.envs import render
from cm3_tpu.envs.checkers import Checkers
from cm3_tpu.envs.particle import Particle
from cm3_tpu.envs.roadway import Roadway
from cm3_tpu.train.experiments import make_hooks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", default="checkers",
                   choices=["checkers", "particle", "roadway"])
    p.add_argument("--stage", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.experiment == "checkers":
        env = Checkers(cfgmod.checkers_env_config(args.stage))
    elif args.experiment == "particle":
        name = "stage1" if args.stage == 1 else "stage2_merge"
        env = Particle(cfgmod.particle_env_config(name))
    else:
        env = Roadway(cfgmod.roadway_env_config(args.stage))

    hooks = make_hooks(args.experiment, env)
    n = hooks.n_agents
    step = jax.jit(env.step)
    state, ts, goals = hooks.episode_init(jax.random.PRNGKey(args.seed))
    print(f"{args.experiment} stage {args.stage}: {n} agents, goals=\n"
          f"{np.asarray(goals)}")

    def draw(state):
        if args.experiment == "checkers":
            print(render.render_checkers(state))
        elif args.experiment == "particle":
            print(render.render_particle(state))
        else:
            print(render.render_roadway(state, env.cfg))

    draw(state)
    t = 0
    while True:
        try:
            raw = input(f"[t={t}] actions for {n} agents "
                        "(comma-separated, q to quit): ").strip()
        except EOFError:
            break
        if raw.lower() in ("q", "quit", "exit"):
            break
        try:
            acts = [int(v) for v in raw.split(",")] if raw else [0] * n
            assert len(acts) == n
        except (ValueError, AssertionError):
            print(f"need {n} comma-separated ints in [0,4]")
            continue
        state, ts = step(state, jnp.asarray(acts))
        t += 1
        draw(state)
        print("reward", np.asarray(ts.reward_local), "done", bool(ts.done))
        if bool(ts.done):
            print("episode done — resetting")
            state, ts, goals = hooks.episode_init(
                jax.random.PRNGKey(args.seed + t))
            t = 0
            draw(state)


if __name__ == "__main__":
    main()
