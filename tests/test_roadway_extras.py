"""Roadway auxiliary-surface tests: ray-cast occlusion (differential vs
the reference's Observation.occlude), traffic metrics, and the whole-road
global tensor (reference multicar_simple.py:117-301,
observation.py:180-303)."""

import dataclasses
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3_tpu.core.config import RoadwayEnvConfig
from cm3_tpu.envs.roadway import (LEFT, NOOP, RIGHT, Roadway, RoadwayState,
                                  occlude)

import reference_oracles as oracles

CFG = RoadwayEnvConfig()


def _state(x, sublane, vel, goal_lane, removed=None, terminal=None,
           collided=None, steps=None):
    n = len(x)
    z = jnp.zeros((n,), bool)
    return RoadwayState(
        x=jnp.asarray(x, jnp.float32),
        sublane=jnp.asarray(sublane, jnp.int32),
        vel=jnp.asarray(vel, jnp.float32),
        steps=jnp.zeros((n,), jnp.int32) if steps is None
        else jnp.asarray(steps, jnp.int32),
        goal_lane=jnp.asarray(goal_lane, jnp.int32),
        terminal=z if terminal is None else jnp.asarray(terminal, bool),
        collided=z if collided is None else jnp.asarray(collided, bool),
        removed=z if removed is None else jnp.asarray(removed, bool))


# --------------------------------------------------------------------- #
# occlusion: differential vs the reference implementation


def _reference_occlude(occ, relspeed):
    """Run the reference Observation.occlude on a given grid.  The
    reference class is latent-broken as shipped (occlude_cell writes
    mat_signal_left/right that reset_matrices never creates) — patch the
    missing matrices on, exactly as a fixed reference would."""
    obs_mod = oracles.load_module("env/observation.py", "ref_observation")

    class _Veh:
        def getLength(self, eid):
            return 5.0

    sim = types.SimpleNamespace(
        traci=types.SimpleNamespace(vehicle=_Veh()), sublanes_per_lane=4)
    o = obs_mod.Observation(sim, "ego", left=4, right=4, front=15.0,
                            back=15.0, res_forward=2.5, occlusion=True)
    o.mat_occupancy = occ.copy()
    o.mat_relspeed = relspeed.copy()
    o.mat_signal_left = np.zeros_like(occ)
    o.mat_signal_right = np.zeros_like(occ)
    o.occlude()
    return o.mat_occupancy, o.mat_relspeed


@pytest.mark.skipif(not oracles.reference_available(),
                    reason="reference tree not mounted")
def test_occlusion_differential_random_grids():
    rows, cols = CFG.obs_rows, CFG.obs_cols          # 13 x 9
    back = int(round(CFG.obs_back / CFG.res_forward))
    num_ego = int(round(CFG.car_length / CFG.res_forward))
    rng = np.random.default_rng(0)
    jit_occ = jax.jit(lambda o, r: occlude(
        o, r, back=back, front=rows - back - 1, num_ego_cells=num_ego,
        c_self=CFG.obs_left))
    for trial in range(200):
        density = rng.uniform(0.05, 0.6)
        occ = (rng.random((rows, cols)) < density).astype(float)
        # ego's own cells, as update() would populate them
        occ[back - num_ego + 1:back + 1, CFG.obs_left] = 1.0
        rel = rng.normal(size=(rows, cols))
        ref_occ, ref_rel = _reference_occlude(occ, rel)
        got_occ, got_rel = jit_occ(jnp.asarray(occ, jnp.float32),
                                   jnp.asarray(rel, jnp.float32))
        np.testing.assert_array_equal(np.asarray(got_occ), ref_occ,
                                      err_msg=f"occupancy trial {trial}")
        np.testing.assert_allclose(np.asarray(got_rel), ref_rel,
                                   atol=1e-6,
                                   err_msg=f"relspeed trial {trial}")


def test_occlusion_shadows_behind_leader():
    """A car dead ahead in the ego column shadows everything beyond it."""
    rows, cols = CFG.obs_rows, CFG.obs_cols
    back = int(round(CFG.obs_back / CFG.res_forward))   # 6
    num_ego = 2
    occ = np.zeros((rows, cols), np.float32)
    occ[back - 1:back + 1, 4] = 1.0                     # ego
    occ[back + 2:back + 4, 4] = 1.0                     # leader ahead
    rel = np.zeros((rows, cols), np.float32)
    got, _ = occlude(jnp.asarray(occ), jnp.asarray(rel), back=back,
                     front=rows - back - 1, num_ego_cells=num_ego,
                     c_self=4)
    got = np.asarray(got)
    # first free cell after the leader and everything beyond is shadowed
    assert (got[back + 4:, 4] == -1.0).all()
    # the leader itself is not
    assert (got[back + 2:back + 4, 4] == 1.0).all()


@pytest.mark.slow
def test_occlusion_integrated_in_observe():
    cfg = dataclasses.replace(CFG, occlusion=True, depart_stdev=0.0,
                              n_agents=2, lane=(1, 1), goal_lane=(1, 1),
                              goal_pos=(190.0, 190.0), speed=(30.0, 20.0),
                              init_position=(0.0, 10.0),
                              depart_mean=(0.0, 0.0))
    env = Roadway(cfg)
    state, ts = env.reset(jax.random.PRNGKey(0), None)
    grid = np.asarray(ts.obs["self_t"])
    assert grid.shape == (2, cfg.obs_rows, cfg.obs_cols, 2)
    # rear car sees the leader 2 cells ahead -> cells beyond are shadowed
    assert (grid[0, :, :, 0] == -1.0).any()


# --------------------------------------------------------------------- #
# traffic metrics


def _env(n=2, **kw):
    base = dict(n_agents=n, goal_lane=(3, 0)[:n], goal_pos=(190.0,) * n,
                speed=(30.0,) * n, lane=(1, 2)[:n],
                init_position=(0.0,) * n, depart_mean=(0.0,) * n,
                depart_stdev=0.0)
    base.update(kw)
    return Roadway(RoadwayEnvConfig(**base))


def test_avg_speed_and_sections():
    env = _env(n=3, goal_lane=(0, 0, 0), lane=(0, 0, 2),
               speed=(20.0, 10.0, 29.05), goal_pos=(190.0,) * 3,
               init_position=(0.0, 30.0, 60.0), depart_mean=(0.0,) * 3)
    s = _state([0.0, 30.0, 60.0], [2, 2, 10], [20.0, 10.0, 29.05],
               [0, 0, 0])
    assert float(env.avg_speed(s)) == pytest.approx(
        (20.0 + 10.0 + 29.05) / 3 / 29.05)
    vec = np.asarray(env.avg_speeds(s))
    assert vec[2] == pytest.approx(15.0 / 29.05)    # lane 0 cars
    assert vec[5] == pytest.approx(1.0)             # lane 2 car at vthresh
    assert (vec[[0, 1, 3, 4]] == 1.0).all()         # empty ramp sections
    # removed cars are excluded; empty road -> 1.0
    s2 = _state([0.0, 30.0, 60.0], [2, 2, 10], [20.0, 10.0, 29.05],
                [0, 0, 0], removed=[True, True, True])
    assert float(env.avg_speed(s2)) == pytest.approx(1.0)
    assert (np.asarray(env.avg_speeds(s2)) == 1.0).all()


def test_count_close():
    env = _env(n=3, goal_lane=(0, 0, 0), lane=(0, 0, 0),
               speed=(30.0,) * 3, goal_pos=(190.0,) * 3,
               init_position=(0.0,) * 3, depart_mean=(0.0,) * 3)
    # same lane, bumper gaps 5 m (close) and 45 m (not close)
    s = _state([0.0, 10.0, 60.0], [2, 2, 2], [30.0] * 3, [0, 0, 0])
    assert int(env.count_close(s)) == 1
    # different lanes -> lateral offset >= 3.2 m, never close
    s = _state([0.0, 10.0, 60.0], [2, 6, 10], [30.0] * 3, [0, 0, 0])
    assert int(env.count_close(s)) == 0
    # removed leader doesn't count
    s = _state([0.0, 10.0, 60.0], [2, 2, 2], [30.0] * 3, [0, 0, 0],
               removed=[False, True, False])
    assert int(env.count_close(s)) == 0


def test_count_success_and_remaining():
    env = _env()  # lanes (1,2) -> goals (3,0): both must merge
    goal_sub_a0 = 3 * 4 + 2                          # goal lane 3
    s = _state([191.0, 50.0], [goal_sub_a0, 10], [30.0, 30.0], [3, 0],
               terminal=[True, False], removed=[True, False])
    assert int(env.count_success(s)) == 1
    # collided car never counts
    s2 = _state([191.0, 50.0], [goal_sub_a0, 10], [30.0, 30.0], [3, 0],
                terminal=[True, False], collided=[True, False],
                removed=[True, False])
    assert int(env.count_success(s2)) == 0
    # count_remaining: live cars on lane 0
    s3 = _state([10.0, 50.0], [2, 10], [30.0, 30.0], [3, 0])
    assert int(env.count_remaining(s3)) == 1


def test_global_tensor():
    env = _env()
    cfg = env.cfg
    s = _state([50.0, 100.0], [6, 10], [29.0, 14.5], [3, 0])
    t = np.asarray(env.global_tensor(s, last_actions=[LEFT, NOOP]))
    assert t.shape == (cfg.n_rows, cfg.n_cols, 4)
    # car 0: x=50 -> rows 18..19, col = |0.8*6-12.8|/0.8 = 10
    assert (t[18:20, 10, 0] == 1.0).all()
    assert t[19, 10, 1] == pytest.approx(1.0)        # 29/29
    assert (t[18:20, 10, 2] == 1.0).all()            # left blinker
    # car 1: x=100 -> rows 38..39, col = |0.8*10-12.8|/0.8 = 6
    assert (t[38:40, 6, 0] == 1.0).all()
    assert t[39, 6, 1] == pytest.approx(0.5)
    assert t[39, 6, 2] == 0.0 and t[39, 6, 3] == 0.0
    # occupancy sums to 2 cars x 2 cells
    assert t[:, :, 0].sum() == pytest.approx(4.0)


def test_metrics_jit_and_vmap():
    env = _env()
    s = _state([0.0, 10.0], [2, 2], [30.0, 30.0], [3, 0])
    batched = jax.tree.map(lambda a: jnp.stack([a, a]), s)
    out = jax.jit(jax.vmap(env.count_close))(batched)
    assert out.shape == (2,)
    out2 = jax.jit(jax.vmap(env.avg_speeds))(batched)
    assert out2.shape == (2, 6)
