"""Smoke the pod benchmark harness on the virtual 8-device CPU mesh.

The ``fused`` pod bench needs a real TPU (compiled Pallas); ``grid`` and
``train`` — the XLA paths — must compile and execute sharded over the
mesh exactly as they would on a slice.
"""

import pytest

pytestmark = [pytest.mark.slow]


import sys

import jax

sys.path.insert(0, "scripts")

from cm3_tpu.parallel import mesh as meshmod  # noqa: E402
import bench_pod  # noqa: E402


def test_bench_grid_sharded():
    mesh = meshmod.make_mesh(8)
    v = bench_pod.bench_grid(mesh, per_device_batch=16, steps=8, reps=1)
    assert v > 0


def test_bench_train_sharded():
    mesh = meshmod.make_mesh(8)
    v = bench_pod.bench_train(mesh, per_device_envs=8, reps=1)
    assert v > 0
