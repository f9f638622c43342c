"""TensorBoard event-writer tests: the hand-encoded TFRecord/proto stream
must be readable by the real tensorboard package (independent decoder,
CRC-validated), matching the reference's tf.summary surface
(alg_credit.py:362-403, train_offpolicy.py:176)."""

import glob
import os

import numpy as np
import pytest

from cm3_tpu.train import tboard

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader")


def _load_events(log_dir):
    """Independent decode: tensorboard's record reader (validates the
    TFRecord CRCs) + raw Event proto parse (no legacy->tensor
    migration, so simple_value/histo fields are preserved)."""
    from tensorboard.compat.proto import event_pb2
    files = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    assert len(files) == 1
    loader = tb_loader.RawEventFileLoader(files[0])
    return [event_pb2.Event.FromString(rec) for rec in loader.Load()]


def test_scalar_roundtrip(tmp_path):
    w = tboard.SummaryWriter(str(tmp_path))
    w.scalar("loss/Q_global", 0.125, step=100)
    w.scalar("r_eval_global", -3.5, step=200)
    w.close()
    events = _load_events(str(tmp_path))
    assert events[0].file_version == "brain.Event:2"
    vals = {(e.step, v.tag): v.simple_value
            for e in events[1:] for v in e.summary.value}
    assert vals[(100, "loss/Q_global")] == pytest.approx(0.125)
    assert vals[(200, "r_eval_global")] == pytest.approx(-3.5)


def test_histogram_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.normal(0.0, 0.01, size=(64, 32)).astype(np.float32)
    w = tboard.SummaryWriter(str(tmp_path))
    w.histogram("vars/actor/W1", data, step=7)
    w.close()
    (ev,) = _load_events(str(tmp_path))[1:]
    (val,) = ev.summary.value
    assert val.tag == "vars/actor/W1"
    h = val.histo
    assert h.num == pytest.approx(data.size)
    assert h.min == pytest.approx(float(data.min()))
    assert h.max == pytest.approx(float(data.max()))
    assert h.sum == pytest.approx(float(data.sum()), rel=1e-6)
    assert sum(h.bucket) == data.size
    assert len(h.bucket_limit) == len(h.bucket)
    # buckets partition correctly: counts in each (limit[i-1], limit[i]]
    edges = np.concatenate([[-np.inf], np.asarray(h.bucket_limit)])
    counts, _ = np.histogram(data.astype(np.float64).ravel(), edges)
    # allow the final sentinel bucket to absorb the tail
    np.testing.assert_array_equal(counts[:len(h.bucket)], h.bucket)


def test_train_state_histograms(tmp_path):
    import jax
    import jax.numpy as jnp
    ts = {"actor": {"W1": jnp.ones((4, 4)), "b1": jnp.zeros(4)},
          "step": jnp.int32(3)}
    w = tboard.SummaryWriter(str(tmp_path))
    tboard.log_train_state(w, ts, step=1)
    w.close()
    events = _load_events(str(tmp_path))[1:]
    tags = {v.tag for e in events for v in e.summary.value}
    assert any("W1" in t for t in tags)
    assert any("b1" in t for t in tags)
    assert not any("step" in t for t in tags)      # int leaf skipped


@pytest.mark.slow
def test_grad_histograms(tmp_path):
    """update(with_grads=True) exposes raw grad trees; the writer logs
    them under grads/ (reference alg_credit.py:384-403)."""
    import jax
    import jax.numpy as jnp

    from cm3_tpu.algs.cm3 import CM3
    from cm3_tpu.core.config import AlgConfig, CheckersEnvConfig, NNConfig
    from cm3_tpu.envs.checkers import Checkers
    from cm3_tpu.train.experiments import make_hooks
    from cm3_tpu.train.offpolicy import init_rollout

    env = Checkers(CheckersEnvConfig(n_columns=4, agents_r=(0,),
                                     agents_c=(4,), n_agents=1,
                                     max_steps=10))
    alg = CM3("checkers", env.spec(), AlgConfig(n_agents=1, stage=1),
              NNConfig(Q_n_h1_1=16, Q_n_h1_2=8, Q_n_h2=16, A_n_h1=16,
                       A_n_h2=16))
    hooks = make_hooks("checkers", env)
    rs = init_rollout(hooks, jax.random.PRNGKey(0), 4)
    ts = alg.init_state(jax.random.PRNGKey(1), rs.obs, rs.state, rs.goals)

    batch = {
        "obs": rs.obs, "state": rs.state,
        "a": jnp.zeros((4, 1), jnp.int32),
        "a_prev": jnp.zeros((4, 1), jnp.int32),
        "r": jnp.zeros(4), "rl": jnp.zeros((4, 1)),
        "obs_next": rs.obs, "state_next": rs.state,
        "done": jnp.zeros(4, bool), "goals": rs.goals,
    }
    _, metrics = alg.update(ts, batch, 0.1, jax.random.PRNGKey(2),
                            with_grads=True)
    assert "grads" in metrics
    assert set(metrics["grads"]) >= {"Policy", "Q_global"}

    w = tboard.SummaryWriter(str(tmp_path))
    tboard.log_train_state(w, metrics["grads"], step=5, prefix="grads")
    w.close()
    events = _load_events(str(tmp_path))[1:]
    tags = {v.tag for e in events for v in e.summary.value}
    assert any(t.startswith("grads/Policy") for t in tags)
    assert any(t.startswith("grads/Q_global") for t in tags)
