"""Auxiliary subsystems: metric store, profiling, debug guards, checkpoint."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.eval.statistics import CarStatistics
from lidar_object_detection_tpu.eval.store import MetricStore
from lidar_object_detection_tpu.utils import (
    StageTimer, ThroughputMeter, assert_finite, jit_eager_parity)


def _row(frame, car, total=100, inside=80):
    return CarStatistics(frame, car, 0, total, inside, total - inside,
                         round(inside / total * 100, 2),
                         round(100 - inside / total * 100, 2))


def test_metric_store_idempotent(tmp_path):
    path = str(tmp_path / "store.jsonl")
    store = MetricStore(path)
    store.update_frame(100, [_row(100, 0), _row(100, 1)])
    store.update_frame(110, [_row(110, 0)])
    assert store.frames == [100, 110]
    assert len(store.rows()) == 3

    # rerun frame 100 with different results -> replaced, not duplicated
    store.update_frame(100, [_row(100, 0, total=50, inside=25)])
    assert len(store.rows()) == 2
    reloaded = MetricStore(path)
    assert len(reloaded.rows()) == 2
    assert reloaded.rows()[0]["total_points"] == 50

    csv_path = str(tmp_path / "master.csv")
    reloaded.export_csv(csv_path)
    lines = open(csv_path).read().strip().split("\n")
    assert lines[0].startswith("frame,car_id,matched_bbox_id")
    assert len(lines) == 3


def test_stage_timer():
    t = StageTimer(barrier=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b") as h:
        h.append(jnp.ones(4))
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "TOTAL" in t.report()


def test_throughput_meter():
    m = ThroughputMeter(warmup=1)
    m.record(10, 100.0)   # warmup, excluded
    m.record(10, 1.0)
    m.record(10, 1.0)
    assert m.frames_per_sec == pytest.approx(10.0)


def test_jit_eager_parity_detects_good_and_bad():
    ok = jit_eager_parity(lambda x: x * 2 + 1, jnp.arange(8.0))
    assert ok["ok"]


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)})
    with pytest.raises(FloatingPointError):
        assert_finite({"a": jnp.asarray([1.0, jnp.nan])})


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from lidar_object_detection_tpu.models.yolo.model import YoloConfig
    from lidar_object_detection_tpu.parallel import YoloTrainer, make_mesh
    from lidar_object_detection_tpu.parallel.checkpoint import CheckpointManager

    mesh = make_mesh(jax.devices()[:1])
    trainer = YoloTrainer(YoloConfig(scale="n", num_classes=4, segment=False),
                          mesh, image_size=(32, 32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.restore(trainer.state) is None

    mgr.save(0, trainer.state)
    assert mgr.latest_step() == 0
    restored = mgr.restore(trainer.state)
    assert restored is not None
    k0 = jax.tree_util.tree_leaves(trainer.state.variables)[0]
    k1 = jax.tree_util.tree_leaves(restored.variables)[0]
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))
    assert int(restored.step) == int(trainer.state.step)


def test_compilation_cache_cpu_keyed_by_host(monkeypatch, tmp_path):
    """CPU cache entries embed host machine code; the cache dir must be
    keyed by the host CPU signature so a shared dir can never serve an
    executable compiled on a different host (MULTICHIP_r04 SIGILL risk)."""
    import jax

    from lidar_object_detection_tpu.utils import cache as cache_mod

    prev_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("LIDAR_TPU_COMPILE_CACHE", str(tmp_path / "xla"))
    # conftest pins jax_platforms to cpu for the suite
    assert cache_mod._effective_platform() == "cpu"
    tag = cache_mod._host_cpu_tag()
    assert tag and "/" not in tag
    cache_mod.enable_compilation_cache()
    configured = jax.config.jax_compilation_cache_dir
    assert configured == str(tmp_path / "xla" / f"cpu-{tag}")
    assert os.path.isdir(configured)

    # non-cpu platforms keep the shared directory (TPU executables are
    # not host-CPU-dependent; cross-host warmth is desirable there)
    monkeypatch.setattr(cache_mod, "_effective_platform", lambda: "tpu")
    cache_mod.enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")

    # leave the session's cache where the suite had it
    jax.config.update("jax_compilation_cache_dir", prev_dir)
