"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
from lidar_object_detection_tpu.fusion import FusionParams, fuse_frame
from lidar_object_detection_tpu.models.stub import StubDetector
from lidar_object_detection_tpu.models.yolo.model import YoloConfig
from lidar_object_detection_tpu.parallel import (
    make_mesh, point_sharded_fuse_frame, sharded_fuse_batch, YoloTrainer,
    param_shardings)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_mesh(model_parallel=2)    # 4 x 2 (data, model)


@pytest.fixture(scope="module")
def frame_inputs(dataset):
    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    params = FusionParams.from_config(cfg)
    recs = dataset.load_frames([100, 250, 360, 570])
    batch = dataset.make_batch(recs)
    det = StubDetector(dataset.camera).detect_records(recs)
    calib = (dataset.transforms.velo_to_rect.astype(np.float32),
             dataset.transforms.cam_to_velo.astype(np.float32),
             dataset.camera.intrinsics.astype(np.float32))
    return params, batch, det, calib


def test_data_parallel_fuse_matches_single(frame_inputs, mesh8):
    params, batch, det, calib = frame_inputs
    arrays = (batch.points, batch.point_valid, det["mask_bits"],
              det["det_valid"], batch.corners_cam0, batch.box_valid)
    out_sharded = sharded_fuse_batch(mesh8, arrays, calib, params)

    # single-device reference
    from lidar_object_detection_tpu.fusion import fuse_batch
    out_ref = fuse_batch(*[jnp.asarray(a) for a in arrays],
                         *[jnp.asarray(c) for c in calib], params=params)
    for key in ("total_points", "points_inside", "best_box", "matched"):
        np.testing.assert_array_equal(np.asarray(out_sharded[key]),
                                      np.asarray(out_ref[key]))
    # outputs are actually sharded over the data axis
    shard_devs = {s.device for s in out_sharded["counts"].addressable_shards}
    assert len(shard_devs) == 8


# a 32k real-point slice keeps the CPU compile tractable (the full 131k
# scan made these two tests the slowest in the suite); parity is
# shape-independent -- both sides see the identical slice
_PS_POINTS = 32768


def test_point_sharded_fuse_matches_single(frame_inputs, mesh8):
    params, batch, det, calib = frame_inputs
    i, p = 0, _PS_POINTS
    out_ps = point_sharded_fuse_frame(
        mesh8, jnp.asarray(batch.points[i][:p]),
        jnp.asarray(batch.point_valid[i][:p]),
        jnp.asarray(det["mask_bits"][i]), jnp.asarray(det["det_valid"][i]),
        jnp.asarray(batch.corners_cam0[i]), jnp.asarray(batch.box_valid[i]),
        *calib, params=params)
    out_ref = fuse_frame(
        jnp.asarray(batch.points[i][:p]),
        jnp.asarray(batch.point_valid[i][:p]),
        jnp.asarray(det["mask_bits"][i]), jnp.asarray(det["det_valid"][i]),
        jnp.asarray(batch.corners_cam0[i]), jnp.asarray(batch.box_valid[i]),
        jnp.asarray(calib[0]), jnp.asarray(calib[1]), jnp.asarray(calib[2]),
        params)
    for key in ("counts", "total_points", "best_box", "points_inside",
                "matched"):
        np.testing.assert_array_equal(np.asarray(out_ps[key]),
                                      np.asarray(out_ref[key]))


def test_point_sharded_fuse_matches_single_with_erosion(frame_inputs, mesh8,
                                                        dataset):
    """Erosion-enabled configs (V3/CSV_EVAL) must agree too: the packed mask
    erodes once on the replicated image before the point shard_map."""
    _, batch, det, calib = frame_inputs
    params = FusionParams.from_config(
        FusionConfig.for_version(PipelineVersion.V3_EROSION))
    i, p = 0, _PS_POINTS
    args = (jnp.asarray(batch.points[i][:p]),
            jnp.asarray(batch.point_valid[i][:p]),
            jnp.asarray(det["mask_bits"][i]), jnp.asarray(det["det_valid"][i]),
            jnp.asarray(batch.corners_cam0[i]), jnp.asarray(batch.box_valid[i]))
    out_ps = point_sharded_fuse_frame(mesh8, *args, *calib, params=params)
    out_ref = fuse_frame(*args, jnp.asarray(calib[0]), jnp.asarray(calib[1]),
                         jnp.asarray(calib[2]), params)
    for key in ("counts", "total_points", "best_box", "points_inside",
                "matched"):
        np.testing.assert_array_equal(np.asarray(out_ps[key]),
                                      np.asarray(out_ref[key]))


def test_param_shardings_rule(mesh8):
    variables = {"params": {
        "layer0": {"conv": {"kernel": jnp.zeros((3, 3, 3, 16))},
                   "bn": {"scale": jnp.zeros((16,))}}}}
    sh = param_shardings(mesh8, variables)
    kspec = sh["params"]["layer0"]["conv"]["kernel"].spec
    assert kspec == jax.sharding.PartitionSpec(None, None, None, "model")
    bspec = sh["params"]["layer0"]["bn"]["scale"].spec
    assert bspec == jax.sharding.PartitionSpec()


@pytest.fixture(scope="module")
def det_trainer(mesh8):
    """One compiled detection trainer shared by the descent tests (the
    train-step compile is the suite's single biggest CPU cost)."""
    cfg = YoloConfig(scale="n", num_classes=8, segment=False)
    return YoloTrainer(cfg, mesh8, image_size=(64, 64), learning_rate=5e-3)


def _det_targets():
    return {
        "boxes": np.tile(np.array([[[8, 8, 40, 40], [20, 20, 60, 56]]],
                                  np.float32), (4, 1, 1)),
        "classes": np.tile(np.array([[2, 5]], np.int32), (4, 1)),
        "valid": np.ones((4, 2), bool),
    }


def test_trainer_step_runs_and_descends(det_trainer):
    trainer = det_trainer
    rng = np.random.default_rng(0)
    images = rng.random((4, 64, 64, 3), np.float32)
    targets = _det_targets()
    step0 = int(trainer.state.step)
    m0 = trainer.train_step(images, targets)
    losses = [float(m0["loss"])]
    for _ in range(2):
        m = trainer.train_step(images, targets)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(trainer.state.step) == step0 + 3


def test_trainer_ema_tracks_weights(mesh8):
    """ema_decay keeps a device-resident EMA copy: after a step it differs
    from both the init and the raw weights, and sits between them (the
    serving-fidelity lever for the distill retrain)."""
    cfg = YoloConfig(scale="n", num_classes=8, segment=False)
    trainer = YoloTrainer(cfg, mesh8, image_size=(64, 64),
                          learning_rate=5e-2, ema_decay=0.9)
    leaf = lambda vs: np.asarray(
        jax.tree_util.tree_leaves(vs["params"])[0], np.float64)
    init = leaf(trainer.state.variables)
    assert trainer.state.ema_variables is not None
    rng = np.random.default_rng(0)
    images = rng.random((4, 64, 64, 3), np.float32)
    targets = _det_targets()
    # replay the recurrence on host: ema <- ema*d + w*(1-d) with the
    # warmup ramp d = min(decay, (1+step)/(10+step))
    expect = init.copy()
    for _ in range(2):
        trainer.train_step(images, targets)
        step = int(trainer.state.step)
        d = min(0.9, (1.0 + step) / (10.0 + step))
        expect = expect * d + leaf(trainer.state.variables) * (1.0 - d)
    raw = leaf(trainer.state.variables)
    ema = leaf(trainer.state.ema_variables)
    assert not np.allclose(ema, raw)
    assert not np.allclose(ema, init)
    np.testing.assert_allclose(ema, expect, rtol=1e-5, atol=1e-7)

    # disabled by default: no EMA copy, no extra memory
    t2 = YoloTrainer(cfg, mesh8, image_size=(64, 64))
    assert t2.state.ema_variables is None


def test_trainer_loss_parts(mesh8):
    from lidar_object_detection_tpu.parallel import detection_loss

    lvl = [(8, 8), (4, 4), (2, 2)]
    outputs = {
        "box": [jnp.zeros((2, h, w, 64)) for h, w in lvl],
        "cls": [jnp.zeros((2, h, w, 8)) for h, w in lvl],
    }
    targets = {
        "boxes": jnp.asarray(np.tile([[10.0, 10, 30, 30]], (2, 1, 1))),
        "classes": jnp.full((2, 1), 3, jnp.int32),
        "valid": jnp.ones((2, 1), bool),
    }
    total, parts = detection_loss(outputs, targets, 8, tuple(lvl))
    assert np.isfinite(float(total))
    assert set(parts) == {"cls", "box", "dfl"}
    # zero-logit cls -> BCE log(2) per entry summed over anchors/classes
    assert float(parts["cls"]) > 0


def test_task_aligned_assign():
    import jax.numpy as jnp
    from lidar_object_detection_tpu.parallel.train import task_aligned_assign

    lvl = ((8, 8), (4, 4), (2, 2))
    n = 64 + 16 + 4
    rng = np.random.default_rng(0)
    cls_logits = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    # perfect predictions: every anchor predicts the first GT box
    gt = np.array([[8.0, 8.0, 40.0, 40.0], [0, 0, 0, 0]], np.float32)
    pred = np.tile(gt[0], (n, 1)).astype(np.float32)
    out = task_aligned_assign(
        cls_logits, jnp.asarray(pred),
        {"boxes": jnp.asarray(gt),
         "classes": jnp.asarray([1, 0], np.int32),
         "valid": jnp.asarray([True, False])}, lvl)
    pos = np.asarray(out["pos"])
    # top-k = 10 center-inside anchors become positives for GT 0
    assert 1 <= pos.sum() <= 10
    assert (np.asarray(out["assigned_gt"])[pos] == 0).all()
    na = np.asarray(out["norm_align"])
    assert na[pos].max() <= 1.0 + 1e-6 and na[pos].max() > 0.5
    assert (na[~pos] == 0).all()


def test_trainer_tal_loss_descends(det_trainer, rng):
    """A fresh random batch through the shared compiled step still
    descends (same jit signature as the first descent test -- no
    recompile)."""
    trainer = det_trainer
    images = rng.random((4, 64, 64, 3), np.float32)
    targets = _det_targets()
    losses = [float(trainer.train_step(images, targets)["loss"])
              for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_seg_mask_loss_trains(mesh8, rng):
    """Training through the full -seg model with GT instance masks: the
    step runs, the seg loss is present and finite, and the combined loss
    descends.  (Also covers the mask-less seg-head case structurally --
    the proto/coef branches are exercised by the same compile.)"""
    cfg = YoloConfig(scale="n", num_classes=4, segment=True)
    trainer = YoloTrainer(cfg, mesh8, image_size=(64, 64), learning_rate=5e-3)
    images = rng.random((4, 64, 64, 3), np.float32)
    # proto resolution = 64/4 = 16
    masks = np.zeros((4, 2, 16, 16), np.float32)
    masks[:, 0, 2:10, 2:10] = 1.0
    masks[:, 1, 5:14, 5:14] = 1.0
    targets = {
        "boxes": np.tile(np.array([[[8, 8, 40, 40], [20, 20, 56, 56]]],
                                  np.float32), (4, 1, 1)),
        "classes": np.tile(np.array([[2, 1]], np.int32), (4, 1)),
        "valid": np.ones((4, 2), bool),
        "masks": masks,
    }
    m0 = trainer.train_step(images, targets)
    assert "seg" in m0 and np.isfinite(float(m0["seg"]))
    losses = [float(m0["loss"])]
    for _ in range(2):
        losses.append(float(trainer.train_step(images, targets)["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(trainer.state.step) == 3


def test_seg_weight_scales_loss(rng):
    from lidar_object_detection_tpu.parallel import detection_loss

    lvl = [(8, 8), (4, 4), (2, 2)]
    n = 64 + 16 + 4
    outputs = {
        "box": [jnp.asarray(rng.normal(size=(2, h, w, 64)), jnp.float32)
                for h, w in lvl],
        "cls": [jnp.asarray(rng.normal(size=(2, h, w, 8)), jnp.float32)
                for h, w in lvl],
        "coef": [jnp.asarray(rng.normal(size=(2, h, w, 32)), jnp.float32)
                 for h, w in lvl],
        "proto": jnp.asarray(rng.normal(size=(2, 16, 16, 32)), jnp.float32),
    }
    masks = np.zeros((2, 1, 16, 16), np.float32)
    masks[:, 0, 3:10, 3:10] = 1.0
    targets = {
        "boxes": jnp.asarray(np.tile([[10.0, 10, 40, 40]], (2, 1, 1))),
        "classes": jnp.full((2, 1), 3, jnp.int32),
        "valid": jnp.ones((2, 1), bool),
        "masks": jnp.asarray(masks),
    }
    t1, p1 = detection_loss(outputs, targets, 8, tuple(lvl), seg_weight=1.0)
    t3, p3 = detection_loss(outputs, targets, 8, tuple(lvl), seg_weight=3.0)
    assert float(p1["seg"]) == pytest.approx(float(p3["seg"]), rel=1e-6)
    # f32 cancellation in t3 - t1 leaves ~1e-5 relative noise
    assert float(t3 - t1) == pytest.approx(2.0 * float(p1["seg"]), rel=1e-3)
