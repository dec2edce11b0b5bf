"""PointPillars: voxelization oracle parity, encode/decode round trip,
assignment, loss descent, end-to-end decode on the real fixture."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_object_detection_tpu.models.pointpillars import (
    PillarGridConfig, PillarsConfig, PillarsTrainer, PointPillars,
    anchor_grid, assign_anchors, bev_aabb, corners_to_boxes7, decode_boxes,
    decode_predictions, encode_boxes, pillar_ids, point_features,
    pointpillars_loss, scatter_bev)

TINY_GRID = PillarGridConfig(x_range=(0.0, 20.48), y_range=(-10.24, 10.24),
                             pillar_size=0.32)
TINY = PillarsConfig(grid=TINY_GRID, embed_dim=16,
                     backbone_channels=(16, 32, 64),
                     backbone_layers=(1, 1, 1), up_channels=16)

_ASSIGN_JITS = {}


def assign_jit(gt, gt_valid, cfg):
    """Jitted assign_anchors (eager rotated-IoU over the full anchor grid
    runs ~35 s on this 1-core box; jitted + compile-cached it is ~1 s)."""
    if cfg not in _ASSIGN_JITS:
        _ASSIGN_JITS[cfg] = jax.jit(lambda g, v: assign_anchors(g, v, cfg))
    return _ASSIGN_JITS[cfg](gt, gt_valid)


def test_grid_dims():
    assert (TINY_GRID.nx, TINY_GRID.ny) == (64, 64)
    std = PillarGridConfig()
    assert (std.nx, std.ny) == (432, 496)


def test_pillar_ids_oracle(rng):
    pts = rng.uniform(-15, 25, (500, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4, 2, 500)     # mostly inside the z range
    valid = rng.random(500) > 0.1
    ids, in_grid = pillar_ids(jnp.asarray(pts), jnp.asarray(valid), TINY_GRID)
    ids, in_grid = np.asarray(ids), np.asarray(in_grid)
    g = TINY_GRID
    for i in range(500):
        x, y, z = pts[i, :3]
        ix = int(np.floor((x - g.x_range[0]) / g.pillar_size))
        iy = int(np.floor((y - g.y_range[0]) / g.pillar_size))
        ok = (valid[i] and 0 <= ix < g.nx and 0 <= iy < g.ny
              and g.z_range[0] <= z <= g.z_range[1])
        assert in_grid[i] == ok
        if ok:
            assert ids[i] == iy * g.nx + ix
    assert in_grid.sum() > 50


def test_point_features_means(rng):
    # two points in the same pillar: mean offsets are symmetric
    g = TINY_GRID
    pts = np.array([[1.00, 0.10, -1.0, 0.5],
                    [1.10, 0.20, -1.2, 0.3]], np.float32)
    feats, ids, in_grid = point_features(
        jnp.asarray(pts), jnp.ones(2, bool), g)
    feats = np.asarray(feats)
    assert np.asarray(in_grid).all()
    assert np.asarray(ids)[0] == np.asarray(ids)[1]
    np.testing.assert_allclose(feats[0, 4:7], -feats[1, 4:7], atol=1e-6)
    # center offsets within +/- half pillar
    assert np.all(np.abs(feats[:, 7:9]) <= g.pillar_size / 2 + 1e-6)


def test_scatter_bev_max(rng):
    g = TINY_GRID
    pts = np.array([[1.0, 0.1, -1.0, 0.0], [1.05, 0.15, -1.0, 0.0],
                    [5.0, 5.0, -1.0, 0.0]], np.float32)
    feats, ids, in_grid = point_features(jnp.asarray(pts),
                                         jnp.ones(3, bool), g)
    emb = jnp.asarray(np.array([[1.0, 2.0], [3.0, 0.5], [7.0, 7.0]],
                               np.float32))
    bev = np.asarray(scatter_bev(emb, ids, in_grid, g))[0]
    iy0, ix0 = divmod(int(np.asarray(ids)[0]), g.nx)
    np.testing.assert_allclose(bev[iy0, ix0], [3.0, 2.0])  # per-channel max
    assert bev.sum() == pytest.approx(3 + 2 + 7 + 7)


def test_encode_decode_roundtrip(rng):
    cfg = TINY
    anchors = np.asarray(anchor_grid(cfg)).reshape(-1, 7)
    idx = rng.integers(0, len(anchors), 50)
    gt = anchors[idx].copy()
    gt[:, :3] += rng.normal(0, 1.0, (50, 3))
    gt[:, 3:6] *= rng.uniform(0.8, 1.2, (50, 3))
    gt[:, 6] += rng.uniform(-0.5, 0.5, 50)
    enc = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors[idx]))
    dec = np.asarray(decode_boxes(enc, jnp.asarray(anchors[idx])))
    np.testing.assert_allclose(dec, gt, rtol=1e-5, atol=1e-5)


def test_corners_to_boxes7(dataset, frame100):
    from lidar_object_detection_tpu.geom.boxes import transform_corners

    corners_velo = np.asarray(transform_corners(
        jnp.asarray(frame100.corners_cam0),
        jnp.asarray(dataset.transforms.cam_to_velo)))
    boxes7 = np.asarray(corners_to_boxes7(corners_velo))
    # car-sized boxes
    assert (boxes7[:, 3] > 0.5).all() and (boxes7[:, 3] < 4).all()
    assert (boxes7[:, 4] > 1.0).all() and (boxes7[:, 4] < 8).all()
    assert (boxes7[:, 5] > 0.5).all() and (boxes7[:, 5] < 4).all()
    # reconstruct corners from box7 -> same AABB as original
    b = boxes7[0]
    aabb = np.asarray(bev_aabb(jnp.asarray(boxes7)))[0]
    assert aabb[0] < b[0] < aabb[2] and aabb[1] < b[1] < aabb[3]


def test_assignment_finds_gt(rng):
    cfg = TINY
    anchors = np.asarray(anchor_grid(cfg)).reshape(-1, 7)
    gt = np.zeros((4, 7), np.float32)
    gt[0] = anchors[100]            # exact anchor match
    gt[1] = anchors[500]
    gt_valid = np.array([True, True, False, False])
    out = assign_jit(jnp.asarray(gt), jnp.asarray(gt_valid), cfg)
    pos = np.asarray(out["pos"])
    matched = np.asarray(out["matched"])
    assert pos[100] and matched[100] == 0
    assert pos[500] and matched[500] == 1
    assert pos.sum() >= 2
    assert np.asarray(out["neg"]).sum() > len(anchors) * 0.9


def test_forward_shapes_and_loss_descends(rng):
    cfg = TINY
    from lidar_object_detection_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:2], model_parallel=1)
    trainer = PillarsTrainer(cfg, mesh, num_points=2048, learning_rate=3e-3)

    pts = rng.uniform(0, 20, (2, 2048, 4)).astype(np.float32)
    pts[..., 1] -= 10
    pts[..., 2] = rng.uniform(-2, 0, (2, 2048))
    valid = np.ones((2, 2048), bool)
    gt = np.zeros((2, 8, 7), np.float32)
    gt[:, 0] = [10.0, 0.0, -1.0, 1.6, 3.9, 1.56, 0.3]
    gt[:, 1] = [5.0, -3.0, -1.0, 1.6, 3.9, 1.56, -1.2]
    gt_cls = np.zeros((2, 8), np.int32)
    gt_valid = np.zeros((2, 8), bool)
    gt_valid[:, :2] = True

    out = trainer.apply(pts, valid)
    h, w = cfg.grid.ny // 2, cfg.grid.nx // 2
    assert out["cls"].shape == (2, h, w, 2, 1)
    assert out["box"].shape == (2, h, w, 2, 7)
    assert out["dir"].shape == (2, h, w, 2, 2)

    losses = [float(trainer.train_step(pts, valid, gt, gt_cls, gt_valid)["loss"])
              for _ in range(3)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_decode_predictions_sanity():
    cfg = TINY
    h, w, a = cfg.grid.ny // 2, cfg.grid.nx // 2, cfg.num_anchors
    outputs = {
        "cls": np.full((h, w, a, 1), -9.0, np.float32),
        "box": np.zeros((h, w, a, 7), np.float32),
        "dir": np.zeros((h, w, a, 2), np.float32),
    }
    outputs["cls"][10, 12, 0, 0] = 4.0     # one confident anchor
    det = decode_predictions({k: jnp.asarray(v) for k, v in outputs.items()},
                             cfg, score_threshold=0.3)
    valid = np.asarray(det["valid"])
    assert valid.sum() == 1
    box = np.asarray(det["boxes7"])[0]
    anchors = np.asarray(anchor_grid(cfg))
    np.testing.assert_allclose(box, anchors[10, 12, 0], atol=1e-5)
    assert float(np.asarray(det["scores"])[0]) == pytest.approx(
        1 / (1 + np.exp(-4.0)))


def test_masked_batchnorm_excludes_padding(rng):
    import jax
    from lidar_object_detection_tpu.models.pointpillars.model import (
        MaskedBatchNorm)

    x = rng.normal(3.0, 2.0, (1000, 8)).astype(np.float32)
    mask = np.zeros(1000, bool)
    mask[:400] = True
    x[~mask] = 0.0
    bn = MaskedBatchNorm(momentum=0.0)   # running stats = batch stats
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask), train=True)
    y, updates = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                          train=True, mutable=["batch_stats"])
    mean = np.asarray(updates["batch_stats"]["mean"])
    # statistics computed over VALID rows only (mean ~3, not 3*0.4)
    np.testing.assert_allclose(mean, x[mask].mean(0), rtol=1e-4, atol=1e-4)
    yv = np.asarray(y)[mask]
    np.testing.assert_allclose(yv.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(yv.std(0), 1.0, atol=1e-2)
    # eval mode uses the running stats
    y2 = bn.apply({"params": variables["params"],
                   "batch_stats": updates["batch_stats"]},
                  jnp.asarray(x), jnp.asarray(mask), train=False)
    np.testing.assert_allclose(np.asarray(y2)[mask].mean(0), 0.0, atol=1e-3)


# ------------------------------------------------------------ augmentation

def _frame_boxes7(dataset, rec):
    from lidar_object_detection_tpu.geom.boxes import transform_corners

    corners_velo = np.asarray(transform_corners(
        jnp.asarray(rec.corners_cam0.astype(np.float32)),
        jnp.asarray(dataset.transforms.cam_to_velo.astype(np.float32))))
    return np.asarray(corners_to_boxes7(corners_velo), np.float32)


def test_points_in_box7_matches_oriented_test(dataset, frame100):
    """The host-side rotated inside test agrees with the device oracle on
    real boxes (same corner-derived geometry)."""
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        points_in_box7)
    from lidar_object_detection_tpu.ops.rotated_iou import box7_to_bev_corners

    boxes7 = _frame_boxes7(dataset, frame100)
    pts = frame100.points.astype(np.float32)
    b = boxes7[0]
    mask = points_in_box7(pts, b)
    # every selected point's BEV position is inside the rotated rectangle
    corners = np.asarray(box7_to_bev_corners(jnp.asarray(b[None])))[0]
    for p in pts[mask][:50]:
        # inside iff on the left of every CCW edge (within epsilon)
        for k in range(4):
            a, c = corners[k], corners[(k + 1) % 4]
            cross = (c[0] - a[0]) * (p[1] - a[1]) - (c[1] - a[1]) * (p[0] - a[0])
            assert cross >= -1e-3
        assert b[2] - b[5] / 2 - 1e-5 <= p[2] <= b[2] + b[5] / 2 + 1e-5


def test_gt_database_and_paste(dataset):
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        GtDatabase, points_in_box7, sample_paste)

    recs = dataset.load_frames([100, 250], require_image=False)
    frames = [(r.points.astype(np.float32), _frame_boxes7(dataset, r))
              for r in recs]
    db = GtDatabase.build(frames)
    assert len(db) >= 10
    for s in db.samples[:5]:
        assert points_in_box7(s.points, s.box7).all()
        assert len(s.points) >= 8

    rng = np.random.default_rng(0)
    pts, boxes = frames[0]
    new_pts, new_boxes = sample_paste(pts, boxes, db, rng, max_samples=8)
    added = new_boxes.shape[0] - boxes.shape[0]
    assert added >= 1
    # every pasted box is collision-free vs the originals (BEV AABB)
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        _aabb_overlaps, _bev_aabb_np)
    ov = _aabb_overlaps(_bev_aabb_np(new_boxes[boxes.shape[0]:]),
                        _bev_aabb_np(boxes))
    assert not ov.any()
    # pasted cars brought their points along
    for b in new_boxes[boxes.shape[0]:]:
        assert points_in_box7(new_pts, b).sum() >= 8


def test_global_augment_consistency(dataset, frame100, rng):
    """Rotation/flip/scale move points and boxes together: membership of
    points in their boxes is invariant."""
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        global_augment, points_in_box7)

    boxes7 = _frame_boxes7(dataset, frame100)
    pts = frame100.points.astype(np.float32)
    before = [points_in_box7(pts, b) for b in boxes7[:10]]
    for trial in range(3):
        g = np.random.default_rng(trial)
        new_pts, new_boxes = global_augment(pts, boxes7, g)
        assert new_pts.shape == pts.shape
        for mask, b in zip(before, new_boxes[:10]):
            after = points_in_box7(new_pts, b, margin=1e-3)
            assert (mask == after).mean() > 0.999, trial
        # reflectance untouched
        np.testing.assert_array_equal(new_pts[:, 3], pts[:, 3])


def test_assignment_rotated_vs_aabb_on_axis_aligned_gt(rng):
    """For axis-aligned GT equal to anchors, rotated and AABB assignment
    agree (sanity that the default rotated path didn't change semantics
    where the approximation was exact)."""
    import dataclasses as dc

    cfg_rot = TINY
    cfg_aabb = dc.replace(TINY, assign_iou="aabb")
    anchors = np.asarray(anchor_grid(TINY)).reshape(-1, 7)
    gt = np.stack([anchors[100], anchors[501]]).astype(np.float32)
    gt_valid = np.ones(2, bool)
    out_r = assign_jit(jnp.asarray(gt), jnp.asarray(gt_valid), cfg_rot)
    out_a = assign_jit(jnp.asarray(gt), jnp.asarray(gt_valid), cfg_aabb)
    np.testing.assert_array_equal(np.asarray(out_r["pos"]),
                                  np.asarray(out_a["pos"]))
    np.testing.assert_array_equal(np.asarray(out_r["matched"]),
                                  np.asarray(out_a["matched"]))


def test_assignment_rotated_distinguishes_yaw(rng):
    """A GT rotated 45 degrees overlaps the axis-aligned anchor much less
    under exact IoU than under the AABB approximation -- the rotated
    assigner must NOT mark distant diagonal anchors positive."""
    import dataclasses as dc

    anchors = np.asarray(anchor_grid(TINY)).reshape(-1, 7)
    gt = anchors[100:101].copy()
    gt[0, 6] = np.pi / 4
    out = assign_jit(jnp.asarray(gt), jnp.asarray(np.ones(1, bool)), TINY)
    # exact IoU of (w=1.6, l=3.9) rect vs itself rotated 45deg is ~0.39 --
    # below the 0.6 positive threshold, so only the force-match survives
    pos = np.asarray(out["pos"])
    assert pos.sum() == 1
    out_aabb = assign_jit(jnp.asarray(gt), jnp.asarray(np.ones(1, bool)),
                              dc.replace(TINY, assign_iou="aabb"))
    # (the AABB path may or may not cross 0.6 here; the point is the exact
    # path is used by default and is well-behaved)
    assert np.asarray(out_aabb["pos"]).sum() >= 1


def test_bev_average_precision_hand_computed():
    """AP protocol oracle: 2 frames, 3 GT, ranked TP/FP sequence TP,FP,TP
    -> precision envelope integral = 1*(1/3) + (2/3)*(1/3) = 5/9."""
    from lidar_object_detection_tpu.pipelines.pointpillars import (
        bev_average_precision)

    g1 = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
                   [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    g2 = np.array([[0.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    # frame 1: one perfect hit (score .9), one miss (score .5, far away)
    d1 = (np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
                    [50.0, 50.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32),
          np.array([0.9, 0.5], np.float32))
    # frame 2: one perfect hit (score .3)
    d2 = (np.array([[0.0, 5.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32),
          np.array([0.3], np.float32))
    ap = bev_average_precision([d1, d2], [g1, g2], iou_threshold=0.5)
    assert abs(ap - 5.0 / 9.0) < 1e-6

    # perfect ranking, all matched -> AP 1.0
    ap1 = bev_average_precision(
        [(g1, np.array([0.9, 0.8], np.float32)),
         (g2, np.array([0.7], np.float32))], [g1, g2])
    assert abs(ap1 - 1.0) < 1e-6

    # no detections -> 0; no gt -> 0
    assert bev_average_precision(
        [(np.zeros((0, 7), np.float32), np.zeros(0, np.float32))],
        [g1]) == 0.0
    assert bev_average_precision([d1], [np.zeros((0, 7), np.float32)]) == 0.0


def test_bev_ap_duplicate_detections_count_fp():
    """A second detection on an already-claimed GT is a false positive."""
    from lidar_object_detection_tpu.pipelines.pointpillars import (
        bev_average_precision)

    gt = np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32)
    dets = (np.array([[0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
                      [0.1, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32),
            np.array([0.9, 0.8], np.float32))
    ap = bev_average_precision([dets], [gt])
    assert abs(ap - 1.0) < 1e-6  # TP first; trailing FP doesn't cut AP
    # reversed scores: FP ranked first -> precision at recall 1 is 1/2
    dets_rev = (dets[0], np.array([0.8, 0.9], np.float32))
    # the higher-scored near-duplicate still claims the gt (it overlaps
    # above threshold), so ranking swap keeps AP at 1.0 here; push the
    # duplicate off-overlap to force a leading FP instead
    far = (np.array([[30.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0],
                     [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0]], np.float32),
           np.array([0.9, 0.8], np.float32))
    ap_far = bev_average_precision([far], [gt])
    assert abs(ap_far - 0.5) < 1e-6


def test_kitti360_surround_preset():
    cfg = PillarsConfig.kitti360_surround()
    assert (cfg.grid.nx, cfg.grid.ny) == (640, 640)
    assert cfg.grid.z_range == (-5.0, 1.5)
    # head anchors: stride-2 BEV, 2 yaw anchors
    assert (cfg.grid.nx // cfg.out_stride) * (cfg.grid.ny // cfg.out_stride) \
        * cfg.num_anchors == 204800


def test_load_aggregated_frames(dataset):
    """Multi-sweep training clouds: cropped to the grid, denser than a
    single sweep inside it, with the target frame's GT boxes."""
    from lidar_object_detection_tpu.pipelines.pointpillars import (
        load_aggregated_frames)
    from lidar_object_detection_tpu.models.pointpillars import PillarsConfig

    cfg = PillarsConfig.kitti360_surround()
    ids = dataset.frame_ids()
    frames = load_aggregated_frames(dataset, ids[:1], source_frames=ids[:3],
                                    grid=cfg.grid, max_points=200000)
    (pts, boxes7), = frames
    g = cfg.grid
    assert (pts[:, 0] >= g.x_range[0]).all() and \
        (pts[:, 0] <= g.x_range[1]).all()
    assert (pts[:, 1] >= g.y_range[0]).all() and \
        (pts[:, 1] <= g.y_range[1]).all()
    assert (pts[:, 2] >= g.z_range[0]).all() and \
        (pts[:, 2] <= g.z_range[1]).all()
    assert len(pts) <= 200000
    rec = dataset.load_frame(ids[0], require_image=False)
    assert len(boxes7) == rec.corners_cam0.shape[0]
    # aggregation brings in structure a single sweep can't see: more GT
    # boxes contain points than with the target sweep alone
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        points_in_box7)
    single = rec.points.astype(np.float32)
    multi_hit = sum(points_in_box7(pts, b).any() for b in boxes7)
    single_hit = sum(points_in_box7(single, b).any() for b in boxes7)
    assert multi_hit > single_hit


def test_trainer_state_serialization_round_trip(rng):
    """flax.serialization round trip of the full TrainState (variables +
    opt_state incl. the schedule count + step) -- the checkpoint/resume
    path of examples/train_pointpillars_surround.py."""
    import optax
    from flax import serialization

    from lidar_object_detection_tpu.parallel.mesh import make_mesh
    from lidar_object_detection_tpu.parallel.train import TrainState

    mesh = make_mesh(jax.devices("cpu")[:1])
    sched = optax.cosine_decay_schedule(2e-3, 100)
    trainer = PillarsTrainer(TINY, mesh, num_points=256, learning_rate=sched)
    pts = rng.uniform(0, 20, (1, 256, 4)).astype(np.float32)
    pv = np.ones((1, 256), bool)
    gt = np.zeros((1, 4, 7), np.float32)
    gt[0, 0] = [10, 2, -1, 1.6, 3.9, 1.5, 0.3]
    gv = np.zeros((1, 4), bool)
    gv[0, 0] = True
    trainer.train_step(pts, pv, gt, np.zeros((1, 4), np.int32), gv)

    blob = serialization.to_bytes(jax.device_get(
        (trainer.state.variables, trainer.state.opt_state,
         trainer.state.step)))

    fresh = PillarsTrainer(TINY, mesh, num_points=256, learning_rate=sched,
                           seed=7)
    tmpl = (fresh.state.variables, fresh.state.opt_state, fresh.state.step)
    v, o, s = serialization.from_bytes(tmpl, blob)
    fresh.state = TrainState(variables=v, opt_state=o, step=s)
    assert int(np.asarray(s)) == 1

    a = jax.tree_util.tree_leaves(trainer.state.variables)
    b = jax.tree_util.tree_leaves(fresh.state.variables)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # both trainers take the identical next step
    m1 = trainer.train_step(pts, pv, gt, np.zeros((1, 4), np.int32), gv)
    m2 = fresh.train_step(pts, pv, gt, np.zeros((1, 4), np.int32), gv)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)


def test_boxes7_to_corners_round_trip(rng):
    """boxes7 -> corners -> boxes7 is the identity (and the corner layout
    matches the KITTI-360 convention corners_to_boxes7 expects)."""
    from lidar_object_detection_tpu.models.pointpillars import (
        boxes7_to_corners)

    boxes = np.stack([
        rng.uniform(-50, 50, 16), rng.uniform(-50, 50, 16),
        rng.uniform(-3, 0, 16), rng.uniform(1.4, 2.2, 16),
        rng.uniform(3.0, 5.0, 16), rng.uniform(1.2, 1.9, 16),
        rng.uniform(-np.pi, np.pi, 16)], axis=-1).astype(np.float32)
    corners = boxes7_to_corners(jnp.asarray(boxes))
    assert corners.shape == (16, 8, 3)
    back = np.asarray(corners_to_boxes7(corners))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-4)
    dyaw = np.remainder(back[:, 6] - boxes[:, 6] + np.pi, 2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0.0, atol=1e-5)


def test_infer_pointpillars_from_checkpoint(dataset, tmp_path, rng):
    """End-to-end inference surface: serialize a trainer checkpoint the way
    the surround runner does, reload it via the pipeline, get detections
    JSON + PLY out."""
    import json as _json
    import optax
    from flax import serialization

    from lidar_object_detection_tpu.parallel.mesh import make_mesh
    from lidar_object_detection_tpu.pipelines.pointpillars import (
        infer_pointpillars)

    mesh = make_mesh(jax.devices("cpu")[:1])
    trainer = PillarsTrainer(TINY, mesh, num_points=256,
                             learning_rate=optax.cosine_decay_schedule(
                                 2e-3, 10))
    ckpt = tmp_path / "ck.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            (trainer.state.variables, trainer.state.opt_state,
             trainer.state.step))))

    out_dir = tmp_path / "dets"
    dets = infer_pointpillars(
        str(dataset.root), str(ckpt), frame_ids=[100], cfg=TINY,
        max_points=256, score_threshold=0.99, output_dir=str(out_dir),
        export_ply=True)
    assert len(dets) == 1 and dets[0]["frame"] == 100
    assert dets[0]["ckpt_step"] == 0
    j = _json.load(open(out_dir / "detections_0000000100.json"))
    assert j["frame"] == 100
    assert (out_dir / "scene_0000000100.ply").exists()


def test_infer_rejects_mismatched_config(dataset, tmp_path):
    """A checkpoint with a grid/head sidecar must refuse to load into a
    different config -- the variables would load cleanly (convs are
    grid-agnostic) and decode garbage coordinates otherwise."""
    import optax
    from flax import serialization

    from lidar_object_detection_tpu.parallel.mesh import make_mesh
    from lidar_object_detection_tpu.pipelines.pointpillars import (
        infer_pointpillars, pillars_config_meta)
    import json as _json

    mesh = make_mesh(jax.devices("cpu")[:1])
    trainer = PillarsTrainer(TINY, mesh, num_points=128,
                             learning_rate=optax.cosine_decay_schedule(
                                 2e-3, 10))
    ckpt = tmp_path / "ck.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            (trainer.state.variables, trainer.state.opt_state,
             trainer.state.step))))
    with open(str(ckpt) + ".json", "w") as f:
        _json.dump(pillars_config_meta(TINY), f)

    import dataclasses as dc
    other = dc.replace(TINY, grid=PillarGridConfig(
        x_range=(-20.48, 20.48), y_range=(-20.48, 20.48),
        pillar_size=0.32))
    with pytest.raises(ValueError, match="different config"):
        infer_pointpillars(str(dataset.root), str(ckpt), frame_ids=[100],
                           cfg=other, max_points=128)
    # matching config still loads
    out = infer_pointpillars(str(dataset.root), str(ckpt), frame_ids=[100],
                             cfg=TINY, max_points=128,
                             score_threshold=0.99)
    assert len(out) == 1


def test_infer_aggregate_path(dataset, tmp_path):
    """Inference over pose-aggregated multi-sweep clouds (the surround
    recipe's serving path) on the tiny CPU grid."""
    import optax
    from flax import serialization

    from lidar_object_detection_tpu.parallel.mesh import make_mesh
    from lidar_object_detection_tpu.pipelines.pointpillars import (
        infer_pointpillars)

    mesh = make_mesh(jax.devices("cpu")[:1])
    trainer = PillarsTrainer(TINY, mesh, num_points=2048,
                             learning_rate=optax.cosine_decay_schedule(
                                 2e-3, 10))
    ckpt = tmp_path / "ck.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            (trainer.state.variables, trainer.state.opt_state,
             trainer.state.step))))
    out = infer_pointpillars(str(dataset.root), str(ckpt), frame_ids=[100],
                             cfg=TINY, aggregate=True, max_points=2048,
                             score_threshold=0.99)
    assert len(out) == 1 and out[0]["frame"] == 100


def test_cap_points_protected():
    """GT-aware point cap: sparse boxes survive the stride untouched,
    dense boxes are capped, order is preserved, budget is exact."""
    from lidar_object_detection_tpu.pipelines.pointpillars import \
        cap_points_protected

    rng = np.random.default_rng(0)
    bg = rng.uniform(-50, 50, (20000, 4)).astype(np.float32)
    bg[:, 2] = rng.uniform(3, 5, len(bg))          # background above boxes
    dense = np.zeros((3000, 4), np.float32)
    dense[:, :3] = rng.uniform(-0.8, 0.8, (3000, 3)) * [1.8, 0.7, 0.6]
    dense[:, :3] += [10.0, 0.0, 0.0]
    sparse = np.zeros((7, 4), np.float32)
    sparse[:, :3] = rng.uniform(-0.5, 0.5, (7, 3)) * [1.5, 0.6, 0.5]
    sparse[:, :3] += [40.0, 20.0, 0.0]
    pts = np.concatenate([bg, dense, sparse])
    order = rng.permutation(len(pts))
    pts = pts[order]
    sparse_idx = np.nonzero(order >= len(bg) + len(dense))[0]
    boxes7 = np.asarray([[10.0, 0, 0, 1.6, 4.0, 1.5, 0.0],
                         [40.0, 20, 0, 1.6, 4.0, 1.5, 0.0]], np.float32)

    capped = cap_points_protected(pts, boxes7, 4096, protect_in_box=256)
    assert len(capped) == 4096
    # every sparse-box point survives
    sset = {tuple(p) for p in pts[sparse_idx]}
    kept = sum(1 for p in capped if tuple(p) in sset)
    assert kept == len(sparse_idx)
    # plain stride would keep ~7 * 4096/23007 ~ 1 of them on average;
    # protected keeps all 7.  Dense box keeps at least the protected cap.
    from lidar_object_detection_tpu.models.pointpillars.augment import \
        points_in_box7
    assert points_in_box7(capped, boxes7[0]).sum() >= 256
    # no-protection path unchanged: uniform stride of the whole cloud
    plain = cap_points_protected(pts, boxes7, 4096, protect_in_box=0)
    assert len(plain) == 4096
    # under-budget clouds pass through untouched
    small = pts[:100]
    assert cap_points_protected(small, boxes7, 4096, 256) is small
