"""CenterPoint head: gaussian target rendering, loss descent, peak decode
round trip, and dispatch through the shared train/decode entry points."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_object_detection_tpu.models.pointpillars import (
    PillarGridConfig, PillarsConfig, PillarsTrainer, PointPillars,
    center_loss, decode_center, decode_predictions, pointpillars_loss,
    render_center_targets)
from lidar_object_detection_tpu.models.pointpillars.center import (
    gaussian_radius, penalty_reduced_focal)
from lidar_object_detection_tpu.ops.rotated_iou import rotated_iou_matrix

TINY_GRID = PillarGridConfig(x_range=(0.0, 20.48), y_range=(-10.24, 10.24),
                             pillar_size=0.32)
TINY = PillarsConfig(grid=TINY_GRID, embed_dim=16,
                     backbone_channels=(16, 32, 64),
                     backbone_layers=(1, 1, 1), up_channels=16,
                     head="center")

G = 8


_RENDER_JIT = {}
_DECODE_JIT = {}


def render_jit(gt, cls, valid, cfg):
    """Jitted render_center_targets (eager scatter rendering is the slow
    path on the 1-core CPU suite; compile-cached)."""
    if cfg not in _RENDER_JIT:
        _RENDER_JIT[cfg] = jax.jit(
            lambda g, c, v: render_center_targets(g, c, v, cfg))
    return _RENDER_JIT[cfg](gt, cls, valid)


def decode_jit(out, cfg, score_threshold):
    key = (cfg, score_threshold)
    if key not in _DECODE_JIT:
        _DECODE_JIT[key] = jax.jit(
            lambda o: decode_center(o, cfg, score_threshold=score_threshold))
    return _DECODE_JIT[key](out)


def _gt(boxes):
    """Ragged list of (7,) boxes -> fixed (G, 7/cls/valid)."""
    gt = np.zeros((G, 7), np.float32)
    cls = np.zeros((G,), np.int32)
    valid = np.zeros((G,), bool)
    for i, b in enumerate(boxes):
        gt[i] = b
        valid[i] = True
    return jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(valid)


BOX_A = [10.0, 2.0, -1.0, 1.8, 4.2, 1.6, 0.4]
BOX_B = [5.0, -5.0, -0.8, 1.6, 3.9, 1.5, -1.2]


class TestRenderTargets:
    def test_peak_is_one_at_center_cell(self):
        gt, cls, valid = _gt([BOX_A])
        t = render_jit(gt, cls, valid, TINY)
        heat = np.asarray(t["heat"])
        cell = TINY.grid.pillar_size * TINY.out_stride
        ix = int((BOX_A[0] - TINY.grid.x_range[0]) / cell)
        iy = int((BOX_A[1] - TINY.grid.y_range[0]) / cell)
        assert heat[iy, ix, 0] == pytest.approx(1.0)
        assert heat.max() == pytest.approx(1.0)
        # gaussian decays away from the center
        assert heat[iy, ix + 3, 0] < heat[iy, ix + 1, 0] < 1.0
        assert np.asarray(t["mask"]).sum() == 1
        h, w = heat.shape[:2]
        assert int(t["ind"][0]) == iy * w + ix

    def test_outside_grid_is_masked(self):
        gt, cls, valid = _gt([[100.0, 0.0, -1.0, 1.6, 3.9, 1.5, 0.0]])
        t = render_jit(gt, cls, valid, TINY)
        assert not bool(t["mask"][0])
        assert float(jnp.max(t["heat"])) == 0.0

    def test_two_boxes_compose_by_max(self):
        gt, cls, valid = _gt([BOX_A, BOX_B])
        t = render_jit(gt, cls, valid, TINY)
        assert np.asarray(t["mask"]).sum() == 2
        assert float(jnp.sum(t["heat"] >= 1.0 - 1e-6)) == 2

    def test_reg_targets(self):
        gt, cls, valid = _gt([BOX_A])
        t = render_jit(gt, cls, valid, TINY)
        reg = np.asarray(t["reg"][0])
        assert 0.0 <= reg[0] < 1.0 and 0.0 <= reg[1] < 1.0
        assert reg[2] == pytest.approx(BOX_A[2])
        assert np.exp(reg[3]) == pytest.approx(BOX_A[3], rel=1e-5)
        assert np.exp(reg[4]) == pytest.approx(BOX_A[4], rel=1e-5)
        assert reg[6] == pytest.approx(np.sin(BOX_A[6]), abs=1e-6)
        assert reg[7] == pytest.approx(np.cos(BOX_A[6]), abs=1e-6)


def test_gaussian_radius_matches_overlap_cases():
    # a 10x10-cell box: all three CornerNet cases give r where IoU ~ 0.7
    r = float(gaussian_radius(jnp.float32(10.0), jnp.float32(10.0)))
    assert 0.0 < r < 10.0
    # shifting the box diagonally by r keeps IoU >= min_overlap (case 3)
    s = 10.0
    inter = (s - r) ** 2
    union = 2 * s * s - inter
    assert inter / union >= 0.7 - 0.02


def test_focal_loss_zero_for_perfect_prediction():
    targets = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0)
    logits = jnp.where(targets >= 1.0, 20.0, -20.0)
    loss = float(jnp.sum(penalty_reduced_focal(logits, targets)))
    assert loss < 1e-3


class TestDecodeRoundTrip:
    def _perfect_outputs(self, gt, cls, valid):
        t = render_jit(gt, cls, valid, TINY)
        heat = t["heat"]
        logits = jnp.log(jnp.clip(heat, 1e-6, 1 - 1e-6) /
                         (1 - jnp.clip(heat, 1e-6, 1 - 1e-6)))
        h, w = heat.shape[:2]
        reg = jnp.zeros((h * w, 8)).at[t["ind"]].set(t["reg"]).reshape(
            h, w, 8)
        return {"heat": logits, "reg": reg}

    def test_recovers_gt_boxes(self):
        gt, cls, valid = _gt([BOX_A, BOX_B])
        out = self._perfect_outputs(gt, cls, valid)
        det = decode_jit(out, TINY, 0.5)
        ok = np.asarray(det["valid"])
        assert ok.sum() == 2
        boxes = np.asarray(det["boxes7"])[ok]
        iou = np.asarray(rotated_iou_matrix(jnp.asarray(boxes), gt[:2]))
        # each decoded box matches one gt near-exactly
        assert iou.max(axis=1).min() > 0.99
        # z / dims / yaw are exact up to float32
        order = iou.argmax(axis=1)
        np.testing.assert_allclose(boxes[:, 2:6],
                                   np.asarray(gt)[order, 2:6], atol=1e-4)

    def test_decode_predictions_dispatches_on_head(self):
        gt, cls, valid = _gt([BOX_A])
        out = self._perfect_outputs(gt, cls, valid)
        det = decode_predictions(out, TINY, score_threshold=0.5)
        assert np.asarray(det["valid"]).sum() == 1

    def test_empty_heatmap_decodes_empty(self):
        h, w = TINY.grid.ny // 2, TINY.grid.nx // 2
        out = {"heat": jnp.full((h, w, 1), -20.0),
               "reg": jnp.zeros((h, w, 8))}
        det = decode_jit(out, TINY, 0.1)
        assert np.asarray(det["valid"]).sum() == 0


class TestCenterTraining:
    def test_loss_jits_and_descends(self, rng):
        from lidar_object_detection_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices("cpu")[:1])
        trainer = PillarsTrainer(TINY, mesh, num_points=512,
                                 learning_rate=5e-3)
        pts = rng.uniform(0, 20, (2, 512, 4)).astype(np.float32)
        pts[..., 1] = rng.uniform(-10, 10, (2, 512))
        pts[..., 2] = rng.uniform(-2.5, 0.5, (2, 512))
        pv = np.ones((2, 512), bool)
        gt = np.zeros((2, G, 7), np.float32)
        gcls = np.zeros((2, G), np.int32)
        gv = np.zeros((2, G), bool)
        gt[0, 0], gv[0, 0] = BOX_A, True
        gt[1, 0], gv[1, 0] = BOX_B, True
        first = last = None
        for _ in range(12):
            m = trainer.train_step(pts, pv, gt, gcls, gv)
            loss = float(m["loss"])
            if first is None:
                first = loss
            last = loss
        assert last < first
        assert float(m["num_pos"]) == 2

    def test_model_forward_shapes(self):
        model = PointPillars(TINY)
        pts = jnp.zeros((1, 64, 4))
        pv = jnp.zeros((1, 64), bool)
        variables = model.init(jax.random.PRNGKey(0), pts, pv)
        out = model.apply(variables, pts, pv)
        h = TINY.grid.ny // TINY.out_stride
        w = TINY.grid.nx // TINY.out_stride
        assert out["heat"].shape == (1, h, w, 1)
        assert out["reg"].shape == (1, h, w, 8)

    def test_loss_dispatch(self):
        """pointpillars_loss routes to center_loss when cfg.head=center."""
        gt = jnp.zeros((1, G, 7))
        gcls = jnp.zeros((1, G), jnp.int32)
        gv = jnp.zeros((1, G), bool)
        h = TINY.grid.ny // TINY.out_stride
        w = TINY.grid.nx // TINY.out_stride
        out = {"heat": jnp.zeros((1, h, w, 1)),
               "reg": jnp.zeros((1, h, w, 8))}
        a = pointpillars_loss(out, gt, gcls, gv, TINY)
        b = center_loss(out, gt, gcls, gv, TINY)
        assert float(a["loss"]) == float(b["loss"])


class TestMultiClass:
    """nc > 1: class-channel scatter in target rendering and class
    recovery through the flattened peak decode."""

    CFG2 = PillarsConfig(grid=TINY_GRID, embed_dim=16,
                         backbone_channels=(16, 32, 64),
                         backbone_layers=(1, 1, 1), up_channels=16,
                         head="center", num_classes=2)

    def test_render_routes_class_channels(self):
        gt = jnp.zeros((G, 7)).at[0].set(jnp.asarray(BOX_A)).at[1].set(
            jnp.asarray(BOX_B))
        cls = jnp.zeros((G,), jnp.int32).at[1].set(1)
        valid = jnp.zeros((G,), bool).at[0].set(True).at[1].set(True)
        t = render_center_targets(gt, cls, valid, self.CFG2)
        heat = np.asarray(t["heat"])
        assert heat.shape[-1] == 2
        cell = self.CFG2.grid.pillar_size * self.CFG2.out_stride

        def peak(b):
            ix = int((b[0] - self.CFG2.grid.x_range[0]) / cell)
            iy = int((b[1] - self.CFG2.grid.y_range[0]) / cell)
            return iy, ix

        ya, xa = peak(BOX_A)
        yb, xb = peak(BOX_B)
        assert heat[ya, xa, 0] == pytest.approx(1.0)
        assert heat[yb, xb, 1] == pytest.approx(1.0)
        # each box renders only into its own class channel's peak cell
        assert heat[ya, xa, 1] < 1.0
        assert heat[yb, xb, 0] < 1.0

    def test_decode_recovers_classes(self):
        gt = jnp.zeros((G, 7)).at[0].set(jnp.asarray(BOX_A)).at[1].set(
            jnp.asarray(BOX_B))
        cls = jnp.zeros((G,), jnp.int32).at[1].set(1)
        valid = jnp.zeros((G,), bool).at[0].set(True).at[1].set(True)
        t = render_center_targets(gt, cls, valid, self.CFG2)
        heat = t["heat"]
        logits = jnp.log(jnp.clip(heat, 1e-6, 1 - 1e-6)
                         / (1 - jnp.clip(heat, 1e-6, 1 - 1e-6)))
        h, w = heat.shape[:2]
        reg = jnp.zeros((h * w, 8)).at[t["ind"]].set(t["reg"]).reshape(
            h, w, 8)
        det = decode_center({"heat": logits, "reg": reg}, self.CFG2,
                            score_threshold=0.5)
        ok = np.asarray(det["valid"])
        assert ok.sum() == 2
        got = {}
        boxes = np.asarray(det["boxes7"])[ok]
        classes = np.asarray(det["classes"])[ok]
        for b, c in zip(boxes, classes):
            key = 0 if abs(b[0] - BOX_A[0]) < 1 else 1
            got[key] = int(c)
        assert got == {0: 0, 1: 1}


class TestStarveWeighting:
    """Per-GT positive upweighting for point-starved boxes (the round-2
    center-vs-SSD recall-gap lever)."""

    def test_gt_point_counts_rotated(self):
        from lidar_object_detection_tpu.models.pointpillars.center import (
            gt_point_counts)
        # box rotated 90 deg: length (4.2) now spans y, width (1.8) spans x
        box = jnp.asarray([[[10.0, 0.0, -1.0, 1.8, 4.2, 1.6, np.pi / 2]]])
        pts = jnp.asarray([[[10.0, 1.9, -1.0, 0.0],    # inside (along len)
                            [10.0, 2.5, -1.0, 0.0],    # outside (past l/2)
                            [11.5, 0.0, -1.0, 0.0],    # outside (past w/2)
                            [10.5, 0.0, -1.0, 0.0]]])  # inside
        valid = jnp.ones((1, 4), bool)
        counts = gt_point_counts(pts, valid, box, jnp.ones((1, 1), bool))
        assert counts.shape == (1, 1)
        assert int(counts[0, 0]) == 2

    def test_gt_point_counts_z_half_height(self):
        """z containment is |dz| <= h/2 about the box CENTER (boxes7
        convention, points_in_box7) -- a ground return h below the center
        must NOT count."""
        from lidar_object_detection_tpu.models.pointpillars.center import (
            gt_point_counts)
        # box center z = -1.0, height 1.6 -> valid z in [-1.8, -0.2]
        box = jnp.asarray([[[10.0, 0.0, -1.0, 1.8, 4.2, 1.6, 0.0]]])
        pts = jnp.asarray([[[10.0, 0.0, -0.25, 0.0],   # just inside top
                            [10.0, 0.0, -1.75, 0.0],   # just inside bottom
                            [10.0, 0.0, -0.15, 0.0],   # above h/2: outside
                            [10.0, 0.0, -2.30, 0.0]]])  # ground return: out
        valid = jnp.ones((1, 4), bool)
        counts = gt_point_counts(pts, valid, box, jnp.ones((1, 1), bool))
        assert int(counts[0, 0]) == 2

    def test_starve_weights_monotone(self):
        from lidar_object_detection_tpu.models.pointpillars.center import (
            starve_weights)
        import dataclasses
        cfg = dataclasses.replace(TINY, starve_weight=3.0, starve_n0=10.0)
        rng = np.random.default_rng(0)
        # box 0 dense (100 points inside), box 1 empty
        dense = rng.uniform(-0.5, 0.5, (100, 3)) + np.array([10.0, 2.0, -1.0])
        pts = np.zeros((1, 128, 4), np.float32)
        pts[0, :100, :3] = dense
        valid = np.zeros((1, 128), bool)
        valid[0, :100] = True
        gt, cls, gv = _gt([BOX_A, BOX_B])
        w = starve_weights(jnp.asarray(pts), jnp.asarray(valid),
                           gt[None], gv[None], cfg)
        assert w.shape == (1, G)
        assert float(w[0, 1]) > float(w[0, 0])       # starved > dense
        assert float(w[0, 1]) == pytest.approx(4.0, abs=0.05)  # 1 + 3*e^0
        assert float(w[0, 0]) < 1.01                  # dense ~ 1

    def test_loss_upweights_starved_gt(self, rng):
        """With gt_pos_weight, the heatmap loss for an unpredicted starved
        GT grows, pushing gradient toward forming its peak."""
        gt, cls, gv = _gt([BOX_A, BOX_B])
        h = TINY.grid.ny // TINY.out_stride
        w = TINY.grid.nx // TINY.out_stride
        out = {"heat": jnp.asarray(rng.normal(size=(1, h, w, 1)) - 4.0,
                                   jnp.float32),
               "reg": jnp.zeros((1, h, w, 8), jnp.float32)}
        base = center_loss(out, gt[None], cls[None], gv[None], TINY)
        pw = jnp.ones((1, G)).at[0, 1].set(4.0)
        up = center_loss(out, gt[None], cls[None], gv[None], TINY,
                         gt_pos_weight=pw)
        assert float(up["cls"]) > float(base["cls"])
        assert float(up["box"]) >= float(base["box"])
