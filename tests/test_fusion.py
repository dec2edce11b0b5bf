"""End-to-end fusion parity on real KITTI-360 frame 100.

Synthetic instance masks are rendered from the projected GT boxes (the real
detector is exercised separately), then the full jitted pipeline -- project,
validity, visibility filter, mask gather, inside counts, best-box matching --
is compared against a NumPy oracle that mirrors the reference scripts'
semantics (cvs_erosion.py:298-379) step by step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
from lidar_object_detection_tpu.fusion import (
    FusionParams, fuse_frame, greedy_iou_match, hungarian_match)
from lidar_object_detection_tpu.ops import pack_masks


# ------------------------------------------------------------------ oracle

def oracle_pipeline(points, corners_cam0, masks, camera, chain,
                    depth_max=50.0, min_points=10):
    """NumPy mirror of the reference fusion path (visibility filter ->
    projection -> mask lookup -> oriented inside counts -> best box)."""
    # visibility filter (V1:96-115)
    vis = []
    for c in corners_cam0:
        u, v, d = camera.cam2image(c.T)
        ok = (d > 0.1) & (u >= 0) & (u < camera.width) & (v >= 0) & (v < camera.height)
        vis.append(ok.sum() >= 2)
    vis = np.asarray(vis)
    kept = corners_cam0[vis]
    # cam0 -> velo corners (V1:41-52)
    homo = np.concatenate([kept, np.ones((*kept.shape[:2], 1))], -1)
    corners_velo = np.einsum("ij,gcj->gci", chain.cam_to_velo, homo)[..., :3]

    # projection + validity (V1:340-357)
    ph = points.astype(np.float64).copy()
    ph[:, 3] = 1
    cam = (chain.velo_to_rect @ ph.T).T[:, :3]
    u, v, d = camera.cam2image(cam.T)
    valid = ((u >= 0) & (u < camera.width) & (v >= 0) & (v < camera.height)
             & (d > 0) & (d < depth_max))
    uv_valid = u[valid]
    vv_valid = v[valid]
    pts_valid = points[valid][:, :3]

    # mask lookup (V1:186-208)
    car_sets = []
    for m in masks:
        sel = m[vv_valid, uv_valid] > 0.5
        car_sets.append(pts_valid[sel])

    # per-car best box by inside count (cvs_erosion.py:165-229)
    stats = []
    for car_pts in car_sets:
        total = len(car_pts)
        if total == 0:
            stats.append(None)
            continue
        best_count, best_idx = 0, -1
        for gi, cv in enumerate(corners_velo):
            v1, v2, v3 = cv[1] - cv[0], cv[3] - cv[0], cv[4] - cv[0]
            rel = car_pts - cv[0]
            p1 = rel @ v1 / (v1 @ v1)
            p2 = rel @ v2 / (v2 @ v2)
            p3 = rel @ v3 / (v3 @ v3)
            cnt = int(((p1 >= 0) & (p1 <= 1) & (p2 >= 0) & (p2 <= 1)
                       & (p3 >= 0) & (p3 <= 1)).sum())
            if cnt > best_count:
                best_count, best_idx = cnt, gi
        if best_idx >= 0 and best_count >= min_points:
            stats.append((total, best_count, best_idx))
        else:
            stats.append((total, 0, -1))
    return vis, stats


def render_masks_from_boxes(corners_cam0, camera, num=6, pad=2):
    """Synthetic instance masks: filled projected GT-box rectangles."""
    masks = []
    for c in corners_cam0:
        u, v, d = camera.cam2image(c.T)
        pos = d > 0
        if not pos.any():
            continue
        x0 = int(np.clip(u[pos].min() - pad, 0, camera.width - 1))
        x1 = int(np.clip(u[pos].max() + pad, 0, camera.width - 1))
        y0 = int(np.clip(v[pos].min() - pad, 0, camera.height - 1))
        y1 = int(np.clip(v[pos].max() + pad, 0, camera.height - 1))
        if x1 <= x0 or y1 <= y0 or (d[pos].mean() > 40) or d[pos].mean() < 0:
            continue
        m = np.zeros((camera.height, camera.width), bool)
        m[y0:y1 + 1, x0:x1 + 1] = True
        masks.append(m)
        if len(masks) == num:
            break
    assert masks, "no synthetic masks rendered"
    return np.stack(masks)


@pytest.fixture(scope="module")
def fused(dataset, frame100):
    cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    cfg = type(cfg)(**{**cfg.__dict__, "erosion_enabled": False})
    params = FusionParams.from_config(cfg)

    masks = render_masks_from_boxes(frame100.corners_cam0, dataset.camera)
    D = params.num_detections
    det_valid = np.zeros(D, bool)
    det_valid[:masks.shape[0]] = True
    padded = np.zeros((D, dataset.camera.height, dataset.camera.width), bool)
    padded[:masks.shape[0]] = masks

    G = 64
    corners = np.zeros((G, 8, 3))
    corners[:frame100.num_boxes] = frame100.corners_cam0
    box_valid = np.zeros(G, bool)
    box_valid[:frame100.num_boxes] = True

    P = 131072
    pts = np.zeros((P, 4))
    pts[:frame100.num_points] = frame100.points
    pmask = np.zeros(P, bool)
    pmask[:frame100.num_points] = True

    out = fuse_frame(
        jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray(pack_masks(padded)), jnp.asarray(det_valid),
        jnp.asarray(corners), jnp.asarray(box_valid),
        jnp.asarray(dataset.transforms.velo_to_rect),
        jnp.asarray(dataset.transforms.cam_to_velo),
        jnp.asarray(dataset.camera.intrinsics), params)
    return out, masks, det_valid


def test_fusion_matches_oracle(dataset, frame100, fused):
    out, masks, det_valid = fused
    vis_oracle, stats_oracle = oracle_pipeline(
        frame100.points, frame100.corners_cam0, masks,
        dataset.camera, dataset.transforms)

    vis = np.asarray(out["box_visible"])[:frame100.num_boxes]
    np.testing.assert_array_equal(vis, vis_oracle)

    # map oracle best idx (into compacted visible list) back to padded idx
    vis_idx = np.nonzero(vis_oracle)[0]
    total = np.asarray(out["total_points"])
    inside = np.asarray(out["points_inside"])
    best = np.asarray(out["best_box"])
    n_matched = 0
    for car, st in enumerate(stats_oracle):
        if st is None:
            assert total[car] == 0
            continue
        o_total, o_inside, o_best = st
        assert total[car] == o_total, car
        assert inside[car] == o_inside, car
        if o_best >= 0:
            assert best[car] == vis_idx[o_best], car
            n_matched += 1
        else:
            assert best[car] == -1, car
    assert n_matched >= 1, "expected at least one matched car on frame 100"


def test_fusion_erosion_changes_counts(dataset, frame100, fused):
    out, masks, det_valid = fused
    cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
    params = FusionParams.from_config(cfg)
    assert params.erosion_enabled
    D = params.num_detections
    padded = np.zeros((D, dataset.camera.height, dataset.camera.width), bool)
    padded[:masks.shape[0]] = masks
    G, P = 64, 131072
    corners = np.zeros((G, 8, 3))
    corners[:frame100.num_boxes] = frame100.corners_cam0
    box_valid = np.zeros(G, bool)
    box_valid[:frame100.num_boxes] = True
    pts = np.zeros((P, 4))
    pts[:frame100.num_points] = frame100.points
    pmask = np.zeros(P, bool)
    pmask[:frame100.num_points] = True
    out_e = fuse_frame(
        jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray(pack_masks(padded)), jnp.asarray(det_valid),
        jnp.asarray(corners), jnp.asarray(box_valid),
        jnp.asarray(dataset.transforms.velo_to_rect),
        jnp.asarray(dataset.transforms.cam_to_velo),
        jnp.asarray(dataset.camera.intrinsics), params)
    # eroded masks are strict subsets -> totals can only shrink
    assert (np.asarray(out_e["total_points"])
            <= np.asarray(out["total_points"])).all()
    assert np.asarray(out_e["total_points"]).sum() > 0


# ------------------------------------------------------- V4 / V5 matchers

def test_greedy_iou_match_oracle(dataset, frame100):
    cam = dataset.camera
    # detections = slightly shifted projections of the first visible boxes
    masks_info = []
    for c in frame100.corners_cam0:
        u, v, d = cam.cam2image(c.T)
        pos = d > 0
        if pos.any():
            masks_info.append([u[pos].min() + 3, v[pos].min() + 2,
                               u[pos].max() + 3, v[pos].max() + 2])
        if len(masks_info) == 5:
            break
    det = np.asarray(masks_info, dtype=np.float64)
    D, G = 8, 64
    det_boxes = np.zeros((D, 4))
    det_boxes[:len(det)] = det
    det_valid = np.zeros(D, bool)
    det_valid[:len(det)] = True
    corners = np.zeros((G, 8, 3))
    corners[:frame100.num_boxes] = frame100.corners_cam0
    box_valid = np.zeros(G, bool)
    box_valid[:frame100.num_boxes] = True

    midx, miou = greedy_iou_match(
        jnp.asarray(det_boxes), jnp.asarray(det_valid),
        jnp.asarray(corners), jnp.asarray(box_valid),
        jnp.asarray(cam.intrinsics), 0.25)
    midx = np.asarray(midx)

    # oracle (V4:140-183)
    for di in range(len(det)):
        best_iou, best = 0.25, -1
        for gi, c in enumerate(frame100.corners_cam0):
            u, v, d = cam.cam2image(c.T)
            pos = d > 0
            if not pos.any():
                continue
            g2d = [u[pos].min(), v[pos].min(), u[pos].max(), v[pos].max()]
            b = det[di]
            xi, yi = max(b[0], g2d[0]), max(b[1], g2d[1])
            xa, ya = min(b[2], g2d[2]), min(b[3], g2d[3])
            if xa <= xi or ya <= yi:
                continue
            inter = (xa - xi) * (ya - yi)
            union = ((b[2] - b[0]) * (b[3] - b[1])
                     + (g2d[2] - g2d[0]) * (g2d[3] - g2d[1]) - inter)
            iou = inter / union if union > 0 else 0
            if iou > best_iou:
                best_iou, best = iou, gi
        assert midx[di] == best, di
    assert (midx[:len(det)] >= 0).any()


def test_hungarian_match_runs(dataset, frame100):
    cam = dataset.camera
    det = []
    for c in frame100.corners_cam0:
        u, v, d = cam.cam2image(c.T)
        pos = d > 0
        if pos.any() and 0 < d[pos].mean() < 30:
            det.append([u[pos].min(), v[pos].min(), u[pos].max(), v[pos].max()])
        if len(det) == 4:
            break
    D, G = 8, 64
    det_boxes = np.zeros((D, 4))
    det_boxes[:len(det)] = np.asarray(det, dtype=np.float64)
    det_valid = np.zeros(D, bool)
    det_valid[:len(det)] = True
    corners = np.zeros((G, 8, 3))
    corners[:frame100.num_boxes] = frame100.corners_cam0
    box_valid = np.zeros(G, bool)
    box_valid[:frame100.num_boxes] = True

    midx, score, iou = hungarian_match(
        jnp.asarray(det_boxes), jnp.asarray(det_valid),
        jnp.asarray(corners), jnp.asarray(box_valid),
        jnp.asarray(cam.intrinsics))
    midx = np.asarray(midx)
    # a detection built from a GT projection must match itself perfectly
    assert (midx[:len(det)] >= 0).all()
    assert (np.asarray(score)[:len(det)] > 0.9).all()
    # perfect-overlap pairs: IoU 1
    assert (np.asarray(iou)[:len(det)] > 0.99).all()
    # padding slots unmatched
    assert (midx[len(det):] == -1).all()


def test_rich_filter_mode_in_fusion(dataset, frame100, fused):
    """bbox_filter_mode='rich' swaps in the secondtest visibility filter."""
    import dataclasses

    out, masks, det_valid = fused
    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    params = dataclasses.replace(FusionParams.from_config(cfg),
                                 bbox_filter_mode="rich")
    D = params.num_detections
    padded = np.zeros((D, dataset.camera.height, dataset.camera.width), bool)
    padded[:masks.shape[0]] = masks
    G, P = 64, 131072
    corners = np.zeros((G, 8, 3))
    corners[:frame100.num_boxes] = frame100.corners_cam0
    box_valid = np.zeros(G, bool)
    box_valid[:frame100.num_boxes] = True
    pts = np.zeros((P, 4))
    pts[:frame100.num_points] = frame100.points
    pmask = np.zeros(P, bool)
    pmask[:frame100.num_points] = True
    out_rich = fuse_frame(
        jnp.asarray(pts), jnp.asarray(pmask),
        jnp.asarray(pack_masks(padded)), jnp.asarray(det_valid),
        jnp.asarray(corners), jnp.asarray(box_valid),
        jnp.asarray(dataset.transforms.velo_to_rect),
        jnp.asarray(dataset.transforms.cam_to_velo),
        jnp.asarray(dataset.camera.intrinsics), params)
    # rich filter (min-area gate) keeps a subset on this frame
    vis_rich = np.asarray(out_rich["box_visible"])[:frame100.num_boxes]
    from lidar_object_detection_tpu.geom.boxes import corners_visibility_rich
    expect, _ = corners_visibility_rich(
        jnp.asarray(corners[:frame100.num_boxes]),
        jnp.asarray(dataset.camera.intrinsics),
        dataset.camera.width, dataset.camera.height)
    np.testing.assert_array_equal(vis_rich, np.asarray(expect))
    assert vis_rich.sum() >= 1


def test_hungarian_match_more_dets_than_boxes(dataset, frame100):
    """D > G pads the column axis; surplus detections stay unmatched."""
    cam = dataset.camera
    det_boxes = np.zeros((8, 4))
    u, v, d = cam.cam2image(frame100.corners_cam0[0].T)
    pos = d > 0
    det_boxes[0] = [u[pos].min(), v[pos].min(), u[pos].max(), v[pos].max()]
    det_valid = np.ones(8, bool)
    corners = frame100.corners_cam0[:2].astype(np.float64)
    midx, score, iou = hungarian_match(
        jnp.asarray(det_boxes), jnp.asarray(det_valid),
        jnp.asarray(corners), jnp.ones(2, bool),
        jnp.asarray(cam.intrinsics))
    midx = np.asarray(midx)
    assert midx[0] == 0                  # the GT-projection det matches box 0
    assert (midx[1:] == -1).all()        # zero-area dets rejected by gates


def test_greedy_firsttest_threshold(dataset, frame100):
    """greedy matching at the firsttest prototype's IoU > 0.1 gate."""
    cam = dataset.camera
    u, v, d = cam.cam2image(frame100.corners_cam0[0].T)
    pos = d > 0
    # a detection with modest overlap (shifted by ~40% of width)
    x0, x1 = u[pos].min(), u[pos].max()
    y0, y1 = v[pos].min(), v[pos].max()
    w = x1 - x0
    det = np.asarray([[x0 + 0.7 * w, y0, x1 + 0.7 * w, y1]])
    det_boxes = np.zeros((4, 4))
    det_boxes[0] = det
    det_valid = np.zeros(4, bool)
    det_valid[0] = True
    corners = frame100.corners_cam0[:1].astype(np.float64)
    strict, _ = greedy_iou_match(
        jnp.asarray(det_boxes), jnp.asarray(det_valid), jnp.asarray(corners),
        jnp.ones(1, bool), jnp.asarray(cam.intrinsics), 0.25)
    loose, _ = greedy_iou_match(
        jnp.asarray(det_boxes), jnp.asarray(det_valid), jnp.asarray(corners),
        jnp.ones(1, bool), jnp.asarray(cam.intrinsics), 0.1)
    # shift 0.7w: IoU = 0.3/1.7 ~ 0.18 -> fails V4's 0.25 gate, passes 0.1
    assert int(np.asarray(strict)[0]) == -1
    assert int(np.asarray(loose)[0]) == 0
