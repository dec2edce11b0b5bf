"""Pure-LiDAR 3D detection pipeline (PointPillars) -- the stretch path of
BASELINE.json configs[4]: replaces the 2D-camera detector with a voxelized
conv backbone over the raw Velodyne scans.

Provides training on the bundled KITTI-360 sample (GT 7-dof boxes derived
from the corner annotations via ``corners_to_boxes7``) and batched
inference with BEV-NMS decoding.  Matching against GT for evaluation uses
BEV IoU.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.config import ShapeConfig
from lidar_object_detection_tpu.data.kitti360 import Kitti360Dataset
from lidar_object_detection_tpu.geom.boxes import (iou_2d_matrix,
                                                   transform_corners)
from lidar_object_detection_tpu.models.pointpillars import (
    PillarsConfig, PillarsTrainer, bev_aabb, corners_to_boxes7,
    decode_predictions)
from lidar_object_detection_tpu.parallel.mesh import make_mesh


MAX_GT = 64


def load_training_batch(dataset: Kitti360Dataset,
                        frame_ids: Optional[Sequence[int]] = None):
    """Frames + velodyne-frame 7-dof GT boxes, fixed shapes."""
    records = dataset.load_frames(frame_ids, require_image=False)
    batch = dataset.make_batch(records)
    b = batch.batch_size
    gt = np.zeros((b, MAX_GT, 7), np.float32)
    gt_cls = np.zeros((b, MAX_GT), np.int32)
    gt_valid = np.zeros((b, MAX_GT), bool)
    cam_to_velo = dataset.transforms.cam_to_velo.astype(np.float32)
    for i, rec in enumerate(records):
        corners_velo = np.asarray(transform_corners(
            jnp.asarray(rec.corners_cam0.astype(np.float32)),
            jnp.asarray(cam_to_velo)))
        boxes7 = np.asarray(corners_to_boxes7(corners_velo))
        g = min(len(boxes7), MAX_GT)
        gt[i, :g] = boxes7[:g]
        gt_valid[i, :g] = True
    return batch, gt, gt_cls, gt_valid


@dataclasses.dataclass
class PillarsEvalResult:
    matched: int
    total_gt: int
    total_det: int
    # bool over the INPUT gt rows (gt_valid order): which GT got matched
    # -- lets callers slice recall over subsets (e.g. the split's
    # non-overlapped eval boxes)
    matched_gt: Optional[np.ndarray] = None

    @property
    def recall(self) -> float:
        return self.matched / self.total_gt if self.total_gt else 0.0

    @property
    def precision(self) -> float:
        return self.matched / self.total_det if self.total_det else 0.0


def evaluate_bev(det, gt_boxes7, gt_valid, iou_threshold: float = 0.5,
                 exact: bool = False):
    """Greedy BEV-IoU matching of decoded detections against GT.

    ``exact=True`` uses the rotated-rectangle IoU
    (ops/rotated_iou.py); default is the axis-aligned BEV extent.
    """
    matched = 0
    total_det = 0
    total_gt = int(np.asarray(gt_valid).sum())
    det_boxes = np.asarray(det["boxes7"])
    det_ok = np.asarray(det["valid"])
    gt_ok = np.asarray(gt_valid)
    gt_np = np.asarray(gt_boxes7)
    matched_full = np.zeros(len(gt_ok), bool)
    if det_ok.any() and gt_ok.any():
        if exact:
            # host twin: ragged shapes here would retrace the jitted op
            # per (D, G) combination (a fresh compile each eval round)
            from lidar_object_detection_tpu.ops.rotated_iou import (
                rotated_iou_matrix_np)
            iou = rotated_iou_matrix_np(det_boxes[det_ok], gt_np[gt_ok])
        else:
            d_aabb = np.asarray(bev_aabb(jnp.asarray(det_boxes[det_ok])))
            g_aabb = np.asarray(bev_aabb(jnp.asarray(gt_np[gt_ok])))
            iou = np.asarray(iou_2d_matrix(jnp.asarray(d_aabb),
                                           jnp.asarray(g_aabb)))
        used = np.zeros(iou.shape[1], bool)
        total_det = int(det_ok.sum())
        for d in range(iou.shape[0]):
            g = int(np.argmax(np.where(used, -1.0, iou[d])))
            if iou[d, g] >= iou_threshold and not used[g]:
                used[g] = True
                matched += 1
        matched_full[np.nonzero(gt_ok)[0][used]] = True
    else:
        total_det = int(det_ok.sum())
    return PillarsEvalResult(matched=matched, total_gt=total_gt,
                             total_det=total_det, matched_gt=matched_full)


def load_aggregated_frames(dataset: Kitti360Dataset,
                           target_frames: Sequence[int],
                           source_frames: Optional[Sequence[int]] = None,
                           grid=None,
                           max_points: Optional[int] = None,
                           protect_in_box: int = 0):
    """Multi-sweep training frames: (points (P, 4), gt boxes7 (G, 7)) per
    target frame, each cloud pose-aggregated from ``source_frames`` into
    the target's velodyne coordinates and cropped to ``grid`` bounds.

    KITTI-360 annotates parked cars all around the ego out to ~125 m;
    single sweeps leave half the GT boxes empty of points (49/102 on the
    sample's first 4 frames), while aggregating the sample's sweeps fills
    101/102 -- the pose chain is data/poses.py.  Cropping to the pillar
    grid keeps the point budget where the detector can use it.

    ``protect_in_box`` > 0 makes the ``max_points`` cap GT-aware: up to
    that many points per GT box are exempt from the stride subsample.
    The plain stride keeps only ~10-25 % of a multi-megapoint aggregate,
    which strands distant boxes (a 40-point box keeps ~4-10) below any
    detector's reach; protection preserves every sparse box's full point
    set while the dense remainder is strided as before.
    """
    from lidar_object_detection_tpu.data.poses import (aggregate_sweeps,
                                                       load_pose_table)

    source_frames = list(source_frames or dataset.frame_ids())
    table = load_pose_table(dataset.root, dataset.seq)
    cam_to_velo = dataset.transforms.cam_to_velo.astype(np.float32)
    out = []
    for tf in target_frames:
        agg = aggregate_sweeps(dataset, tf, source_frames,
                               pose_table=table)
        pts = agg.points[agg.point_valid]
        if grid is not None:
            keep = ((pts[:, 0] >= grid.x_range[0])
                    & (pts[:, 0] <= grid.x_range[1])
                    & (pts[:, 1] >= grid.y_range[0])
                    & (pts[:, 1] <= grid.y_range[1])
                    & (pts[:, 2] >= grid.z_range[0])
                    & (pts[:, 2] <= grid.z_range[1]))
            pts = pts[keep]
        rec = dataset.load_frame(tf, require_image=False)
        corners_velo = np.asarray(transform_corners(
            jnp.asarray(rec.corners_cam0.astype(np.float32)),
            jnp.asarray(cam_to_velo)))
        from lidar_object_detection_tpu.models.pointpillars import (
            corners_to_boxes7 as _c2b)
        boxes7 = np.asarray(_c2b(corners_velo), np.float32).reshape(-1, 7)
        if max_points is not None and len(pts) > max_points:
            pts = cap_points_protected(pts, boxes7, max_points,
                                       protect_in_box)
        out.append((np.ascontiguousarray(pts), boxes7))
    return out


def cap_points_protected(pts: np.ndarray, boxes7: np.ndarray,
                         max_points: int,
                         protect_in_box: int = 0) -> np.ndarray:
    """Cap a cloud to ``max_points``, optionally exempting up to
    ``protect_in_box`` points per GT box from the stride subsample.

    Order-preserving (the kept indices are sorted), so downstream code
    that precomputes per-index structures on the capped cloud stays
    valid.  ``protect_in_box == 0`` is the plain uniform stride."""
    if len(pts) <= max_points:
        return pts
    if protect_in_box <= 0:
        return pts[np.linspace(0, len(pts) - 1,
                               max_points).astype(np.int64)]
    from lidar_object_detection_tpu.models.pointpillars.augment import \
        points_in_box7
    prot = np.zeros(len(pts), bool)
    for b in np.asarray(boxes7, np.float32).reshape(-1, 7):
        idx = np.nonzero(points_in_box7(pts, b))[0]
        if len(idx) > protect_in_box:
            idx = idx[np.linspace(0, len(idx) - 1,
                                  protect_in_box).astype(np.int64)]
        prot[idx] = True
    pidx = np.nonzero(prot)[0]
    rest = np.nonzero(~prot)[0]
    take = max(0, max_points - len(pidx))
    stride = rest[np.linspace(0, len(rest) - 1, take).astype(np.int64)] \
        if take and len(rest) else np.zeros(0, np.int64)
    return pts[np.sort(np.concatenate([pidx, stride]))[:max_points]]


@dataclasses.dataclass
class FrameSplit:
    """Held-out train/eval split over the sample's target frames.

    The 20-frame KITTI-360 sample covers a ~500 m loop while the surround
    pillar grid reaches +-102.4 m, so geographically disjoint splits do
    not exist; instead the split maximizes ego separation and REPORTS the
    leakage: ``eval_gt_overlapped`` counts eval GT boxes whose center
    falls inside the pillar grid of at least one train frame (i.e. the
    same physical parked car may have been a training target).  Honest
    held-out numbers quote both recall overall and on the
    non-overlapped subset.
    """

    train: List[int]
    eval: List[int]
    min_separation_m: float
    eval_gt_total: int
    eval_gt_overlapped: int
    # per eval frame: bool mask over that frame's GT boxes (annotation
    # order, = load_aggregated_frames' boxes7 order), True where the box
    # center is inside some train frame's grid footprint
    overlap_masks: Dict[int, np.ndarray] = dataclasses.field(
        default_factory=dict)

    def summary(self) -> dict:
        return {"train": self.train, "eval": self.eval,
                "min_separation_m": round(self.min_separation_m, 1),
                "eval_gt_total": self.eval_gt_total,
                "eval_gt_overlapped": self.eval_gt_overlapped}


def ego_positions(dataset: Kitti360Dataset,
                  table=None) -> Dict[int, np.ndarray]:
    """World-frame ego (velodyne origin) position per sample frame.

    ``table``: an already-loaded pose table; omitted = parse from disk.
    """
    from lidar_object_detection_tpu.data.poses import (load_pose_table,
                                                       velo_to_world)
    if table is None:
        table = load_pose_table(dataset.root, dataset.seq)
    v2r = dataset.transforms.velo_to_rect.astype(np.float64)
    return {f: velo_to_world(table.lookup(f), v2r)[:3, 3]
            for f in dataset.frame_ids()}


def _gt_centers_world(dataset: Kitti360Dataset, frame_id: int,
                      pose_table, v2r) -> np.ndarray:
    """(G, 3) world-frame GT box centers for one frame."""
    from lidar_object_detection_tpu.data.poses import velo_to_world
    rec = dataset.load_frame(frame_id, require_image=False)
    if rec is None or rec.corners_cam0.shape[0] == 0:
        return np.zeros((0, 3))
    cam_to_velo = dataset.transforms.cam_to_velo.astype(np.float32)
    corners_velo = np.asarray(transform_corners(
        jnp.asarray(rec.corners_cam0.astype(np.float32)),
        jnp.asarray(cam_to_velo)))
    centers_velo = corners_velo.mean(axis=1)                    # (G, 3)
    t = velo_to_world(pose_table.lookup(frame_id), v2r)
    return centers_velo @ t[:3, :3].T + t[:3, 3]


def spatial_split(dataset: Kitti360Dataset,
                  eval_frames: Optional[Sequence[int]] = None,
                  n_eval: int = 2,
                  grid=None,
                  train_frames: Optional[Sequence[int]] = None) -> FrameSplit:
    """Pick (or validate) a held-out eval set over the usable frames.

    When ``eval_frames`` is omitted, exhaustively (n_eval <= 3) or
    greedily selects the eval subset maximizing the minimum ego distance
    to any train frame.  ``grid`` (default: the surround grid) defines
    the per-train-frame reach used for the leakage count.

    ``train_frames`` pins the training set explicitly instead of
    "everything usable minus eval" — used to score an ALREADY-TRAINED
    checkpoint against frames it never saw: separation and leakage masks
    are then computed against the checkpoint's actual training frames
    (e.g. the legacy 4-frame gate), not a hypothetical 17-frame train.
    """
    import itertools

    from lidar_object_detection_tpu.data.poses import load_pose_table

    if grid is None:
        grid = PillarsConfig.kitti360_surround().grid
    usable = [f for f in dataset.frame_ids()
              if dataset.load_bboxes_exists(f)]
    if train_frames is not None:
        train_frames = sorted(set(train_frames))
        unknown = [f for f in train_frames if f not in usable]
        if unknown:
            raise ValueError(f"train frames without GT boxes: {unknown}")
        if not train_frames:
            raise ValueError("train_frames is empty")
    if eval_frames is None and not 0 < n_eval < len(usable):
        raise ValueError(
            f"n_eval={n_eval} must leave at least one training frame "
            f"({len(usable)} usable frames with GT boxes)")
    table = load_pose_table(dataset.root, dataset.seq)
    pos = ego_positions(dataset, table)

    def min_sep(ev):
        base = train_frames if train_frames is not None else usable
        tr = [f for f in base if f not in ev]
        return min(float(np.linalg.norm(pos[e] - pos[t]))
                   for e in ev for t in tr)

    if eval_frames is None:
        pool = ([f for f in usable if f not in train_frames]
                if train_frames is not None else usable)
        if n_eval > len(pool) - (1 if train_frames is None else 0):
            raise ValueError(
                f"n_eval={n_eval} does not fit the candidate pool "
                f"({len(pool)} frames)")
        if n_eval <= 3:
            best = max(itertools.combinations(pool, n_eval), key=min_sep)
        else:   # greedy farthest-point extension of the best pair
            best = list(max(itertools.combinations(pool, 2), key=min_sep))
            while len(best) < n_eval:
                rest = [f for f in pool if f not in best]
                best.append(max(rest, key=lambda f: min_sep(best + [f])))
        eval_frames = sorted(best)
    else:
        eval_frames = sorted(eval_frames)
        unknown = [f for f in eval_frames if f not in usable]
        if unknown:
            raise ValueError(f"eval frames without GT boxes: {unknown}")
        if train_frames is not None:
            leak = sorted(set(eval_frames) & set(train_frames))
            if leak:
                raise ValueError(f"eval frames also in train set: {leak}")
    train = (train_frames if train_frames is not None
             else [f for f in usable if f not in eval_frames])
    if not train:
        raise ValueError("eval set leaves no training frames")

    # leakage: eval GT centers inside any train frame's grid footprint
    # (checked exactly, in each train frame's velodyne coordinates)
    from lidar_object_detection_tpu.data.poses import velo_to_world
    v2r = dataset.transforms.velo_to_rect.astype(np.float64)
    train_inv = [np.linalg.inv(velo_to_world(table.lookup(t), v2r))
                 for t in train]
    total = overlapped = 0
    masks: Dict[int, np.ndarray] = {}
    for e in eval_frames:
        centers = _gt_centers_world(dataset, e, table, v2r)
        total += len(centers)
        m = np.zeros(len(centers), bool)
        for i, c in enumerate(centers):
            for tinv in train_inv:
                lc = tinv[:3, :3] @ c + tinv[:3, 3]
                if (grid.x_range[0] <= lc[0] <= grid.x_range[1]
                        and grid.y_range[0] <= lc[1] <= grid.y_range[1]):
                    m[i] = True
                    break
        overlapped += int(m.sum())
        masks[e] = m
    return FrameSplit(train=train, eval=list(eval_frames),
                      min_separation_m=min_sep(eval_frames),
                      eval_gt_total=total, eval_gt_overlapped=overlapped,
                      overlap_masks=masks)


def pack_frames(frames: Sequence, num_points: int, max_gt: int = MAX_GT):
    """Fixed-shape batch arrays from a list of (points, boxes7) frames:
    (pts (B,P,4), pv (B,P), gt (B,G,7), gcls (B,G) int32, gv (B,G))."""
    n = len(frames)
    pts = np.zeros((n, num_points, 4), np.float32)
    pv = np.zeros((n, num_points), bool)
    gt = np.zeros((n, max_gt, 7), np.float32)
    gcls = np.zeros((n, max_gt), np.int32)
    gv = np.zeros((n, max_gt), bool)
    for j, (p, bx) in enumerate(frames):
        k = min(len(p), num_points)
        pts[j, :k] = p[:k]
        pv[j, :k] = True
        g = min(len(bx), max_gt)
        gt[j, :g] = bx[:g]
        gv[j, :g] = True
    return pts, pv, gt, gcls, gv


def bev_average_precision(dets, gts, iou_threshold: float = 0.5) -> float:
    """Continuous-interpolation BEV average precision at ``iou_threshold``.

    ``dets``: per frame, an (boxes7 (D,7), scores (D,)) pair of ndarrays;
    ``gts``: per frame, a (G,7) ndarray.  Detections are ranked globally
    by score and matched greedily (one GT per detection, rotated IoU), the
    standard single-class AP protocol (precision envelope integrated over
    recall).  This is the quality headline for the pure-LiDAR path --
    the reference has no 3D detector, so there is no parity number; the
    comparison target is the PointPillars paper's KITTI BEV AP protocol.
    """
    from lidar_object_detection_tpu.ops.rotated_iou import (
        rotated_iou_matrix_np)

    rows = []  # (score, frame, det_index)
    for f, (boxes, scores) in enumerate(dets):
        for d in range(len(boxes)):
            rows.append((float(scores[d]), f, d))
    rows.sort(key=lambda r: -r[0])
    n_gt = sum(len(g) for g in gts)
    if n_gt == 0 or not rows:
        return 0.0
    iou_cache = {}
    for f, (boxes, _) in enumerate(dets):
        if len(boxes) and len(gts[f]):
            iou_cache[f] = rotated_iou_matrix_np(boxes, gts[f])
    used = {f: np.zeros(len(g), bool) for f, g in enumerate(gts)}
    tp = np.zeros(len(rows))
    fp = np.zeros(len(rows))
    for i, (_, f, d) in enumerate(rows):
        iou = iou_cache.get(f)
        if iou is None or iou.shape[1] == 0:
            fp[i] = 1
            continue
        masked = np.where(used[f], -1.0, iou[d])
        g = int(np.argmax(masked))
        if masked[g] >= iou_threshold:
            used[f][g] = True
            tp[i] = 1
        else:
            fp[i] = 1
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1)
    mrec = np.concatenate([[0.0], recall, [recall[-1]]])
    mpre = np.concatenate([[0.0], precision, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def train_pointpillars(dataset_root: str, steps: int = 50,
                       frame_ids: Optional[Sequence[int]] = None,
                       cfg: Optional[PillarsConfig] = None,
                       learning_rate: float = 2e-3,
                       batch_frames: int = 4,
                       log_every: int = 10,
                       eval_score_threshold: float = 0.1,
                       checkpoint_dir: Optional[str] = None,
                       augment: bool = True,
                       gt_sample_max: int = 12,
                       seed: int = 0,
                       eval_iou: float = 0.5,
                       eval_exact: bool = True,
                       surround: bool = False,
                       aggregate: bool = False,
                       max_points: Optional[int] = None,
                       head: Optional[str] = None) -> Dict:
    """Train on the bundled sample (an overfit/regression harness, not a
    full KITTI training run -- the sample has 19 frames).

    ``augment=True`` applies the Lang et al. section-3 recipe host-side
    per step: GT-database paste sampling + global rotation/flip/scale
    (models/pointpillars/augment.py); evaluation always runs on the
    un-augmented frames.

    ``surround=True`` selects :meth:`PillarsConfig.kitti360_surround`
    (360-degree grid); ``aggregate=True`` trains on pose-aggregated
    multi-sweep clouds (:func:`load_aggregated_frames`) -- together they
    lift the front-sector / single-sweep coverage ceilings (19/102 grid,
    49/102 point coverage on the sample's first 4 frames).
    """
    from lidar_object_detection_tpu.models.pointpillars.augment import (
        GtDatabase, augment_frame)

    cfg = resolve_pillars_config(cfg, surround=surround, head=head)
    shapes = ShapeConfig()
    ds = Kitti360Dataset(dataset_root, shapes=shapes)
    p_max = max_points or shapes.max_points
    if aggregate:
        targets = list(frame_ids or ds.frame_ids())
        frames = load_aggregated_frames(ds, targets, grid=cfg.grid,
                                        max_points=p_max)
    else:
        records = ds.load_frames(frame_ids, require_image=False)
        cam_to_velo = ds.transforms.cam_to_velo.astype(np.float32)
        frames = []
        for rec in records:
            corners_velo = np.asarray(transform_corners(
                jnp.asarray(rec.corners_cam0.astype(np.float32)),
                jnp.asarray(cam_to_velo)))
            boxes7 = np.asarray(corners_to_boxes7(corners_velo), np.float32)
            frames.append((rec.points.astype(np.float32),
                           boxes7.reshape(-1, 7)))
    db = GtDatabase.build(frames) if augment else None
    rng = np.random.default_rng(seed)

    def make_batch(sel, train: bool):
        b = len(sel)
        pts = np.zeros((b, p_max, 4), np.float32)
        pv = np.zeros((b, p_max), bool)
        gt = np.zeros((b, MAX_GT, 7), np.float32)
        gcls = np.zeros((b, MAX_GT), np.int32)
        gv = np.zeros((b, MAX_GT), bool)
        for j, i in enumerate(sel):
            p, bx = frames[i]
            if train and augment:
                room = max(0, MAX_GT - bx.shape[0])
                p, bx = augment_frame(p, bx, db, rng,
                                      max_samples=min(gt_sample_max, room))
            if len(p) > p_max:
                # random subsample -- paste-augmented points sit at the
                # tail, so a plain truncation would drop exactly them
                p = p[rng.choice(len(p), p_max, replace=False)]
            n = len(p)
            pts[j, :n] = p
            pv[j, :n] = True
            g = min(len(bx), MAX_GT)
            gt[j, :g] = bx[:g]
            gv[j, :g] = True
        return pts, pv, gt, gcls, gv

    mesh = make_mesh(jax.devices()[:1])
    trainer = PillarsTrainer(cfg, mesh, num_points=p_max,
                             learning_rate=learning_rate)

    n = len(frames)
    history: List[float] = []
    for step in range(steps):
        sel = [(step * batch_frames + j) % n for j in range(batch_frames)]
        metrics = trainer.train_step(*make_batch(sel, train=True))
        loss = float(metrics["loss"])
        history.append(loss)
        if log_every and step % log_every == 0:
            print(f"step {step}: loss={loss:.4f} "
                  f"cls={float(metrics['cls']):.4f} "
                  f"box={float(metrics['box']):.4f} "
                  f"num_pos={int(metrics['num_pos'])}")
    if checkpoint_dir:
        from lidar_object_detection_tpu.parallel.checkpoint import (
            CheckpointManager)
        CheckpointManager(checkpoint_dir).save(steps, trainer.state)

    # eval on the (un-augmented) training frames
    eval_sel = list(range(min(batch_frames, n)))
    pts, pv, gt, _, gv = make_batch(eval_sel, train=False)
    out = trainer.apply(pts, pv)
    results = []
    for i in eval_sel:
        one = jax.tree_util.tree_map(lambda x: x[i], out)
        # overfit-harness threshold: focal-loss confidence ramps slowly on
        # tiny datasets; production decoding uses 0.3
        det = decode_predictions(one, cfg,
                                 score_threshold=eval_score_threshold,
                                 rotated_nms=eval_exact)
        results.append(evaluate_bev(det, gt[i], gv[i],
                                    iou_threshold=eval_iou,
                                    exact=eval_exact))
    return {"loss_history": history, "trainer": trainer, "eval": results}


def resolve_pillars_config(cfg: Optional[PillarsConfig] = None,
                           surround: bool = False,
                           head: Optional[str] = None) -> PillarsConfig:
    """Single source of the config-resolution rule shared by
    train_pointpillars and infer_pointpillars (so the two cannot
    silently diverge on grid/head selection)."""
    cfg = cfg or (PillarsConfig.kitti360_surround() if surround
                  else PillarsConfig())
    if head is not None:
        cfg = dataclasses.replace(cfg, head=head)
    return cfg


def pillars_config_meta(cfg: PillarsConfig) -> Dict:
    """The config fields a checkpoint consumer must agree on: a mismatch
    loads cleanly (every layer is grid-extent-agnostic conv/BN) but
    decodes in the wrong coordinate frame."""
    g = cfg.grid
    return {"head": cfg.head, "x_range": list(g.x_range),
            "y_range": list(g.y_range), "z_range": list(g.z_range),
            "pillar_size": g.pillar_size}


def load_pillars_variables(ckpt_path: str,
                           expect_cfg: Optional[PillarsConfig] = None):
    """Model variables from a surround-runner checkpoint.

    The runner (examples/train_pointpillars_surround.py) serializes the
    tuple ``(variables, opt_state, step)`` with flax msgpack; restoring
    without a template (``msgpack_restore``) sidesteps the opt-state
    structure (constant-vs-schedule optimizers differ there), since
    inference only needs the variables dict.  Returns (variables, step).

    With ``expect_cfg`` and a ``<ckpt>.json`` sidecar (written by the
    runner), the grid/head metadata is cross-checked: the variables of a
    surround-trained model load without shape errors into a front-grid
    model (convs are grid-agnostic) and then decode garbage coordinates,
    so a mismatch must be a loud error, not silent wrong output.
    """
    import json as _json
    import os

    from flax import serialization

    with open(ckpt_path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    variables, step = raw["0"], raw["2"]
    sidecar = ckpt_path + ".json"
    if expect_cfg is not None and not os.path.exists(sidecar):
        import warnings
        warnings.warn(
            f"checkpoint {ckpt_path} has no {os.path.basename(sidecar)} "
            "sidecar; cannot verify it matches the requested "
            "--surround/--head config. A mismatched grid decodes garbage "
            "coordinates silently.", stacklevel=2)
    if expect_cfg is not None and os.path.exists(sidecar):
        with open(sidecar) as f:
            saved = _json.load(f)
        want = pillars_config_meta(expect_cfg)
        mismatch = {k: (saved.get(k), v) for k, v in want.items()
                    if saved.get(k) != v}
        if mismatch:
            raise ValueError(
                f"checkpoint {ckpt_path} was trained with a different "
                f"config than requested (saved vs requested): {mismatch}. "
                "Pass matching --surround/--head flags (or the cfg the "
                "checkpoint was trained with).")
    return variables, int(np.asarray(step))


def infer_pointpillars(dataset_root: str, ckpt_path: str,
                       frame_ids: Optional[Sequence[int]] = None,
                       cfg: Optional[PillarsConfig] = None,
                       surround: bool = False,
                       aggregate: bool = False,
                       head: Optional[str] = None,
                       max_points: Optional[int] = None,
                       protect_in_box: int = 0,
                       score_threshold: float = 0.3,
                       rotated_nms: bool = True,
                       output_dir: Optional[str] = None,
                       export_ply: bool = False) -> List[Dict]:
    """Run a trained PointPillars checkpoint over dataset frames.

    Returns one dict per frame: ``{"frame", "boxes7" (D, 7), "scores"
    (D,), "classes" (D,)}`` (only valid detections).  With
    ``output_dir``, writes ``detections_<frame>.json`` per frame and --
    with ``export_ply`` -- ``scene_<frame>.ply`` (gray cloud + red
    predicted wireframes via the shared viz/export path).
    """
    import os

    from lidar_object_detection_tpu.models.pointpillars import (
        PointPillars, boxes7_to_corners, decode_predictions)

    cfg = resolve_pillars_config(cfg, surround=surround, head=head)
    variables, step = load_pillars_variables(ckpt_path, expect_cfg=cfg)
    model = PointPillars(cfg)
    apply_fn = jax.jit(model.apply)   # identical shapes -> compile once

    shapes = ShapeConfig()
    ds = Kitti360Dataset(dataset_root, shapes=shapes)
    p_max = max_points or shapes.max_points
    ids = list(frame_ids or ds.frame_ids())
    if aggregate:
        frames = load_aggregated_frames(ds, ids, grid=cfg.grid,
                                        max_points=p_max,
                                        protect_in_box=protect_in_box)
        clouds = iter(p for p, _ in frames)
    else:
        # stream: one cloud resident at a time
        clouds = iter(ds.load_frame(f, require_image=False)
                      .points.astype(np.float32) for f in ids)

    out: List[Dict] = []
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    for frame, pts in zip(ids, clouds):
        if len(pts) > p_max:
            pts = pts[np.linspace(0, len(pts) - 1, p_max).astype(np.int64)]
        buf = np.zeros((1, p_max, 4), np.float32)
        buf[0, :len(pts)] = pts[:, :4]
        pv = np.zeros((1, p_max), bool)
        pv[0, :len(pts)] = True
        raw = apply_fn(variables, jnp.asarray(buf), jnp.asarray(pv))
        one = jax.tree_util.tree_map(lambda x: x[0], raw)
        det = decode_predictions(one, cfg, score_threshold=score_threshold,
                                 rotated_nms=rotated_nms)
        ok = np.asarray(det["valid"])
        rec = {"frame": int(frame),
               "boxes7": np.asarray(det["boxes7"])[ok],
               "scores": np.asarray(det["scores"])[ok],
               "classes": np.asarray(det["classes"])[ok],
               "ckpt_step": step}
        out.append(rec)
        if output_dir:
            import json as _json

            with open(os.path.join(output_dir,
                                   f"detections_{frame:010d}.json"),
                      "w") as f:
                _json.dump({k: (v.tolist() if isinstance(v, np.ndarray)
                                else v) for k, v in rec.items()}, f,
                           indent=1)
            if export_ply:
                from lidar_object_detection_tpu.viz.export import (
                    export_fusion_scene)

                corners = np.asarray(boxes7_to_corners(
                    jnp.asarray(rec["boxes7"])))
                export_fusion_scene(
                    os.path.join(output_dir, f"scene_{frame:010d}.ply"),
                    pts[:, :3], None,
                    [{"corners_velo": c} for c in corners])
    return out
