"""The fusion pipeline runner -- public entry points mirroring the
reference scripts (SURVEY.md section 7, step 6).

One parameterized runner covers V1-V3 + csv_eval (point-count matching with
or without erosion), V4 (greedy 2D IoU) and V5 (Hungarian); thin wrappers
pin each version's reference defaults.  The per-frame outputs carry
everything the reference's scripts print/visualize/export:

  * per-car statistics rows (V2/V3/cvs_erosion master CSV schema),
  * matched (corners_velo, detection) pairs for wireframe rendering
    (V1:400-405, V4:177-182, V5:553-556),
  * per-detection point clouds (index lists into the padded scan),
  * optional per-car depth maps (seg_with_pointcloud.py).

Everything device-side runs through ONE jitted, vmapped fusion step; the
runner only orchestrates IO, the detector, and host-side formatting.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lidar_object_detection_tpu.config import (
    FusionConfig, MatchStrategy, PipelineVersion)
from lidar_object_detection_tpu.data.kitti360 import (
    FrameBatch, FrameRecord, Kitti360Dataset)
from lidar_object_detection_tpu.eval import statistics as stats_lib
from lidar_object_detection_tpu.fusion import (
    FusionParams, fuse_batch, greedy_iou_match, hungarian_match)
from lidar_object_detection_tpu.models.stub import StubDetector
from lidar_object_detection_tpu.ops.scatter import scatter_depth_maps


@dataclasses.dataclass
class FrameResult:
    frame_id: int
    statistics: List[stats_lib.CarStatistics]
    matched_pairs: List[dict]          # {detection, box_index, corners_velo, ...}
    num_detections: int
    num_visible_boxes: int


@dataclasses.dataclass
class RunResult:
    """``frames_per_s`` is END-TO-END: detection (when this run performed
    it) + fusion + matching.  ``fusion_frames_per_s`` covers only the
    post-detection device work; ``detect_s`` is 0.0 when detections were
    injected by the caller."""

    frames: List[FrameResult]
    csv_rows: List[stats_lib.CarStatistics]
    elapsed_s: float            # detect_s + fusion/matching time
    frames_per_s: float         # e2e (same window as elapsed_s)
    detect_s: float = 0.0
    fusion_frames_per_s: float = 0.0

    def summary(self) -> dict:
        return stats_lib.summarize(self.csv_rows)


class FusionPipeline:
    """Glue: dataset -> detector -> jitted fusion -> eval/export."""

    def __init__(self, dataset: Kitti360Dataset, config: FusionConfig,
                 detector=None):
        self.dataset = dataset
        self.config = config
        self.params = FusionParams.from_config(config)
        t = dataset.transforms
        self.detector = detector or StubDetector(
            dataset.camera, max_detections=config.shapes.max_detections,
            depth_range=(0.0, config.depth_max),
            corners_to_cam=t.corners_cam0_to_cam)
        self._velo_to_rect = jnp.asarray(t.velo_to_rect, dtype=jnp.float32)
        # GT corners are annotated in cam0; for cam k>0 they must be moved
        # into the rectified cam-k frame before projection/visibility, and
        # the corners->velodyne matrix composes back through cam0_to_velo so
        # corners_velo is camera-independent (see calib.TransformChain).
        self._corners_to_cam = (
            None if dataset.camera.cam_id == 0
            else jnp.asarray(t.corners_cam0_to_cam, dtype=jnp.float32))
        self._corners_to_velo = jnp.asarray(t.corners_to_velo,
                                            dtype=jnp.float32)
        self._intrinsics = jnp.asarray(dataset.camera.intrinsics,
                                       dtype=jnp.float32)

    def _gt_corners(self, batch: FrameBatch) -> jnp.ndarray:
        """Batch GT corners in the configured camera's projection frame."""
        corners = jnp.asarray(batch.corners_cam0)
        if self._corners_to_cam is not None:
            from lidar_object_detection_tpu.geom.boxes import transform_corners
            corners = transform_corners(corners, self._corners_to_cam)
        return corners

    # ------------------------------------------------------------------
    def detect(self, records, batch: FrameBatch,
               images: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """Run the configured detector; Yolo gets images, the stub gets
        the frame records.  ``images`` lets callers (the streaming path)
        inject pre-loaded pixels so decode overlaps device compute."""
        if isinstance(self.detector, StubDetector):
            return self.detector.detect_records(records)
        if images is None:
            images = self.dataset.load_images(batch)
        out = self.detector.detect(images)
        return {k: np.asarray(v) for k, v in out.items()}

    def fuse(self, batch: FrameBatch, detections: Dict[str, np.ndarray]):
        return fuse_batch(
            jnp.asarray(batch.points), jnp.asarray(batch.point_valid),
            jnp.asarray(detections["mask_bits"]),
            jnp.asarray(detections["det_valid"]),
            self._gt_corners(batch), jnp.asarray(batch.box_valid),
            self._velo_to_rect, self._corners_to_velo, self._intrinsics,
            self.params)

    # ------------------------------------------------------------------
    def run(self, frame_ids: Optional[Sequence[int]] = None,
            master_csv: Optional[str] = None,
            detections: Optional[Dict[str, np.ndarray]] = None) -> RunResult:
        records = self.dataset.load_frames(frame_ids)
        if not records:
            return RunResult([], [], 0.0, 0.0)
        batch = self.dataset.make_batch(records)
        detect_s = 0.0
        if detections is None:
            td = time.perf_counter()
            detections = self.detect(records, batch)
            detect_s = time.perf_counter() - td

        t0 = time.perf_counter()
        fused = self.fuse(batch, detections)
        strategy = self.config.match_strategy
        if strategy == MatchStrategy.GREEDY_IOU:
            match_idx, match_iou = jax.vmap(
                lambda db, dv, c, bv: greedy_iou_match(
                    db, dv, c, bv, self._intrinsics,
                    self.config.greedy_min_iou))(
                jnp.asarray(detections["boxes"]),
                jnp.asarray(detections["det_valid"]),
                self._gt_corners(batch),
                jnp.asarray(fused["box_visible"]))
            match_aux = {"iou": np.asarray(match_iou)}
            match_idx = np.asarray(match_idx)
        elif strategy == MatchStrategy.HUNGARIAN:
            c = self.config
            match_idx, m_score, m_iou = jax.vmap(
                lambda db, dv, corners, bv: hungarian_match(
                    db, dv, corners, bv, self._intrinsics,
                    c.hungarian_min_score, c.hungarian_min_iou,
                    c.score_weight_iou, c.score_weight_center,
                    c.score_weight_size, c.center_norm))(
                jnp.asarray(detections["boxes"]),
                jnp.asarray(detections["det_valid"]),
                self._gt_corners(batch),
                jnp.asarray(batch.box_valid))
            match_aux = {"score": np.asarray(m_score),
                         "iou": np.asarray(m_iou)}
            match_idx = np.asarray(match_idx)
        else:
            match_idx = np.asarray(fused["best_box"])
            match_aux = {}
        jax.block_until_ready(fused["counts"])
        elapsed = time.perf_counter() - t0

        fused_np = {k: np.asarray(v) for k, v in fused.items()
                    if k not in ("point_bits", "eroded_mask_bits")}
        frames: List[FrameResult] = []
        all_rows: List[stats_lib.CarStatistics] = []
        for i, rec in enumerate(records):
            rows = stats_lib.frame_statistics(
                rec.frame_id, fused_np["total_points"][i],
                fused_np["best_box"][i], fused_np["points_inside"][i],
                fused_np["matched"][i], detections["det_valid"][i],
                fused_np["box_visible"][i])
            pairs = self._matched_pairs(
                i, rec, match_idx[i], detections, fused_np, match_aux)
            frames.append(FrameResult(
                frame_id=rec.frame_id, statistics=rows, matched_pairs=pairs,
                num_detections=int(detections["det_valid"][i].sum()),
                num_visible_boxes=int(fused_np["box_visible"][i].sum())))
            all_rows.extend(rows)
            if master_csv:
                stats_lib.append_to_master_csv(rows, master_csv)
        total = elapsed + detect_s
        fps = len(records) / total if total > 0 else 0.0
        fusion_fps = len(records) / elapsed if elapsed > 0 else 0.0
        return RunResult(frames=frames, csv_rows=all_rows,
                         elapsed_s=total, frames_per_s=fps,
                         detect_s=detect_s, fusion_frames_per_s=fusion_fps)

    def _matched_pairs(self, i, rec, match_idx, detections, fused_np,
                       match_aux) -> List[dict]:
        pairs = []
        corners_velo = fused_np["corners_velo"][i]
        for det in range(self.config.shapes.max_detections):
            if not detections["det_valid"][i][det]:
                continue
            box = int(match_idx[det])
            if box < 0:
                continue
            pair = {"detection": det, "box_index": box,
                    "corners_velo": corners_velo[box]}
            for k, v in match_aux.items():
                pair[k] = float(v[i][det])
            if self.config.match_strategy == MatchStrategy.POINT_COUNT:
                pair["point_count"] = int(fused_np["points_inside"][i][det])
            pairs.append(pair)
        if self.config.match_strategy == MatchStrategy.HUNGARIAN:
            # V5 appends every unmatched GT box in light gray (V5:408-414)
            matched_boxes = {p["box_index"] for p in pairs}
            box_valid = fused_np["box_visible"][i]
            for g in range(box_valid.shape[0]):
                if box_valid[g] and g not in matched_boxes:
                    pairs.append({"detection": -1, "box_index": g,
                                  "corners_velo": corners_velo[g],
                                  "unmatched": True,
                                  "color": (0.7, 0.7, 0.7)})
        return pairs

    # ------------------------------------------------------------------
    def compaction_spec(self, max_out: Optional[int] = None,
                        multiple: int = 4096):
        """The host-cull spec matching this pipeline's device validity test
        (see :class:`~...data.native.CompactionSpec`): points outside the
        camera frustum / depth range are dropped in the loader threads, and
        the device's exact test masks the conservative leftovers, so fusion
        outputs are identical."""
        from lidar_object_detection_tpu.data.native import CompactionSpec

        s = self.config.shapes
        if max_out is None:
            max_out = s.max_points // 2
        max_out = max(multiple, (max_out // multiple) * multiple)
        return CompactionSpec.build(
            self.dataset.transforms.velo_to_rect,
            self.dataset.camera.intrinsics, s.image_width, s.image_height,
            self.config.depth_min, self.config.depth_max, max_out)

    def stream(self, frame_ids: Optional[Sequence[int]] = None,
               chunk: int = 8, store=None, compact: bool = True,
               num_threads: int = 2):
        """Streaming full-sequence fusion (BASELINE.json configs[4]):
        the native threaded prefetcher reads scans ahead of the device
        (data/native.py) while fixed-size chunks run through the jitted
        pipeline; results flow into an idempotent MetricStore when given.

        The prefetcher's buffers feed the device directly -- scans are
        never re-read -- and with ``compact=True`` the loader threads also
        FOV/depth-cull each scan to half the padded size (exact-output
        preserving; see :meth:`compaction_spec`).

        Yields (frame_id, rows) per processed frame.
        """
        from lidar_object_detection_tpu.data.native import ScanPrefetcher

        ids = list(frame_ids) if frame_ids is not None \
            else self.dataset.frame_ids()
        # keep only frames with boxes (reference skip semantics)
        ids = [f for f in ids
               if self.dataset.load_bboxes_exists(f)]
        s = self.config.shapes
        paths = [self.dataset.scan_path(f) for f in ids]
        spec = self.compaction_spec() if compact else None
        pre = iter(ScanPrefetcher(paths, s.max_points,
                                  num_threads=num_threads,
                                  queue_depth=2 * chunk, compaction=spec))

        def chunks():
            pending = []
            done = False
            while not done:
                while len(pending) < chunk:
                    try:
                        idx, pts, valid, n = next(pre)
                    except StopIteration:
                        done = True
                        break
                    pending.append((ids[idx], pts, valid, n))
                if not pending:
                    break
                keep = []
                for fid, pts, valid, n in pending[:chunk]:
                    corners = self.dataset.load_boxes(fid)
                    if corners is None:
                        continue
                    keep.append((fid, pts, valid, n, corners))
                del pending[:chunk]
                if not keep:
                    continue
                batch = self._assemble_stream_batch(keep)
                records = [FrameRecord(frame_id=fid, points=pts[:n],
                                       corners_cam0=corners,
                                       image_path=self.dataset.image_path(fid))
                           for fid, pts, _, n, corners in keep]
                images = (None if isinstance(self.detector, StubDetector)
                          else self.dataset.load_images(batch))
                yield keep, batch, records, images

        # image decode / scan IO run one chunk ahead of the device
        import queue
        import threading
        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()

        def put_checked(msg) -> bool:
            """Bounded put that gives up when the consumer is gone, so an
            abandoned generator can never wedge the producer thread (and
            with it the C++ prefetcher's buffers) on a full queue."""
            while not stop.is_set():
                try:
                    q.put(msg, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # an IO/decode failure must surface in the consumer as the
            # exception it is -- NOT as a silently truncated stream that
            # looks like a complete run
            try:
                for item in chunks():
                    if not put_checked(("item", item)):
                        return
                put_checked(("done", None))
            except BaseException as exc:  # noqa: BLE001 -- re-raised below
                put_checked(("error", exc))

        threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                kind, item = q.get()
                if kind == "done":
                    break
                if kind == "error":
                    raise item
                keep, batch, records, images = item
                detections = self.detect(records, batch, images=images)
                fused = self.fuse(batch, detections)
                fused_np = {k: np.asarray(v) for k, v in fused.items()
                            if k in ("total_points", "best_box",
                                     "points_inside", "matched",
                                     "box_visible")}
                for i, (fid, *_rest) in enumerate(keep):
                    rows = stats_lib.frame_statistics(
                        fid, fused_np["total_points"][i],
                        fused_np["best_box"][i], fused_np["points_inside"][i],
                        fused_np["matched"][i], detections["det_valid"][i],
                        fused_np["box_visible"][i])
                    if store is not None:
                        store.update_frame(fid, rows)
                    yield fid, rows
        finally:
            stop.set()
            try:                      # unblock a producer mid-put
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def _assemble_stream_batch(self, keep) -> FrameBatch:
        """Fixed-shape batch straight from prefetcher buffers: the point
        arrays are stacked as-delivered (already padded by the loader), only
        corners get the usual pad-to-max_boxes treatment."""
        s = self.config.shapes
        b = len(keep)
        corners = np.zeros((b, s.max_boxes, 8, 3), np.float32)
        box_valid = np.zeros((b, s.max_boxes), bool)
        for i, (_, _, _, _, c) in enumerate(keep):
            g = c.shape[0]
            if g > s.max_boxes:
                raise ValueError(f"{g} boxes exceed max_boxes={s.max_boxes}")
            corners[i, :g] = c.astype(np.float32)
            box_valid[i, :g] = True
        return FrameBatch(
            frame_ids=np.asarray([k[0] for k in keep], np.int32),
            points=np.stack([k[1] for k in keep]),
            point_valid=np.stack([k[2] for k in keep]),
            corners_cam0=corners, box_valid=box_valid,
            image_paths=[self.dataset.image_path(k[0]) for k in keep])

    # ------------------------------------------------------------------
    def analysis_cloud(self, frame_id: int, mode: str = "inside_outside"):
        """The V2 per-point bbox-analysis cloud
        (V2_point_cloud_without_erosion.py:446-491): each matched car's
        points labeled inside/outside its matched GT box.

        Returns (points (N, 3), colors (N, 3) in [0,1], matched corners
        list) over the frame's valid points.
        """
        from lidar_object_detection_tpu.fusion import point_inside_labels
        from lidar_object_detection_tpu.viz.overlay import (
            analysis_cloud_colors)

        records = self.dataset.load_frames([frame_id])
        if not records:
            raise ValueError(f"frame {frame_id} not loadable")
        batch = self.dataset.make_batch(records)
        detections = self.detect(records, batch)
        fused = self.fuse(batch, detections)
        d = self.config.shapes.max_detections
        inside_bits = point_inside_labels(
            jnp.asarray(batch.points[0]), fused["point_bits"][0],
            fused["corners_velo"][0], fused["best_box"][0],
            fused["matched"][0], num_detections=d)
        valid = np.asarray(batch.point_valid[0])   # real (non-pad) points
        colors = analysis_cloud_colors(
            np.asarray(fused["point_bits"][0])[valid],
            np.asarray(inside_bits)[valid], d, mode=mode)
        pts = batch.points[0][valid][:, :3]
        corners = [np.asarray(fused["corners_velo"][0][int(b)])
                   for b, m in zip(np.asarray(fused["best_box"][0]),
                                   np.asarray(fused["matched"][0])) if m]
        return pts, colors, corners

    # ------------------------------------------------------------------
    def depth_maps(self, frame_ids: Optional[Sequence[int]] = None,
                   with_seg_images: bool = True):
        """Per-car depth maps (seg_with_pointcloud.py:160-170), on device.

        Yields (frame_id, car_id, depth_map, seg_image) for each detection
        with points.  ``seg_image`` is the frame image with the detection
        masks blended over it -- the reference overlays the depth panel on
        the *segmented* image (seg_with_pointcloud.py:173-194), so the
        figure writer needs it; pass ``with_seg_images=False`` to skip the
        image load and get ``None`` there.
        """
        records = self.dataset.load_frames(frame_ids)
        batch = self.dataset.make_batch(records)
        detections = self.detect(records, batch)
        fused = self.fuse(batch, detections)
        s = self.config.shapes
        from lidar_object_detection_tpu.ops.masks import (unpack_masks,
                                                          unpack_point_bits)
        dm = jax.vmap(
            lambda u, v, d, bits, pv: scatter_depth_maps(
                u, v, d, unpack_point_bits(bits, s.max_detections), pv,
                s.image_height, s.image_width))(
            fused["u"], fused["v"], fused["depth"], fused["point_bits"],
            fused["point_valid"])
        dm = np.asarray(dm)
        images = self.dataset.load_images(batch) if with_seg_images else None
        for i, rec in enumerate(records):
            seg = None
            if images is not None:
                from lidar_object_detection_tpu.viz.overlay import \
                    overlay_masks
                masks = unpack_masks(
                    np.asarray(detections["mask_bits"][i]), s.max_detections)
                valid = np.asarray(detections["det_valid"][i], bool)
                seg = overlay_masks(images[i], masks[valid])
            for det in range(s.max_detections):
                if not detections["det_valid"][i][det]:
                    continue
                if dm[i, det].max() <= 0:
                    continue   # reference skips empty maps (:174-175)
                yield rec.frame_id, det + 1, dm[i, det], seg


# ---------------------------------------------------------------------------
# Version entry points (reference script equivalents)
# ---------------------------------------------------------------------------

def _make(dataset_root: str, version: PipelineVersion, detector=None,
          **overrides) -> FusionPipeline:
    cfg = FusionConfig.for_version(version)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    ds = Kitti360Dataset(dataset_root, shapes=cfg.shapes)
    return FusionPipeline(ds, cfg, detector)


def v1_pointwise(dataset_root: str, detector=None, **kw) -> FusionPipeline:
    """V1_BBox_Pointwise_filtering.py equivalent."""
    return _make(dataset_root, PipelineVersion.V1_POINTWISE, detector, **kw)


def v2_stats(dataset_root: str, detector=None, **kw) -> FusionPipeline:
    """V2_point_cloud_without_erosion.py equivalent."""
    return _make(dataset_root, PipelineVersion.V2_STATS, detector, **kw)


def v3_erosion(dataset_root: str, detector=None, **kw) -> FusionPipeline:
    """V3_point_cloud_with_erosion.py equivalent."""
    return _make(dataset_root, PipelineVersion.V3_EROSION, detector, **kw)


def v4_iou(dataset_root: str, detector=None, **kw) -> FusionPipeline:
    """V4_BBox_IoU_filtering.py equivalent (greedy IoU, depth < 30)."""
    return _make(dataset_root, PipelineVersion.V4_IOU, detector, **kw)


def v5_projected(dataset_root: str, detector=None, **kw) -> FusionPipeline:
    """V5_ProjectingBBoxes.py equivalent (Hungarian matching)."""
    return _make(dataset_root, PipelineVersion.V5_PROJECTED, detector, **kw)


def csv_eval(dataset_root: str, master_csv: str, detector=None,
             **kw) -> dict:
    """cvs_erosion.py equivalent: batch run, master CSV, whole-run analysis."""
    pipe = _make(dataset_root, PipelineVersion.CSV_EVAL, detector, **kw)
    pipe.run(master_csv=master_csv)
    return stats_lib.analyze_master_csv(master_csv)
