"""Example: drive the framework end-to-end through its public API on TPU.

Loads the bundled 20-frame KITTI-360 sample, runs the batched fused pipeline:
load the bundled 20-frame KITTI-360 sample, run the batched fused pipeline
(projection -> erosion -> mask gather -> inside counts -> matching), and
write the master statistics CSV like the reference's cvs_erosion run."""
import sys, time, tempfile, os
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
from lidar_object_detection_tpu.data import Kitti360Dataset
from lidar_object_detection_tpu.fusion import FusionParams, fuse_batch
from lidar_object_detection_tpu.ops import pack_masks
from lidar_object_detection_tpu.eval import (
    frame_statistics, append_to_master_csv, analyze_master_csv, summarize)

root = "/root/reference/KITTI360_sample"
cfg = FusionConfig.for_version(PipelineVersion.CSV_EVAL)
params = FusionParams.from_config(cfg)

ds = Kitti360Dataset(root)
records = ds.load_frames()
print(f"loaded {len(records)} frames; points/frame:",
      [r.num_points for r in records[:5]], "...")
batch = ds.make_batch(records)

# Synthetic detections from projected GT boxes (stub-detector pattern; the
# Flax YOLO port plugs in here later).
cam = ds.camera
def masks_for(rec):
    D = params.num_detections
    planes = np.zeros((D, cam.height, cam.width), bool)
    valid = np.zeros(D, bool)
    boxes2d = np.zeros((D, 4), np.float32)
    d_i = 0
    for c in rec.corners_cam0:
        u, v, z = cam.cam2image(c.T)
        pos = z > 0
        if not pos.any() or not (0 < z[pos].mean() < 40):
            continue
        x0, x1 = int(max(u[pos].min(), 0)), int(min(u[pos].max(), cam.width - 1))
        y0, y1 = int(max(v[pos].min(), 0)), int(min(v[pos].max(), cam.height - 1))
        if x1 - x0 < 4 or y1 - y0 < 4:
            continue
        planes[d_i, y0:y1 + 1, x0:x1 + 1] = True
        boxes2d[d_i] = (x0, y0, x1, y1)
        valid[d_i] = True
        d_i += 1
        if d_i == D:
            break
    return planes, valid

mask_bits = np.stack([pack_masks(masks_for(r)[0]) for r in records])
det_valid = np.stack([masks_for(r)[1] for r in records])

t0 = time.time()
out = fuse_batch(
    jnp.asarray(batch.points), jnp.asarray(batch.point_valid),
    jnp.asarray(mask_bits), jnp.asarray(det_valid),
    jnp.asarray(batch.corners_cam0), jnp.asarray(batch.box_valid),
    jnp.asarray(ds.transforms.velo_to_rect, dtype=jnp.float32),
    jnp.asarray(ds.transforms.cam_to_velo, dtype=jnp.float32),
    jnp.asarray(ds.camera.intrinsics, dtype=jnp.float32), params)
jax.block_until_ready(out)
t1 = time.time()
print(f"compile+run: {t1-t0:.1f}s")

# steady-state timing
t0 = time.time()
for _ in range(3):
    out = fuse_batch(
        jnp.asarray(batch.points), jnp.asarray(batch.point_valid),
        jnp.asarray(mask_bits), jnp.asarray(det_valid),
        jnp.asarray(batch.corners_cam0), jnp.asarray(batch.box_valid),
        jnp.asarray(ds.transforms.velo_to_rect, dtype=jnp.float32),
        jnp.asarray(ds.transforms.cam_to_velo, dtype=jnp.float32),
        jnp.asarray(ds.camera.intrinsics, dtype=jnp.float32), params)
    jax.block_until_ready(out)
t1 = time.time()
fps = 3 * batch.batch_size / (t1 - t0)
print(f"steady-state: {fps:.1f} frames/sec (incl. host transfers)")

tmp = tempfile.mkdtemp()
csv_path = os.path.join(tmp, "results", "master_car_statistics.csv")
all_rows = []
for i in range(batch.batch_size):
    rows = frame_statistics(
        int(batch.frame_ids[i]), out["total_points"][i], out["best_box"][i],
        out["points_inside"][i], out["matched"][i], det_valid[i],
        out["box_visible"][i])
    all_rows.extend(rows)
    append_to_master_csv(rows, csv_path)
print("rows written:", len(all_rows))
print("summary:", summarize(all_rows))
print("analysis:", analyze_master_csv(csv_path))
print("--- first 5 CSV lines ---")
print("\n".join(open(csv_path).read().split("\n")[:5]))
