"""TPU-native KITTI-360 LiDAR-camera fusion framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
``KaranSankla/Lidar_Object_Detection`` (reference mounted read-only at
``/root/reference``): Velodyne->cam0 projection, YOLOv11-seg 2D car
detection/segmentation, mask->point association, oriented point-in-3D-bbox
evaluation, 2D IoU / Hungarian box matching, per-car statistics export and
depth-map rendering -- all with fixed shapes, batched over frames, jitted for
TPU, and sharded over a ``jax.sharding.Mesh``.

Layer map (mirrors SURVEY.md section 1):
  L0 data/      host loaders: scans, images, boxes, calibration
  L1 geom/      projection, rigid transforms, box geometry (jit)
  L2 models/    Flax YOLOv11-seg + stub detector
  L3 fusion/    mask->point association, 2D<->3D matching (jit)
  L4 eval/      per-car statistics, CSV export, 2D detection eval
  L5 viz/       host-side overlays / depth maps / PLY export
     ops/       custom kernels: erosion, NMS, Hungarian, scatter
     parallel/  mesh + sharding for multi-chip scale-out
     pipelines/ public entry points mirroring reference scripts V1..V5
"""

__version__ = "0.1.0"

from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion

__all__ = ["FusionConfig", "PipelineVersion", "__version__"]
