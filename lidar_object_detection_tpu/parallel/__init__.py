from lidar_object_detection_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, data_sharding, replicated,
    point_sharding)
from lidar_object_detection_tpu.parallel.sharding import (
    sharded_fuse_batch, point_sharded_fuse_frame)
from lidar_object_detection_tpu.parallel import distributed
from lidar_object_detection_tpu.parallel.checkpoint import CheckpointManager
from lidar_object_detection_tpu.parallel.pipeline import (
    pipeline_apply, pipeline_loss_fn)
from lidar_object_detection_tpu.parallel.train import (
    YoloTrainer, TrainState, detection_loss, param_shardings)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "make_mesh", "data_sharding", "replicated",
    "point_sharding", "sharded_fuse_batch", "point_sharded_fuse_frame",
    "YoloTrainer", "TrainState", "detection_loss", "param_shardings",
    "distributed", "CheckpointManager", "pipeline_apply",
    "pipeline_loss_fn",
]
