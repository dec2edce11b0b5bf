from lidar_object_detection_tpu.models.stub import StubDetector
from lidar_object_detection_tpu.models.yolo.model import Yolo11, YoloConfig
from lidar_object_detection_tpu.models.yolo.detector import YoloDetector

__all__ = ["StubDetector", "Yolo11", "YoloConfig", "YoloDetector"]
