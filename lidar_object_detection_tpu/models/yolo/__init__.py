from lidar_object_detection_tpu.models.yolo.model import Yolo11, YoloConfig
from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
from lidar_object_detection_tpu.models.yolo.postprocess import (
    LetterboxSpec, PostprocessParams, postprocess_single)
from lidar_object_detection_tpu.models.yolo.weights import (
    convert_state_dict, load_state_dict_file)

__all__ = ["Yolo11", "YoloConfig", "YoloDetector", "LetterboxSpec",
           "PostprocessParams", "postprocess_single", "convert_state_dict",
           "load_state_dict_file"]
