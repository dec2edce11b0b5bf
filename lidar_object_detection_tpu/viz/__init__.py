from lidar_object_detection_tpu.viz.overlay import (
    simple_colors, golden_colors, overlay_masks, draw_boxes,
    depth_map_figure, point_colors_from_bits)
from lidar_object_detection_tpu.viz.export import (
    write_ply, export_fusion_scene, box_edges, show_open3d)

__all__ = ["simple_colors", "golden_colors", "overlay_masks", "draw_boxes",
           "depth_map_figure", "point_colors_from_bits", "write_ply", "export_fusion_scene",
           "box_edges", "show_open3d"]
