"""Host-side 2D visualization -- never on the hot path (SURVEY.md sec. 7.7).

Replaces the reference's OpenCV drawing (``image_segmentation`` overlay at
V1_BBox_Pointwise_filtering.py:77-89) and the matplotlib depth-map figures
(seg_with_pointcloud.py:173-194) with pure-NumPy compositing + PIL writes,
so the viz layer has no native-GUI dependency.  Colors follow the
reference's generators: the simple ``(i*60, i*120, i*180) % 255`` BGR tuples
(V1:75) and V5's golden-angle HSV palette (V5:88-121).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def simple_colors(n: int) -> List[Tuple[int, int, int]]:
    """V1's color table (BGR, like the reference; V1:75)."""
    return [(int(i * 60) % 255, int(i * 120) % 255, int(i * 180) % 255)
            for i in range(n)]


def golden_colors(n: int) -> List[Tuple[int, int, int]]:
    """V5's golden-angle HSV palette in BGR (V5:88-121)."""
    out = []
    for i in range(n):
        hue = (i * 137.508) % 360
        sat = 0.8 + (i % 3) * 0.1
        val = 0.8 + (i % 2) * 0.2
        h_i = int(hue / 60) % 6
        f = (hue / 60) - h_i
        p = val * (1 - sat)
        q = val * (1 - f * sat)
        t = val * (1 - (1 - f) * sat)
        r, g, b = [(val, t, p), (q, val, p), (p, val, t),
                   (p, q, val), (t, p, val), (val, p, q)][h_i]
        out.append((int(b * 255), int(g * 255), int(r * 255)))
    return out


def point_colors_from_bits(point_bits: np.ndarray, num_detections: int,
                           colors: Optional[Sequence[Tuple[int, int, int]]] = None,
                           background=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Per-point RGB colors in [0, 1] from the packed membership words --
    the vectorized replacement for the reference's O(N^2) identity loop
    that assigns car colors to points (V1:377-395; lowest-bit detection
    wins, matching the first-match-wins loop order).  Background points get
    the reference's gray.
    """
    bits = np.asarray(point_bits)
    if colors is None:
        colors = simple_colors(num_detections)
    out = np.tile(np.asarray(background, np.float64), (bits.shape[0], 1))
    assigned = np.zeros(bits.shape[0], bool)
    for d in range(num_detections):
        member = ((bits >> np.uint32(d)) & 1).astype(bool) & ~assigned
        bgr = colors[d]
        out[member] = np.asarray([bgr[2], bgr[1], bgr[0]], np.float64) / 255.0
        assigned |= member
    return out


def analysis_cloud_colors(point_bits: np.ndarray, inside_bits: np.ndarray,
                          num_detections: int,
                          colors: Optional[Sequence[Tuple[int, int, int]]] = None,
                          mode: str = "inside_outside",
                          background=(0.5, 0.5, 0.5)) -> np.ndarray:
    """Per-point RGB for the V2 bbox-analysis cloud
    (``create_colored_point_cloud_with_bbox_analysis``,
    V2_point_cloud_without_erosion.py:446-491).

    ``mode="inside_outside"``: points of a matched car are green when
    inside its matched GT box, red when outside (the commented-in variant
    of V2:475-479).  ``mode="car_color"``: both get the car color, exactly
    what the shipped reference code draws.  Unowned points stay gray.
    """
    bits = np.asarray(point_bits)
    inb = np.asarray(inside_bits)
    if colors is None:
        colors = simple_colors(num_detections)
    out = np.tile(np.asarray(background, np.float64), (bits.shape[0], 1))
    assigned = np.zeros(bits.shape[0], bool)
    for d in range(num_detections):
        member = ((bits >> np.uint32(d)) & 1).astype(bool) & ~assigned
        inside = ((inb >> np.uint32(d)) & 1).astype(bool)
        if mode == "inside_outside":
            out[member & inside] = (0.0, 1.0, 0.0)
            out[member & ~inside] = (1.0, 0.0, 0.0)
        else:
            bgr = colors[d]
            out[member] = np.asarray([bgr[2], bgr[1], bgr[0]],
                                     np.float64) / 255.0
        assigned |= member
    return out


def overlay_masks(image: np.ndarray, masks: np.ndarray,
                  colors: Optional[Sequence[Tuple[int, int, int]]] = None,
                  alpha: float = 0.4) -> np.ndarray:
    """Blend instance masks over an RGB uint8 image
    (``cv2.addWeighted(img, 1.0, color_mask, alpha, 0)`` semantics, V1:83)."""
    out = image.astype(np.float32)
    if colors is None:
        colors = simple_colors(masks.shape[0])
    for mask, bgr in zip(masks, colors):
        rgb = np.asarray(bgr[::-1], np.float32)
        m = mask > 0.5
        out[m] = np.clip(out[m] + alpha * rgb, 0, 255)
    return out.astype(np.uint8)


def draw_boxes(image: np.ndarray, boxes: np.ndarray,
               colors: Optional[Sequence[Tuple[int, int, int]]] = None,
               thickness: int = 2) -> np.ndarray:
    """Rectangle outlines on an RGB uint8 image."""
    out = image.copy()
    h, w = out.shape[:2]
    if colors is None:
        colors = simple_colors(len(boxes))
    for (x1, y1, x2, y2), bgr in zip(np.asarray(boxes, int), colors):
        rgb = np.asarray(bgr[::-1], np.uint8)
        x1, x2 = np.clip([x1, x2], 0, w - 1)
        y1, y2 = np.clip([y1, y2], 0, h - 1)
        for t in range(thickness):
            xa, ya = max(x1 - t, 0), max(y1 - t, 0)
            xb, yb = min(x2 + t, w - 1), min(y2 + t, h - 1)
            out[ya, xa:xb + 1] = rgb
            out[yb, xa:xb + 1] = rgb
            out[ya:yb + 1, xa] = rgb
            out[ya:yb + 1, xb] = rgb
    return out


def depth_map_figure(depth_map: np.ndarray, seg_image: np.ndarray,
                     car_id: int, frame_id: int, save_path: str) -> None:
    """The per-car depth-map export figure (seg_with_pointcloud.py:173-194):
    jet-colormapped depth panel + depth overlaid on the segmented image,
    saved as ``{frame:010d},depth_map_car_{id:02d}_.png``-style files."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = plt.get_cmap("jet")
    dm_max = depth_map.max()
    depth_image = cm(depth_map / dm_max)[..., :3] if dm_max > 0 else \
        np.zeros((*depth_map.shape, 3))
    blended = seg_image.astype(np.float64) / 255.0
    blended[depth_map > 0] = depth_image[depth_map > 0]

    fig, axs = plt.subplots(2, 1, figsize=(18, 12))
    axs[0].imshow(depth_map, cmap="jet")
    axs[0].set_title(f"Depth Map - Car {car_id} (Frame {frame_id})")
    axs[0].axis("off")
    axs[1].imshow(blended)
    axs[1].set_title("Depth Overlaid on Segmented Image")
    axs[1].axis("off")
    fig.savefig(save_path, bbox_inches="tight", dpi=150, transparent=True)
    plt.close(fig)


def draw_label(image: np.ndarray, text: str, position: Tuple[int, int],
               text_color: Tuple[int, int, int] = (255, 255, 255),
               bg_color: Tuple[int, int, int] = (0, 0, 0),
               alpha: float = 0.6) -> np.ndarray:
    """Text with an alpha-blended background rectangle on an RGB uint8
    image -- ``draw_text_with_background`` (ObjectDetection_final.py:47-76)
    rebuilt on PIL (no cv2 in this framework).  ``position`` is the text
    BASELINE anchor like cv2.putText; colors are RGB."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default()
    img = Image.fromarray(image)
    draw = ImageDraw.Draw(img)
    x, y = int(position[0]), int(position[1])
    left, top, right, bottom = draw.textbbox((0, 0), text, font=font)
    tw, th = right - left, bottom - top
    # background: blend rect into the image at `alpha` like cv2.addWeighted
    arr = np.asarray(img).copy()
    h, w = arr.shape[:2]
    y0, y1 = max(y - th - 2, 0), min(y + 2, h)
    x0, x1 = max(x, 0), min(x + tw + 5, w)
    if y1 > y0 and x1 > x0:
        patch = arr[y0:y1, x0:x1].astype(np.float32)
        bg = np.asarray(bg_color, np.float32)
        arr[y0:y1, x0:x1] = (alpha * bg + (1 - alpha) * patch).astype(np.uint8)
    img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    draw.text((x, y - th), text, fill=tuple(text_color), font=font)
    return np.asarray(img)


def annotate_kitti2d_image(image: np.ndarray, matches,
                           precision: float, recall: float) -> np.ndarray:
    """The reference's annotated KITTI-2D result image
    (ObjectDetection_final.py:166-253): per matched detection a red box and
    four labels (ID / IoU / YOLO dist / GT dist) above-below its top-left
    corner, a running summary column on the right, and the image-level
    recall/precision banner.  ``matches`` is a list of
    :class:`...eval.kitti2d.MatchRecord`.  RGB in, RGB out."""
    out = image.copy()
    h, w = out.shape[:2]
    y_off = 250
    sum_x = min(1000, max(w - 400, 0))
    for m in matches:
        x1, y1, x2, y2 = [int(v) for v in m.det_box]
        out = draw_boxes(out, np.asarray([[x1, y1, x2, y2]]),
                         colors=[(0, 0, 255)], thickness=1)  # BGR red
        white = (255, 255, 255)
        out = draw_label(out, f"ID: {m.car_id}", (x1, y1 - 35),
                         text_color=(0, 0, 0), bg_color=white)
        out = draw_label(out, f"IoU: {m.iou:.2f}", (x1, y1 - 20),
                         text_color=(219, 22, 107), bg_color=white)
        out = draw_label(out, f"YOLO: {m.yolo_distance:.2f}m", (x1, y1 - 5),
                         text_color=(255, 0, 0), bg_color=white)
        out = draw_label(out, f"GT: {m.gt_distance:.2f}m", (x1, y1 + 10),
                         text_color=(0, 255, 0), bg_color=white)
        out = draw_label(
            out,
            f"ID: {m.car_id:.2f} ; gt: {m.gt_distance:.2f}m ; "
            f"yolo: {m.yolo_distance:.2f} m; IoU: {m.iou:.2f}",
            (sum_x, y_off), text_color=(0, 0, 0), bg_color=white)
        y_off += 15
    out = draw_label(out,
                     f"Recall: {recall:.2f} ; Precision: {precision:.2f}",
                     (min(420, max(w - 500, 0)), min(330, h - 10)),
                     text_color=(232, 67, 67), bg_color=(255, 255, 255),
                     alpha=0.0)
    return out
