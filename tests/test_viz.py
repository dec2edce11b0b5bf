"""Host-side viz: colors, overlays, point coloring, PLY export."""

import numpy as np

from lidar_object_detection_tpu.viz import (
    box_edges, draw_boxes, golden_colors, overlay_masks,
    point_colors_from_bits, simple_colors, write_ply)


def test_simple_colors_reference_formula():
    cols = simple_colors(5)
    assert cols[2] == (120 % 255, 240 % 255, 360 % 255)
    assert all(0 <= c < 255 for col in cols for c in col)


def test_golden_colors_distinct():
    cols = golden_colors(12)
    assert len(set(cols)) == 12


def test_point_colors_first_match_wins():
    # point 0 in dets 0 and 1 -> det 0's color; point 1 in det 1; point 2 bg
    bits = np.asarray([0b11, 0b10, 0b00], np.uint32)
    cols = point_colors_from_bits(bits, 2)
    c0 = np.asarray(simple_colors(2)[0][::-1]) / 255.0
    c1 = np.asarray(simple_colors(2)[1][::-1]) / 255.0
    np.testing.assert_allclose(cols[0], c0)
    np.testing.assert_allclose(cols[1], c1)
    np.testing.assert_allclose(cols[2], [0.5, 0.5, 0.5])


def test_overlay_and_boxes():
    img = np.zeros((20, 30, 3), np.uint8)
    masks = np.zeros((1, 20, 30), bool)
    masks[0, 5:10, 5:10] = True
    out = overlay_masks(img, masks, colors=[(10, 200, 30)])
    assert out[7, 7].sum() > 0 and out[0, 0].sum() == 0
    out2 = draw_boxes(out, np.asarray([[2, 2, 12, 12]]),
                      colors=[(10, 200, 30)])
    assert out2[2, 2:13].any()


def test_ply_and_edges(tmp_path):
    assert len(box_edges("v1")) == 12 and len(box_edges("proto")) == 12
    assert (0, 5) in box_edges("v1") and (0, 4) in box_edges("proto")
    path = str(tmp_path / "scene.ply")
    write_ply(path, np.zeros((4, 3)), edges=[(0, 1), (2, 3)])
    txt = open(path).read()
    assert txt.startswith("ply") and "element edge 2" in txt


def test_export_scene_uses_pair_colors(tmp_path):
    from lidar_object_detection_tpu.viz import export_fusion_scene

    pairs = [{"corners_velo": np.zeros((8, 3)), "color": (0.7, 0.7, 0.7)},
             {"corners_velo": np.ones((8, 3))}]
    path = str(tmp_path / "s.ply")
    export_fusion_scene(path, np.zeros((2, 3)), None, pairs)
    txt = open(path).read()
    assert "178 178 178" in txt      # 0.7 * 255 gray corners
    assert "255 0 0" in txt          # default red for the colorless pair
