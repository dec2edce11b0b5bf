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


def test_analysis_cloud_both_colorings(kitti_root, tmp_path):
    """V2's bbox-analysis cloud (V2:446-491): per-point inside/outside
    labels for matched cars, exported as PLY in both color modes."""
    from lidar_object_detection_tpu.config import FusionConfig, PipelineVersion
    from lidar_object_detection_tpu.data import Kitti360Dataset
    from lidar_object_detection_tpu.pipelines.runner import FusionPipeline
    from lidar_object_detection_tpu.viz.export import write_ply

    cfg = FusionConfig.for_version(PipelineVersion.V2_STATS)
    ds = Kitti360Dataset(kitti_root, shapes=cfg.shapes)
    pipe = FusionPipeline(ds, cfg)

    pts, colors, corners = pipe.analysis_cloud(100, mode="inside_outside")
    assert pts.shape[0] == colors.shape[0] > 0
    green = (colors == (0.0, 1.0, 0.0)).all(1)
    red = (colors == (1.0, 0.0, 0.0)).all(1)
    gray = (colors == (0.5, 0.5, 0.5)).all(1)
    assert green.any() and red.any()            # both labels present
    assert (green | red | gray).all()
    assert len(corners) >= 1                    # matched boxes included
    # per-detection label counts agree exactly with points_inside_bbox
    # (colors use first-match-wins ownership, so compare on the raw bits)
    import jax.numpy as jnp
    from lidar_object_detection_tpu.fusion import point_inside_labels

    records = ds.load_frames([100])
    batch = ds.make_batch(records)
    det = pipe.detect(records, batch)
    fused = pipe.fuse(batch, det)
    bits = np.asarray(point_inside_labels(
        jnp.asarray(batch.points[0]), fused["point_bits"][0],
        fused["corners_velo"][0], fused["best_box"][0], fused["matched"][0],
        num_detections=cfg.shapes.max_detections))
    res = pipe.run([100], detections=det)
    for row in res.csv_rows:
        if row.is_matched:
            got = int(((bits >> np.uint32(row.car_id)) & 1).sum())
            assert got == row.points_inside_bbox, row
    assert green.sum() <= sum(r.points_inside_bbox for r in res.csv_rows
                              if r.is_matched)

    p1 = tmp_path / "analysis_io.ply"
    write_ply(str(p1), pts, colors)
    assert p1.exists() and p1.read_text().startswith("ply")

    pts2, colors2, _ = pipe.analysis_cloud(100, mode="car_color")
    carish = ~(colors2 == (0.5, 0.5, 0.5)).all(1)
    # car-color mode paints every owned point (inside or outside) alike
    assert carish.sum() >= (green | red).sum()
    p2 = tmp_path / "analysis_car.ply"
    write_ply(str(p2), pts2, colors2)
    assert p2.exists()


class TestKitti2DAnnotation:
    """The annotated KITTI-2D result image writer
    (ObjectDetection_final.py:166-253 rebuilt on PIL)."""

    def _match(self, car_id=1, det=(40, 60, 120, 110)):
        from lidar_object_detection_tpu.eval.kitti2d import MatchRecord
        return MatchRecord(car_id=car_id, det_box=np.asarray(det),
                           gt_box=np.asarray([38, 58, 122, 112]),
                           iou=0.83, yolo_distance=17.42, gt_distance=16.9)

    def test_draw_label_blends_background(self):
        from lidar_object_detection_tpu.viz.overlay import draw_label
        img = np.full((60, 200, 3), 128, np.uint8)
        out = draw_label(img, "IoU: 0.83", (10, 40),
                         text_color=(255, 0, 0), bg_color=(255, 255, 255),
                         alpha=0.6)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert (img == 128).all()                 # input untouched
        # 0.6-alpha white over grey 128 -> 204 in the background box
        assert (out == 204).any()
        assert (out[..., 0] > out[..., 1]).any()  # red text pixels exist

    def test_annotated_image_has_box_and_labels(self):
        from lidar_object_detection_tpu.viz.overlay import \
            annotate_kitti2d_image
        img = np.full((200, 400, 3), 90, np.uint8)
        out = annotate_kitti2d_image(img, [self._match()],
                                     precision=0.75, recall=0.60)
        assert out.shape == img.shape
        # red detection rectangle along the bottom edge of the det box
        # (labels legitimately overdraw parts of the top edge, as in the
        # reference's draw order)
        bottom = out[110, 40:121]
        assert (bottom[:, 0] == 255).all() and (bottom[:, 1] == 0).all()
        # label rows above the box were blended/written
        assert (out[25:60, 40:150] != 90).any()
        assert (out != 90).any()

    def test_eval_writes_annotated_pngs(self, tmp_path):
        """run_kitti2d_eval emits results_*.txt AND the annotated image
        with the same basename as the input (reference output layout)."""
        from PIL import Image

        from lidar_object_detection_tpu.pipelines.kitti2d import \
            run_kitti2d_eval

        root = tmp_path / "kitti_sel"
        for sub in ("images", "labels", "calib"):
            (root / sub).mkdir(parents=True)
        img = np.full((128, 256, 3), 70, np.uint8)
        Image.fromarray(img).save(root / "images" / "000042.png")
        # one GT car: xyxy + distance
        (root / "labels" / "000042.txt").write_text(
            "Car 40 60 120 110 17.0\n")
        np.savetxt(root / "calib" / "000042.txt",
                   np.asarray([[700.0, 0, 128], [0, 700, 64], [0, 0, 1]]))

        dets = np.asarray([[42, 61, 118, 108]], np.int64)
        out_dir = tmp_path / "results"
        res = run_kitti2d_eval(str(root), detect_fn=lambda image: dets,
                               output_dir=str(out_dir))
        assert (out_dir / "results_000042.png.txt").exists()
        png = out_dir / "000042.png"
        assert png.exists()
        rendered = np.asarray(Image.open(png))
        assert rendered.shape == img.shape
        assert (rendered != 70).any()             # annotations present
        assert res.totals["tp"] == 1
