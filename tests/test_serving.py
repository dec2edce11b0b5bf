"""Serving-checkpoint resolution (models/yolo/serving.py).

One resolver is shared by the CLI, bench.py, regen_artifacts, and the
quality sweep/CV scripts; these tests pin its precedence contract so a
consumer-side refactor can't silently reintroduce the drifted-default
bug (three hand-rolled resolvers disagreeing 0.5 vs 0.9) that this
module was written to kill.
"""

import json
import os

import pytest

from lidar_object_detection_tpu.models.yolo.serving import (
    load_sidecar, resolve_serving)


def _write_ckpt(tmp_path, sidecar=None, name="ckpt.msgpack"):
    path = os.path.join(tmp_path, name)
    with open(path, "wb") as f:
        f.write(b"\x00")  # resolve_serving never reads the payload
    if sidecar is not None:
        with open(path + ".json", "w") as f:
            json.dump(sidecar, f)
    return path


def test_no_sidecar_library_defaults(tmp_path):
    path = _write_ckpt(tmp_path)
    assert load_sidecar(path) == {}
    r = resolve_serving(path)
    assert r == {"scale": "n", "mask_threshold": 0.5, "conf": None,
                 "mask_threshold_floor": None, "mask_min_pixels": 0,
                 "tta": "none"}


def test_no_sidecar_default_scale_override(tmp_path):
    path = _write_ckpt(tmp_path)
    assert resolve_serving(path, default_scale="x")["scale"] == "x"


def test_sidecar_serving_block_wins_over_defaults(tmp_path):
    path = _write_ckpt(tmp_path, {
        "scale": "x",
        "serving": {"mask_threshold": 0.9, "conf": 0.3}})
    r = resolve_serving(path)
    assert r == {"scale": "x", "mask_threshold": 0.9, "conf": 0.3,
                 "mask_threshold_floor": None, "mask_min_pixels": 0,
                 "tta": "none"}


def test_explicit_caller_overrides_win_over_sidecar(tmp_path):
    path = _write_ckpt(tmp_path, {
        "scale": "x",
        "serving": {"mask_threshold": 0.9, "conf": 0.3}})
    r = resolve_serving(path, scale="n", conf=0.5, mask_threshold=0.75)
    assert r == {"scale": "n", "mask_threshold": 0.75, "conf": 0.5,
                 "mask_threshold_floor": None, "mask_min_pixels": 0,
                 "tta": "none"}


def test_sidecar_without_serving_block(tmp_path):
    # training sidecar: scale only -- threshold falls back to the
    # ultralytics 0.5 constant, conf stays None (detector default)
    path = _write_ckpt(tmp_path, {"scale": "s", "step": 123})
    r = resolve_serving(path)
    assert r == {"scale": "s", "mask_threshold": 0.5, "conf": None,
                 "mask_threshold_floor": None, "mask_min_pixels": 0,
                 "tta": "none"}


def test_partial_serving_block(tmp_path):
    # sweep records only mask_threshold (the common case)
    path = _write_ckpt(tmp_path, {
        "scale": "x", "serving": {"mask_threshold": 0.99}})
    r = resolve_serving(path)
    assert r["mask_threshold"] == 0.99
    assert r["conf"] is None


def test_values_coerced_to_float(tmp_path):
    # a hand-edited sidecar may carry strings; consumers feed these
    # straight into jnp scalars, so the resolver must coerce
    path = _write_ckpt(tmp_path, {
        "serving": {"mask_threshold": "0.9", "conf": "0.25"}})
    r = resolve_serving(path)
    assert r["mask_threshold"] == pytest.approx(0.9)
    assert r["conf"] == pytest.approx(0.25)


def test_committed_checkpoints_resolve_to_recorded_points():
    """The committed headline checkpoints carry sweep-selected serving
    blocks; the resolver must surface them (this is the exact operating
    point behind the committed artifacts -- PERFORMANCE.md)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("yolo11n_seg_distill.msgpack",
                 "yolo11x_seg_distill.msgpack"):
        path = os.path.join(root, "checkpoints", name)
        if not os.path.exists(path + ".json"):
            pytest.skip(f"{name} sidecar not committed")
        r = resolve_serving(path)
        meta = load_sidecar(path)
        assert r["scale"] == meta["scale"]
        if "serving" in meta:
            assert r["mask_threshold"] == pytest.approx(
                float(meta["serving"]["mask_threshold"]))


def test_guarded_shrink_serving_block(tmp_path):
    # sweep-selected guarded-shrink point (primary cut + floor + pixel
    # guard) resolves from the sidecar; explicit caller values win
    path = _write_ckpt(tmp_path, {
        "scale": "x",
        "serving": {"mask_threshold": 0.99, "mask_threshold_floor": 0.5,
                    "mask_min_pixels": 200}})
    r = resolve_serving(path)
    assert r["mask_threshold"] == 0.99
    assert r["mask_threshold_floor"] == 0.5
    assert r["mask_min_pixels"] == 200

    r = resolve_serving(path, mask_threshold_floor=0.7, mask_min_pixels=50)
    assert r["mask_threshold_floor"] == 0.7
    assert r["mask_min_pixels"] == 50


def test_tta_resolution(tmp_path):
    # sidecar-recorded TTA mode resolves; an explicit caller value
    # (including an explicit "none" to switch it OFF) wins
    path = _write_ckpt(tmp_path, {
        "scale": "x",
        "serving": {"mask_threshold": 0.99, "mask_threshold_floor": 0.5,
                    "mask_min_pixels": 200, "tta": "hflip"}})
    assert resolve_serving(path)["tta"] == "hflip"
    assert resolve_serving(path, tta="none")["tta"] == "none"
    # no sidecar / no serving block -> "none"
    bare = _write_ckpt(tmp_path, name="bare.msgpack")
    assert resolve_serving(bare)["tta"] == "none"


def test_explicit_threshold_below_sidecar_floor_disables_floor(tmp_path):
    # overriding the threshold to/below the sidecar's floor implicitly
    # disables the guarded shrink instead of producing an invalid
    # floor >= threshold combination
    path = _write_ckpt(tmp_path, {
        "serving": {"mask_threshold": 0.99, "mask_threshold_floor": 0.5,
                    "mask_min_pixels": 200}})
    r = resolve_serving(path, mask_threshold=0.5)
    assert r["mask_threshold"] == 0.5
    assert r["mask_threshold_floor"] is None
    assert r["mask_min_pixels"] == 0
