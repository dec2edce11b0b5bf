"""Flax YOLOv11 structure, decode, and weight-converter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.models.yolo.model import (
    REG_MAX, Yolo11, YoloConfig)
from lidar_object_detection_tpu.models.yolo.postprocess import (
    LetterboxSpec, PostprocessParams, letterbox_image, postprocess_single)
from lidar_object_detection_tpu.models.yolo import weights as W


@pytest.fixture(scope="module")
def tiny_model():
    cfg = YoloConfig(scale="n", num_classes=80, segment=True)
    model = Yolo11(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, variables


def test_channel_scaling_table():
    x = YoloConfig(scale="x")
    assert x.ch(64) == 96 and x.ch(128) == 192 and x.ch(256) == 384
    assert x.ch(512) == 768 and x.ch(1024) == 768   # clamped at 512*1.5
    n = YoloConfig(scale="n")
    assert n.ch(64) == 16 and n.ch(1024) == 256
    assert x.c3k and not n.c3k
    assert x.reps(2) == 2 and n.reps(2) == 1


def test_forward_shapes(tiny_model):
    model, variables = tiny_model
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = jax.jit(model.apply)(variables, x)   # eager apply is ~10x slower
    # strides 8/16/32 on 64x64
    assert [b.shape[:3] for b in out["box"]] == [(2, 8, 8), (2, 4, 4), (2, 2, 2)]
    assert all(b.shape[-1] == 4 * REG_MAX for b in out["box"])
    assert all(c.shape[-1] == 80 for c in out["cls"])
    assert all(m.shape[-1] == 32 for m in out["coef"])
    assert out["proto"].shape == (2, 16, 16, 32)    # P3 upsampled 2x


def test_letterbox_spec_kitti360():
    spec = LetterboxSpec.build(376, 1408, 640)
    assert (spec.dst_h, spec.dst_w) == (192, 640)
    assert (spec.scaled_h, spec.scaled_w) == (171, 640)
    assert spec.top == 10 and spec.left == 0
    assert np.isclose(spec.ratio, 640 / 1408)
    img = jnp.ones((376, 1408, 3), jnp.float32)
    lb = letterbox_image(img, spec)
    assert lb.shape == (192, 640, 3)
    assert float(lb[0, 0, 0]) == pytest.approx(114 / 255)   # pad row
    assert float(lb[10, 0, 0]) == pytest.approx(1.0)        # content row


def test_postprocess_decode_and_masks():
    """Craft raw outputs: one hot anchor with known ltrb distances."""
    spec = LetterboxSpec.build(376, 1408, 640)
    lvl = [(24, 80), (12, 40), (6, 20)]   # strides 8/16/32 on 192x640
    nc, nm = 80, 32
    outputs = {
        "box": [np.zeros((h, w, 4 * REG_MAX), np.float32) for h, w in lvl],
        "cls": [np.full((h, w, nc), -10.0, np.float32) for h, w in lvl],
        "coef": [np.zeros((h, w, nm), np.float32) for h, w in lvl],
        "proto": np.full((48, 160, nm), 0.0, np.float32),
    }
    # anchor (row 12, col 40) on level 0, stride 8: center (40.5, 12.5) cells
    big = 30.0
    dist_bins = np.full((4, REG_MAX), -big, np.float32)
    dist_bins[0, 4] = big    # left = 4 cells
    dist_bins[1, 3] = big    # top = 3
    dist_bins[2, 5] = big    # right = 5
    dist_bins[3, 2] = big    # bottom = 2
    outputs["box"][0][12, 40] = dist_bins.ravel()
    outputs["cls"][0][12, 40, 2] = 5.0            # car, sigmoid ~ 0.993
    outputs["coef"][0][12, 40] = 1.0
    outputs["proto"][:, :, :] = 1.0               # sigmoid(32) ~ 1 everywhere

    pp = PostprocessParams(spec=spec, conf_threshold=0.25, max_detections=8)
    out = postprocess_single(
        {k: ([jnp.asarray(a) for a in v] if isinstance(v, list)
             else jnp.asarray(v)) for k, v in outputs.items()}, pp)
    det_valid = np.asarray(out["det_valid"])
    assert det_valid[0] and not det_valid[1:].any()
    assert np.asarray(out["scores"])[0] == pytest.approx(1 / (1 + np.exp(-5.0)))
    # letterbox-space box: ((40.5-4)*8, (12.5-3)*8, (40.5+5)*8, (12.5+2)*8)
    lb_box = np.array([292.0, 76.0, 364.0, 116.0])
    expect = (lb_box - [0, 10, 0, 10]) / spec.ratio
    np.testing.assert_allclose(np.asarray(out["boxes"])[0], expect, atol=1e-3)
    # mask bits: bit 0 set exactly inside the (un-letterboxed) box
    bits = np.asarray(out["mask_bits"])
    x0, y0, x1, y1 = expect
    assert bits[int(y0) + 2, int(x0) + 2] & 1
    assert not bits[int(y0) - 3, int(x0) + 2] & 1
    assert not (bits & ~np.uint32(1)).any()       # only detection 0 present


def test_postprocess_empty():
    spec = LetterboxSpec.build(376, 1408, 640)
    lvl = [(24, 80), (12, 40), (6, 20)]
    outputs = {
        "box": [jnp.zeros((h, w, 64)) for h, w in lvl],
        "cls": [jnp.full((h, w, 80), -10.0) for h, w in lvl],
        "coef": [jnp.zeros((h, w, 32)) for h, w in lvl],
        "proto": jnp.zeros((48, 160, 32)),
    }
    out = postprocess_single(outputs, PostprocessParams(spec=spec))
    assert not np.asarray(out["det_valid"]).any()
    assert not np.asarray(out["mask_bits"]).any()


def _synthesize_torch_state_dict(variables):
    """Inverse of the converter's mapping: flax template -> fake torch sd."""
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    rng = np.random.default_rng(0)
    for keypath, value in flat:
        names = tuple(getattr(k, "key", None) for k in keypath)
        collection, *path = names
        stem, leaf = W._flax_path_to_torch_key(tuple(path))
        torch_key, transform = W._leaf_key_and_transform(stem, leaf, collection)
        arr = rng.normal(size=np.shape(value)).astype(np.float32)
        if leaf == "var":
            arr = np.abs(arr) + 0.5
        if leaf == "kernel" and not stem.endswith("upsample"):
            sd[torch_key] = np.transpose(arr, (3, 2, 0, 1))
        else:
            sd[torch_key] = arr
    # converter must tolerate these
    sd[f"model.{W.HEAD_INDEX}.dfl.conv.weight"] = np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)
    sd["model.0.bn.num_batches_tracked"] = np.asarray(7)
    return sd


def test_weight_converter_roundtrip(tiny_model):
    model, variables = tiny_model
    sd = _synthesize_torch_state_dict(variables)
    converted = W.convert_state_dict(sd, variables)
    # every leaf replaced, shapes preserved, values land where expected
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(converted)[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        assert np.shape(va) == np.shape(vb)
    # spot-check a conv kernel transpose
    k0 = sd["model.0.conv.weight"]
    got = np.asarray(converted["params"]["layer0"]["conv"]["kernel"])
    np.testing.assert_array_equal(got, np.transpose(k0, (2, 3, 1, 0)))
    bn = np.asarray(converted["batch_stats"]["layer0"]["bn"]["mean"])
    np.testing.assert_array_equal(bn, sd["model.0.bn.running_mean"])


def test_weight_converter_detects_problems(tiny_model):
    model, variables = tiny_model
    sd = _synthesize_torch_state_dict(variables)
    del sd["model.0.conv.weight"]
    with pytest.raises(ValueError, match="missing in state dict"):
        W.convert_state_dict(sd, variables)
    sd2 = _synthesize_torch_state_dict(variables)
    sd2["model.0.conv.weight"] = np.zeros((7, 3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        W.convert_state_dict(sd2, variables)


def test_yolo_detector_wrapper_smoke(rng):
    """YoloDetector end to end on tiny images ('n' scale, random weights):
    shapes, confidence ordering, packed mask consistency."""
    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector

    det = YoloDetector((96, 160), YoloConfig(scale="n"), conf=0.0,
                       max_detections=8, max_candidates=32)
    images = (rng.random((2, 96, 160, 3)) * 255).astype(np.uint8)
    out = det.detect(images)
    assert out["boxes"].shape == (2, 8, 4)
    assert out["scores"].shape == (2, 8)
    assert out["det_valid"].shape == (2, 8)
    assert out["mask_bits"].shape == (2, 96, 160)
    scores = np.asarray(out["scores"])
    valid = np.asarray(out["det_valid"])
    for b in range(2):
        s = scores[b][valid[b]]
        assert (np.diff(s) <= 1e-6).all()          # descending
    boxes = np.asarray(out["boxes"])
    assert (boxes[..., 2] >= boxes[..., 0] - 1e-3).all()
    assert (boxes[..., 3] >= boxes[..., 1] - 1e-3).all()
    # mask bits only where a valid detection exists
    bits = np.asarray(out["mask_bits"])
    for b in range(2):
        max_bit = int(valid[b].sum())
        assert not (bits[b] >> np.uint32(max_bit)).any()


def test_fast_masks_close_to_f32():
    """bf16 mask assembly flips only threshold-borderline pixels."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks)

    rng = np.random.default_rng(0)
    spec = LetterboxSpec.build(376, 1408, 640)
    protos = jnp.asarray(rng.normal(size=(48, 160, 32)).astype(np.float32))
    coef = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    boxes = jnp.asarray(np.array([[100, 50, 600, 300], [700, 100, 1300, 350],
                                  [0, 0, 1408, 376], [200, 200, 210, 210]],
                                 np.float32))
    valid = jnp.ones(4, bool)
    slow = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec))
    fast = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                      fast=True))
    total = slow.size
    diff = (slow != fast).sum()
    assert diff / total < 0.02, f"{diff}/{total} pixels differ"
    # the bulk of both masks agrees
    assert (slow == fast).mean() > 0.98


def test_mask_threshold_monotone_and_default():
    """mask_threshold: higher threshold yields strictly-nested (shrinking)
    masks; the default 0.5 reproduces the original path bit-for-bit."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks)

    rng = np.random.default_rng(1)
    spec = LetterboxSpec.build(376, 1408, 640)
    protos = jnp.asarray(rng.normal(size=(48, 160, 32)).astype(np.float32))
    coef = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    boxes = jnp.asarray(np.array([[100, 50, 600, 300], [700, 100, 1300, 350],
                                  [0, 0, 1408, 376], [200, 200, 400, 340]],
                                 np.float32))
    valid = jnp.ones(4, bool)
    base = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec))
    explicit = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                          threshold=0.5))
    np.testing.assert_array_equal(base, explicit)

    prev = base
    for thr in (0.7, 0.9, 0.99):
        cur = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                         threshold=thr))
        # nested: every set bit at the higher threshold was set before
        assert np.all((cur & ~prev) == 0), f"threshold {thr} grew a mask"
        assert (cur != 0).sum() < (prev != 0).sum(), \
            f"threshold {thr} did not shrink the masks"
        prev = cur


def _relative_case(seed=2, coef_scale=1.0):
    rng = np.random.default_rng(seed)
    spec = LetterboxSpec.build(376, 1408, 640)
    protos = jnp.asarray(rng.normal(size=(48, 160, 32)).astype(np.float32))
    coef = jnp.asarray(
        (coef_scale * rng.normal(size=(4, 32))).astype(np.float32))
    boxes = jnp.asarray(np.array([[100, 50, 600, 300], [700, 100, 1300, 350],
                                  [0, 0, 1408, 376], [200, 200, 400, 340]],
                                 np.float32))
    valid = jnp.ones(4, bool)
    return spec, protos, coef, boxes, valid


def test_mask_threshold_relative_keeps_weak_peaks():
    """mask_threshold_mode='relative': an instance whose peak probability
    sits below a high absolute cut keeps a mask (cut scales with the peak)
    instead of vanishing -- the failure mode that costs matched cars at
    absolute 0.9 (PERFORMANCE.md: 65 -> 63)."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks)

    # small coefficients -> soft masks whose peaks stay well under 0.9
    spec, protos, coef, boxes, valid = _relative_case(coef_scale=0.12)
    absolute = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                          threshold=0.9))
    relative = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                          threshold=0.9,
                                          threshold_mode="relative"))
    # every detection keeps bits in relative mode...
    per_det = [bool((relative & (1 << d)).any()) for d in range(4)]
    assert all(per_det), f"relative mode emptied a detection: {per_det}"
    # ...while the absolute 0.9 cut erases at least one of these soft masks
    per_det_abs = [bool((absolute & (1 << d)).any()) for d in range(4)]
    assert not all(per_det_abs), \
        "case degenerate: absolute 0.9 kept every soft mask"


def test_mask_threshold_relative_matches_absolute_at_peak_product():
    """For a single instance, relative mode at t equals absolute mode at
    t x (that instance's in-box peak of the upsampled probability field) --
    the mode is a per-instance re-parameterization, not a new operator."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks)

    spec, protos, coef, boxes, _ = _relative_case()
    one = jnp.asarray(np.array([True, False, False, False]))

    # reproduce the upsampled field exactly as _assemble_masks builds it
    logits = jnp.einsum("dn,hwn->dhw", coef, protos)
    probs = jax.nn.sigmoid(logits)
    mh, mw = 48, 160
    gain = min(mh / spec.src_h, mw / spec.src_w)
    top = int(round((mh - spec.src_h * gain) / 2 - 0.1))
    left = int(round((mw - spec.src_w * gain) / 2 - 0.1))
    bottom = mh - int(round((mh - spec.src_h * gain) / 2 + 0.1))
    right = mw - int(round((mw - spec.src_w * gain) / 2 + 0.1))
    full = jax.image.resize(probs[:, top:bottom, left:right],
                            (4, spec.src_h, spec.src_w), "bilinear")
    x1, y1, x2, y2 = np.asarray(boxes[0])
    ys, xs = np.arange(spec.src_h), np.arange(spec.src_w)
    in_box = ((xs[None, :] >= x1) & (xs[None, :] < x2)
              & (ys[:, None] >= y1) & (ys[:, None] < y2))
    peak = jnp.max(jnp.where(in_box, full[0], 0))

    t = 0.9
    rel = np.asarray(_assemble_masks(protos, coef, boxes, one, spec,
                                     threshold=t, threshold_mode="relative"))
    # the same f32 product the relative path forms on device
    cut = float(np.float32(t) * np.asarray(peak, np.float32))
    absolute = np.asarray(_assemble_masks(protos, coef, boxes, one, spec,
                                          threshold=cut))
    np.testing.assert_array_equal(rel, absolute)


def test_mask_threshold_relative_monotone_and_validated():
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks)

    spec, protos, coef, boxes, valid = _relative_case()
    prev = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                      threshold=0.5,
                                      threshold_mode="relative"))
    for thr in (0.7, 0.9, 0.99):
        cur = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                         threshold=thr,
                                         threshold_mode="relative"))
        assert np.all((cur & ~prev) == 0), f"relative {thr} grew a mask"
        prev = cur

    with pytest.raises(ValueError, match="relative"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold_mode="relative", upsample="logit")
    with pytest.raises(ValueError, match="static threshold"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold_mode="relative", impl="pallas")
    with pytest.raises(ValueError, match="mask_threshold_mode"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold_mode="bogus")


def test_mask_threshold_floor_guarded_shrink():
    """mask_threshold_floor: detections the primary cut leaves near-empty
    serve the floor cut; saturated detections are untouched; min_pixels=0
    reproduces the plain single-threshold output bit-for-bit."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks)

    spec, protos, coef, boxes, valid = _relative_case()
    # mix: dets 0-1 saturated, dets 2-3 soft (peaks well under 0.9)
    coef = coef.at[2:].multiply(0.12)

    hi = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                    threshold=0.9))
    lo = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                    threshold=0.5))
    guard = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                       threshold=0.9, floor=0.5,
                                       min_pixels=200))
    hi_counts = [int(((hi >> d) & 1).sum()) for d in range(4)]
    for d in range(4):
        want = hi if hi_counts[d] >= 200 else lo
        np.testing.assert_array_equal((guard >> d) & 1, (want >> d) & 1,
                                      err_msg=f"det {d} "
                                              f"(hi pixels {hi_counts[d]})")
    # the case must actually exercise both branches
    assert any(c >= 200 for c in hi_counts) \
        and any(c < 200 for c in hi_counts), f"degenerate: {hi_counts}"

    with pytest.raises(ValueError, match="must sit below"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold=0.5, floor=0.9)
    with pytest.raises(ValueError, match="prob"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold=0.9, floor=0.5, upsample="logit")
    # a floor whose guard can never fire is a config error, not a silent
    # 2x-cost no-op
    with pytest.raises(ValueError, match="mask_min_pixels"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold=0.9, floor=0.5, min_pixels=0)
    # an absolute floor under a relative primary cut can shrink the mask
    # the guard was meant to save
    with pytest.raises(ValueError, match="absolute"):
        _assemble_masks(protos, coef, boxes, valid, spec,
                        threshold=0.9, floor=0.5, min_pixels=200,
                        threshold_mode="relative")


def test_prob_fields_and_pack_match_assembly():
    """mask_prob_fields + pack_thresholded_masks reproduce _assemble_masks
    bit-for-bit on the prob/absolute path (plain and guarded) -- the pin
    that lets ensembling experiments (examples/quality_flip_probe.py)
    build their own probability fields yet share the serving
    binarization exactly."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _assemble_masks, mask_prob_fields, pack_thresholded_masks)

    spec, protos, coef, boxes, valid = _relative_case()
    coef = coef.at[2:].multiply(0.12)      # mix saturated + soft dets
    fields = mask_prob_fields(protos, coef, spec)
    assert fields.shape == (4, spec.src_h, spec.src_w)
    assert fields.dtype == jnp.float32

    for kwargs in ({"threshold": 0.9},
                   {"threshold": 0.99, "floor": 0.5, "min_pixels": 200}):
        ref = np.asarray(_assemble_masks(protos, coef, boxes, valid, spec,
                                         **kwargs))
        got = np.asarray(pack_thresholded_masks(
            fields, boxes, valid, kwargs["threshold"],
            kwargs.get("floor"), kwargs.get("min_pixels", 0)))
        np.testing.assert_array_equal(got, ref, err_msg=str(kwargs))

    # an invalidated detection emits no bits through the helper either
    got = np.asarray(pack_thresholded_masks(
        fields, boxes, valid.at[1].set(False), 0.5))
    assert not ((got >> 1) & 1).any()


def test_postprocess_emit_coef():
    """emit_coef=True surfaces the kept detections' mask coefficients in
    NMS order; the default output surface is unchanged."""
    spec = LetterboxSpec.build(376, 1408, 640)
    lvl = [(24, 80), (12, 40), (6, 20)]
    nc, nm = 80, 32
    outputs = {
        "box": [np.zeros((h, w, 4 * REG_MAX), np.float32) for h, w in lvl],
        "cls": [np.full((h, w, nc), -10.0, np.float32) for h, w in lvl],
        "coef": [np.zeros((h, w, nm), np.float32) for h, w in lvl],
        "proto": np.full((48, 160, nm), 1.0, np.float32),
    }
    big = 30.0
    dist_bins = np.full((4, REG_MAX), -big, np.float32)
    for side, cells in enumerate((4, 3, 5, 2)):
        dist_bins[side, cells] = big
    outputs["box"][0][12, 40] = dist_bins.ravel()
    outputs["cls"][0][12, 40, 2] = 5.0
    outputs["coef"][0][12, 40] = np.arange(nm, dtype=np.float32)
    as_jax = {k: ([jnp.asarray(a) for a in v] if isinstance(v, list)
                  else jnp.asarray(v)) for k, v in outputs.items()}

    pp = PostprocessParams(spec=spec, conf_threshold=0.25, max_detections=8)
    assert "coef" not in postprocess_single(as_jax, pp)

    pp = PostprocessParams(spec=spec, conf_threshold=0.25, max_detections=8,
                           emit_coef=True)
    out = postprocess_single(as_jax, pp)
    assert out["coef"].shape == (8, nm)
    np.testing.assert_array_equal(np.asarray(out["coef"])[0],
                                  np.arange(nm, dtype=np.float32))


def _hot_anchor_outputs(col=40, ltrb=(4, 3, 5, 2), protos=None):
    """Raw seg outputs with one hot car anchor on level 0 at (12, col)."""
    lvl = [(24, 80), (12, 40), (6, 20)]
    nc, nm = 80, 32
    outputs = {
        "box": [np.zeros((h, w, 4 * REG_MAX), np.float32) for h, w in lvl],
        "cls": [np.full((h, w, nc), -10.0, np.float32) for h, w in lvl],
        "coef": [np.zeros((h, w, nm), np.float32) for h, w in lvl],
        "proto": protos if protos is not None
        else np.full((48, 160, nm), 1.0, np.float32),
    }
    big = 30.0
    dist_bins = np.full((4, REG_MAX), -big, np.float32)
    for side, cells in enumerate(ltrb):
        dist_bins[side, cells] = big
    outputs["box"][0][12, col] = dist_bins.ravel()
    outputs["cls"][0][12, col, 2] = 5.0
    outputs["coef"][0][12, col] = 1.0
    return {k: ([jnp.asarray(a) for a in v] if isinstance(v, list)
                else jnp.asarray(v)) for k, v in outputs.items()}


def test_tta_no_match_reproduces_single_view():
    """With an unreachable match_iou every detection keeps its single-view
    field, so the TTA merge must reproduce postprocess_single bit-for-bit
    (boxes/scores/valid are single-view by construction)."""
    from lidar_object_detection_tpu.models.yolo.tta import \
        postprocess_tta_pair

    spec = LetterboxSpec.build(376, 1408, 640)
    rng = np.random.default_rng(7)
    protos = rng.normal(size=(48, 160, 32)).astype(np.float32)
    out_n = _hot_anchor_outputs(col=40, protos=protos)
    out_f = _hot_anchor_outputs(col=60, protos=protos)

    pp = PostprocessParams(spec=spec, conf_threshold=0.25, max_detections=8,
                           mask_threshold=0.9)
    single = postprocess_single(out_n, pp)
    merged = jax.jit(lambda a, b: postprocess_tta_pair(a, b, pp,
                                                       match_iou=2.0))(
        out_n, out_f)
    # jit-fused vs eager float paths differ by ulps on boxes/scores;
    # validity and the packed bits must match exactly
    np.testing.assert_allclose(np.asarray(merged["boxes"]),
                               np.asarray(single["boxes"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(merged["scores"]),
                               np.asarray(single["scores"]), rtol=1e-5)
    for k in ("det_valid", "mask_bits"):
        np.testing.assert_array_equal(np.asarray(merged[k]),
                                      np.asarray(single[k]), err_msg=k)


def test_tta_consistent_mirror_is_identity():
    """A flipped view that IS the exact mirror of the normal view (mirrored
    protos, mirrored hot anchor with swapped left/right distances) matches
    at IoU 1.0 and averages two identical fields -- the consensus bits must
    equal the single-view bits, pinning the whole mirror-back geometry
    (boxes, proto crop, field flip) at once."""
    from lidar_object_detection_tpu.models.yolo.tta import (
        flip_boxes, postprocess_tta_pair)

    spec = LetterboxSpec.build(376, 1408, 640)
    # KITTI-360's 640-letterbox proto crop spans the full width (left 0,
    # right 160), so mirroring the proto grid mirrors the cropped content
    # exactly -- the premise of this construction
    rng = np.random.default_rng(3)
    protos = rng.normal(size=(48, 160, 32)).astype(np.float32)
    # level-0 anchor col 40 (center x 324 in the 640 letterbox) mirrors to
    # col 39 (center 316); ltrb (4, 3, 5, 2) mirrors to (5, 3, 4, 2)
    out_n = _hot_anchor_outputs(col=40, ltrb=(4, 3, 5, 2), protos=protos)
    out_f = _hot_anchor_outputs(col=39, ltrb=(5, 3, 4, 2),
                                protos=protos[:, ::-1, :].copy())

    pp = PostprocessParams(spec=spec, conf_threshold=0.25, max_detections=8,
                           mask_threshold=0.9)
    single = postprocess_single(out_n, pp)
    merged = jax.jit(lambda a, b: postprocess_tta_pair(a, b, pp,
                                                       match_iou=0.99))(
        out_n, out_f)
    # the flipped view's box maps back onto the normal one exactly
    f_det = postprocess_single(out_f, pp)
    np.testing.assert_allclose(
        np.asarray(flip_boxes(f_det["boxes"], spec.src_w))[0],
        np.asarray(single["boxes"])[0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(merged["boxes"]),
                               np.asarray(single["boxes"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(merged["scores"]),
                               np.asarray(single["scores"]), rtol=1e-5)
    for k in ("det_valid", "mask_bits"):
        np.testing.assert_array_equal(np.asarray(merged[k]),
                                      np.asarray(single[k]), err_msg=k)


def test_tta_param_validation():
    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector
    from lidar_object_detection_tpu.models.yolo.tta import \
        postprocess_tta_pair

    spec = LetterboxSpec.build(376, 1408, 640)
    out = _hot_anchor_outputs()
    with pytest.raises(ValueError, match="prob"):
        postprocess_tta_pair(out, out, PostprocessParams(
            spec=spec, mask_upsample="logit"))
    with pytest.raises(ValueError, match="absolute"):
        postprocess_tta_pair(out, out, PostprocessParams(
            spec=spec, mask_threshold_mode="relative"))
    with pytest.raises(ValueError, match="tta"):
        YoloDetector((96, 160), YoloConfig(scale="n"), tta="bogus")
    with pytest.raises(ValueError, match="prob"):
        YoloDetector((96, 160), YoloConfig(scale="n"), tta="hflip",
                     mask_upsample="logit")


def test_detector_tta_smoke(rng):
    """YoloDetector(tta='hflip'): boxes/scores/validity are EXACTLY the
    single-view detector's (consensus only moves mask boundaries); the
    packed bits stay consistent with the validity mask."""
    from lidar_object_detection_tpu.models.yolo.detector import YoloDetector

    det = YoloDetector((96, 160), YoloConfig(scale="n"), conf=0.0,
                       max_detections=8, max_candidates=32)
    det_tta = YoloDetector((96, 160), YoloConfig(scale="n"), conf=0.0,
                           max_detections=8, max_candidates=32,
                           variables=det.variables, tta="hflip")
    images = (rng.random((2, 96, 160, 3)) * 255).astype(np.uint8)
    base = det.detect(images)
    out = det_tta.detect(images)
    for k in ("boxes", "scores", "det_valid"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(base[k]), err_msg=k)
    assert out["mask_bits"].shape == (2, 96, 160)
    bits = np.asarray(out["mask_bits"])
    valid = np.asarray(out["det_valid"])
    for b in range(2):
        assert not (bits[b] >> np.uint32(int(valid[b].sum()))).any()


def test_tta_proto_res_consensus_matches_field_space():
    """The serving merge averages the CROPPED PROTO-RES tables and
    upsamples once (postprocess_tta_pair); averaging the two UPSAMPLED
    (D, H0, W0) fields (mask_prob_fields + pack_thresholded_masks, the
    probe's original formulation) must give the same bits up to resize
    ulps -- bilinear upsampling is linear and its taps are mirror-
    symmetric, which is the identity the stack-free path rides on."""
    from lidar_object_detection_tpu.geom.boxes import iou_2d_matrix
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        mask_prob_fields, pack_thresholded_masks)
    from lidar_object_detection_tpu.models.yolo.tta import (
        flip_boxes, postprocess_tta_pair)

    spec = LetterboxSpec.build(376, 1408, 640)
    rng = np.random.default_rng(11)
    out_n = _hot_anchor_outputs(
        col=40, ltrb=(4, 3, 5, 2),
        protos=rng.normal(size=(48, 160, 32)).astype(np.float32))
    out_f = _hot_anchor_outputs(
        col=39, ltrb=(5, 3, 4, 2),
        protos=rng.normal(size=(48, 160, 32)).astype(np.float32))

    pp = PostprocessParams(spec=spec, conf_threshold=0.25, max_detections=8,
                           mask_threshold=0.9, mask_threshold_floor=0.5,
                           mask_min_pixels=200, emit_coef=True)
    merged = jax.jit(lambda a, b: postprocess_tta_pair(a, b, pp, 0.25))(
        out_n, out_f)

    # field-space reference: average AFTER the upsample
    det_n = postprocess_single(out_n, pp)
    det_f = postprocess_single(out_f, pp)
    f_n = mask_prob_fields(out_n["proto"], det_n["coef"], spec)
    f_f = mask_prob_fields(out_f["proto"], det_f["coef"], spec)[:, :, ::-1]
    boxes_f = flip_boxes(det_f["boxes"], spec.src_w)
    iou = jnp.where(det_f["det_valid"][None, :],
                    iou_2d_matrix(det_n["boxes"], boxes_f), 0.0)
    best = jnp.argmax(iou, axis=1)
    matched = (jnp.max(iou, axis=1) >= 0.25) & det_n["det_valid"]
    fields = jnp.where(matched[:, None, None], 0.5 * (f_n + f_f[best]), f_n)
    ref_bits = np.asarray(pack_thresholded_masks(
        fields, det_n["boxes"], det_n["det_valid"], 0.9, 0.5, 200))

    # the consensus must actually fire for the pin to mean anything
    assert bool(np.asarray(matched)[0])
    got = np.asarray(merged["mask_bits"])
    diff = int((got != ref_bits).sum())
    assert diff / got.size < 1e-5, f"{diff}/{got.size} packed words differ"
