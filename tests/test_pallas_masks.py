"""Fused Pallas mask-assembly kernel parity (interpret mode on CPU).

The kernel must reproduce the XLA ``_assemble_masks`` packed-bit output
exactly: it uses the same resize tap placement and weights (extracted from
``jax.image.resize`` itself) and the same product/add association, so even
the float rounding at the 0.5 threshold matches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_object_detection_tpu.models.yolo.postprocess import (
    LetterboxSpec, _assemble_masks)
from lidar_object_detection_tpu.ops.pallas_masks import (
    pallas_assemble_masks, resize_taps, supported)

H, W = 376, 1408      # KITTI-360 camera size (376 % 8 == 0, 1408 % 128 == 0)


def _spec():
    return LetterboxSpec.build(H, W, 640)


def _random_case(rng, d=32, nm=32):
    spec = _spec()
    mh, mw = spec.dst_h // 4, spec.dst_w // 4
    protos = rng.normal(0, 1.0, (mh, mw, nm)).astype(np.float32)
    coef = rng.normal(0, 0.6, (d, nm)).astype(np.float32)
    x1 = rng.uniform(0, W - 60, d)
    y1 = rng.uniform(0, H - 40, d)
    boxes = np.stack([x1, y1,
                      x1 + rng.uniform(20, 500, d),
                      y1 + rng.uniform(15, 200, d)], 1).astype(np.float32)
    det_valid = rng.random(d) > 0.2
    return spec, protos, coef, boxes, det_valid


def test_resize_taps_reconstruct_resize(rng):
    """Tap/weight extraction reproduces jax.image.resize within 1-2 ulp on
    a random image (resize's internal dot fuses the second multiply-add
    into one fma rounding; the 2-tap form rounds the product separately --
    the packed-bit tests below check the 0.5 threshold never flips)."""
    img = jnp.asarray(rng.normal(0, 1, (13, 47)).astype(np.float32))
    ref = jax.image.resize(img, (96, 47), method="bilinear")
    y0, w0, w1, _ = resize_taps(13, 96)
    y1_ = jnp.minimum(y0 + 1, 12)
    got = w0[:, None] * img[y0] + w1[:, None] * img[y1_]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=3e-7)


def test_kernel_matches_xla_assembly(rng):
    spec, protos, coef, boxes, det_valid = _random_case(rng)
    ref = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="xla"))
    got = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="pallas"))
    assert ref.any(), "degenerate case: no bits set"
    mismatch = int((ref != got).sum())
    assert mismatch == 0, f"{mismatch}/{ref.size} packed words differ"


@pytest.mark.parametrize("threshold,upsample", [
    (0.9, "prob"),     # the committed checkpoints' serving point
    (0.99, "prob"),    # the argmax CV pick
    (0.9, "logit"),    # logit-space interpolation (threshold at logit(t))
])
def test_kernel_matches_xla_at_serving_thresholds(rng, threshold, upsample):
    """The threshold is a baked compile-time constant, not hardcoded 0.5:
    the kernel must stay bit-parity with the XLA path at the swept serving
    operating points (PERFORMANCE.md quality table) in both interpolation
    spaces."""
    spec, protos, coef, boxes, det_valid = _random_case(rng)
    kw = dict(threshold=threshold, upsample=upsample)
    ref = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="xla", **kw))
    got = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="pallas", **kw))
    assert ref.any(), "degenerate case: no bits set"
    mismatch = int((ref != got).sum())
    assert mismatch == 0, f"{mismatch}/{ref.size} packed words differ"


def test_kernel_fewer_detections_and_all_invalid(rng):
    spec, protos, coef, boxes, det_valid = _random_case(rng, d=7)
    ref = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="xla"))
    got = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="pallas"))
    np.testing.assert_array_equal(got, ref)

    none = np.zeros(7, bool)
    out = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(none), spec, impl="pallas"))
    assert not out.any()


def test_supported_guard():
    assert supported(32, H, W)
    assert not supported(33, H, W)
    assert not supported(32, H + 1, W)
    assert not supported(32, H, W + 1)
    # upsample-only: proto-res masks larger than the output would need
    # antialiased (>2-tap) interpolation the kernel does not implement
    assert supported(32, H, W, H // 4, W // 4)
    assert not supported(32, H, W, H + 8, W // 4)
    assert not supported(32, H, W, H // 4, W + 128)
    mh, mw = _spec().dst_h // 4, _spec().dst_w // 4
    with pytest.raises(ValueError):
        pallas_assemble_masks(jnp.zeros((32, mh, mw)), jnp.zeros((32, 4)),
                              jnp.ones(32, bool), H + 1, W)


def test_count_kernel_matches_xla_pixel_counts(rng):
    """pallas_count_above == counting the XLA binary mask's set pixels
    per detection (the guarded-shrink pixel guard, without the stack)."""
    from lidar_object_detection_tpu.ops.pallas_masks import \
        pallas_count_above

    spec, protos, coef, boxes, det_valid = _random_case(rng, d=6)
    # reproduce the XLA path's per-detection binary masks
    import jax.numpy as jnp
    mh, mw, nm = 48, 160, 32
    logits = jnp.einsum("dn,hwn->dhw", jnp.asarray(coef),
                        jnp.asarray(protos))
    probs = jax.nn.sigmoid(logits)
    gain = min(mh / H, mw / W)
    top = int(round((mh - H * gain) / 2 - 0.1))
    left = int(round((mw - W * gain) / 2 - 0.1))
    bottom = mh - int(round((mh - H * gain) / 2 + 0.1))
    right = mw - int(round((mw - W * gain) / 2 + 0.1))
    cropped = probs[:, top:bottom, left:right]
    full = jax.image.resize(cropped, (6, H, W), "bilinear")
    ys = np.arange(H)[None, :, None]
    xs = np.arange(W)[None, None, :]
    in_box = ((xs >= boxes[:, 0, None, None]) & (xs < boxes[:, 2, None, None])
              & (ys >= boxes[:, 1, None, None])
              & (ys < boxes[:, 3, None, None]))
    for thr in (0.5, 0.9):
        ref = ((np.asarray(full) > thr) & in_box
               & det_valid[:, None, None]).sum(axis=(1, 2))
        got = np.asarray(pallas_count_above(
            cropped, jnp.asarray(boxes), jnp.asarray(det_valid), H, W,
            threshold=thr, interpret=True))
        np.testing.assert_array_equal(got, ref)


def test_guarded_kernel_matches_xla_guarded_path(rng):
    """The two-pass guarded kernel reproduces the XLA floor path
    bit-for-bit -- the committed serving point (0.99 + floor 0.5 @
    200 px) must be servable on the Pallas path."""
    spec, protos, coef, boxes, det_valid = _random_case(rng)
    # soften half the masks so the pixel guard actually fires for some
    coef = coef * np.where(np.arange(32)[:, None] % 2, 1.0, 0.1)
    kw = dict(threshold=0.99, floor=0.5, min_pixels=200)
    ref = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="xla", **kw))
    got = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="pallas", **kw))
    assert ref.any(), "degenerate case: no bits set"
    # the guard must actually split the detections between the two cuts
    plain_hi = np.asarray(_assemble_masks(
        jnp.asarray(protos), jnp.asarray(coef), jnp.asarray(boxes),
        jnp.asarray(det_valid), spec, impl="xla", threshold=0.99))
    assert (ref != plain_hi).any(), \
        "degenerate: no detection fell back to the floor cut"
    mismatch = int((ref != got).sum())
    assert mismatch == 0, f"{mismatch}/{ref.size} packed words differ"


def test_threshold_vector_assembly(rng):
    """A (D,) per-detection threshold vector applies each detection's own
    cut (the guarded mode's pass-2 primitive)."""
    spec, protos, coef, boxes, det_valid = _random_case(rng, d=4)
    det_valid = np.ones(4, bool)
    probs = jax.nn.sigmoid(jnp.einsum("dn,hwn->dhw", jnp.asarray(coef),
                                      jnp.asarray(protos)))
    thr = np.asarray([0.3, 0.6, 0.9, 0.5], np.float32)
    got = np.asarray(pallas_assemble_masks(
        probs, jnp.asarray(boxes), jnp.asarray(det_valid), H, W,
        threshold=jnp.asarray(thr), interpret=True))
    for d in range(4):
        one = np.zeros(4, bool)
        one[d] = True
        ref = np.asarray(pallas_assemble_masks(
            probs, jnp.asarray(boxes), jnp.asarray(one), H, W,
            threshold=float(thr[d]), interpret=True))
        np.testing.assert_array_equal((got >> d) & 1, (ref >> d) & 1,
                                      err_msg=f"det {d}")


def test_kernel_serves_tta_consensus_table(rng):
    """The hflip-TTA serving merge averages two cropped proto-res tables
    and hands ONE table to the shared assembly tail
    (postprocess._finish_masks) -- the kernel must reproduce the XLA tail
    bit-for-bit on such an averaged table at the committed guarded
    serving point (models/yolo/tta.py rides this)."""
    from lidar_object_detection_tpu.models.yolo.postprocess import (
        _finish_masks, cropped_prob_table)

    spec, protos, coef, boxes, det_valid = _random_case(rng)
    protos_b = rng.normal(0, 1.0, protos.shape).astype(np.float32)
    t_a = cropped_prob_table(jnp.asarray(protos), jnp.asarray(coef), spec)
    t_b = cropped_prob_table(jnp.asarray(protos_b), jnp.asarray(coef),
                             spec)[:, :, ::-1]
    mixed = rng.random(coef.shape[0]) > 0.5        # some dets matched
    table = jnp.where(jnp.asarray(mixed)[:, None, None],
                      0.5 * (t_a + t_b), t_a)

    kw = dict(threshold=0.99, floor=0.5, min_pixels=200)
    ref = np.asarray(_finish_masks(table, jnp.asarray(boxes),
                                   jnp.asarray(det_valid), spec,
                                   impl="xla", **kw))
    got = np.asarray(_finish_masks(table, jnp.asarray(boxes),
                                   jnp.asarray(det_valid), spec,
                                   impl="pallas", **kw))
    np.testing.assert_array_equal(got, ref)
    assert ref.any()
