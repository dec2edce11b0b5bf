#!/usr/bin/env python
"""Export a slim serving checkpoint from a YOLO distillation run.

``train_yolo_distill.py`` writes ``{"variables", "step"}`` in f32 plus a
separate ``.opt`` optimizer-state file.  For committing to the repo the
f32 tree is dead weight: serving casts to bf16 anyway (detector
``dtype=bf16`` / ``fold_serving_variables``), and flax's msgpack round-
trips bf16 natively.  This halves the file (yolo11x-seg: 249 MB -> 125 MB)
while keeping the ``{"variables", "step"}`` layout that
``examples/regen_artifacts.py`` / ``bench.py`` restore, and copies the
scale sidecar.

  python examples/export_yolo_ckpt.py /tmp/yolo_x_distill.msgpack \
      checkpoints/yolo11x_seg_distill.msgpack
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--dtype", default="bfloat16",
                    help="storage dtype for float arrays (bfloat16/float32)")
    ap.add_argument("--serving-mask-thr", type=float, default=None,
                    help="record this sweep-selected mask threshold in the "
                         "exported sidecar's serving block (the CLI and "
                         "regen_artifacts serve it by default); omitted = "
                         "keep the source sidecar's serving block if any")
    ap.add_argument("--serving-mask-floor", type=float, default=None,
                    help="record a guarded-shrink floor threshold in the "
                         "serving block (with --serving-mask-min-pixels)")
    ap.add_argument("--serving-mask-min-pixels", type=int, default=None,
                    help="record the guarded-shrink pixel guard in the "
                         "serving block")
    ap.add_argument("--serving-tta", default=None,
                    choices=["none", "hflip"],
                    help="record a test-time-augmentation mode in the "
                         "serving block (models/yolo/tta.py)")
    args = ap.parse_args()
    if args.serving_tta is not None and args.serving_mask_thr is None:
        ap.error("--serving-tta needs --serving-mask-thr (a serving block "
                 "is only written when a primary cut is recorded)")
    if args.serving_mask_floor is not None and args.serving_mask_thr is None:
        ap.error("--serving-mask-floor needs --serving-mask-thr (the "
                 "floor is the fallback below a recorded primary cut)")
    if args.serving_mask_floor is not None \
            and not (args.serving_mask_min_pixels or 0) >= 1:
        ap.error("--serving-mask-floor needs --serving-mask-min-pixels "
                 ">= 1 (with no pixel guard the floor can never fire)")

    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    store_dtype = jnp.dtype(args.dtype)

    def cast(x):
        arr = np.asarray(x)
        if np.issubdtype(arr.dtype, np.floating):
            return arr.astype(store_dtype)
        return arr

    with open(args.src, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    import jax
    # serve the EMA weights when the training run kept them (--ema-decay)
    variables = raw.get("ema_variables") or raw["variables"]
    slim = {"variables": jax.tree.map(cast, variables),
            "step": raw["step"]}
    payload = serialization.msgpack_serialize(slim)
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, args.dst)

    src_sidecar, dst_sidecar = args.src + ".json", args.dst + ".json"
    meta = {}
    if os.path.exists(src_sidecar):
        with open(src_sidecar) as f:
            meta = json.load(f)
    # the training sidecar carries no serving block; without this the
    # exported checkpoint silently serves at mask_threshold 0.5 and
    # regresses the sweep-selected quality (quality_knob_sweep.py).
    # --serving-mask-thr must be honored even when the SOURCE has no
    # sidecar at all (a run whose trainer never wrote one).
    if args.serving_mask_thr is not None:
        meta["serving"] = {
            "mask_threshold": args.serving_mask_thr,
            "source": "examples/quality_knob_sweep.py (recorded at "
                      "export time)"}
        if args.serving_mask_floor is not None:
            meta["serving"]["mask_threshold_floor"] = \
                args.serving_mask_floor
            meta["serving"]["mask_min_pixels"] = \
                args.serving_mask_min_pixels
        if args.serving_tta is not None:
            meta["serving"]["tta"] = args.serving_tta
    elif "serving" not in meta:
        print("WARNING: no serving block in the source sidecar and no "
              "--serving-mask-thr given; the export will serve at "
              "ultralytics' 0.5 default")
    if "scale" not in meta:
        print("WARNING: no 'scale' in the sidecar; consumers will assume "
              "their default scale (models/yolo/serving.py)")
    if meta:
        with open(dst_sidecar, "w") as f:
            json.dump(meta, f)
    print(f"{args.src} -> {args.dst}: {len(payload) / 1e6:.1f} MB "
          f"(was {os.path.getsize(args.src) / 1e6:.1f}), "
          f"step {int(np.asarray(raw['step']))}, sidecar {meta}")


if __name__ == "__main__":
    main()
