#!/usr/bin/env python
"""Export a slim inference-only PointPillars checkpoint.

The surround trainer (train_pointpillars_surround.py) checkpoints the full
``(variables, opt_state, step)`` tuple so runs can resume; the optimizer
moments triple the file size but are dead weight for serving.  This strips
them, keeping the ``{"0": variables, "2": step}`` layout that
``pipelines.pointpillars.load_pillars_variables`` restores (it reads keys
"0"/"2" via ``msgpack_restore``), and copies the config sidecar so the
grid/head mismatch guard stays armed.

  python examples/export_pp_ckpt.py /tmp/pp_ckpt.msgpack \
      checkpoints/pp_ssd_surround.msgpack
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args()

    from flax import serialization

    with open(args.src, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    slim = {"0": raw["0"], "2": raw["2"]}
    payload = serialization.msgpack_serialize(slim)
    tmp = args.dst + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, args.dst)

    src_sidecar, dst_sidecar = args.src + ".json", args.dst + ".json"
    if os.path.exists(src_sidecar):
        shutil.copyfile(src_sidecar, dst_sidecar)
        meta = json.load(open(dst_sidecar))
    else:
        meta = None
    step = int(raw["2"]) if not isinstance(raw["2"], dict) else raw["2"]
    print(f"{args.src} -> {args.dst}: {len(payload) / 1e6:.1f} MB "
          f"(was {os.path.getsize(args.src) / 1e6:.1f}), step {step}, "
          f"sidecar {meta}")


if __name__ == "__main__":
    main()
