#!/bin/bash
# TPU-window runbook (round 3): what to run, in priority order, the moment
# the chip is reachable again.  Each stage logs to /tmp/tpu_window/ and is
# independently resumable; later stages are skipped if the window closes.
#
#   bash examples/tpu_window.sh            # stages 1-3 (validation + bench)
#   bash examples/tpu_window.sh retrain    # + stage 4 (x-scale retrain)
#
# PYTHONPATH must keep /root/.axon_site (axon backend registration).

set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_window
mkdir -p "$LOG"

echo "=== stage 1: Pallas mask kernel validation (compile/parity/speed) ==="
timeout 1800 python examples/validate_pallas_masks_tpu.py \
    2>&1 | tee "$LOG/1_pallas_masks.log"
PALLAS_OK=${PIPESTATUS[0]}
echo "stage 1 rc=$PALLAS_OK"

MASKS=xla
if [ "$PALLAS_OK" = 0 ]; then
  MASKS=pallas
  echo "(flip PostprocessParams.mask_assembly default to auto + commit"
  echo " after eyeballing $LOG/1_pallas_masks.log)"
fi

echo "=== stage 2: full bench (headline + extras), mask_assembly=$MASKS ==="
BENCH_MASK_ASSEMBLY=$MASKS timeout 3600 python bench.py \
    2>&1 | tee "$LOG/2_bench_b38.log"

echo "=== stage 3: batch-76 probe (fusion HBM regime) ==="
BENCH_MASK_ASSEMBLY=$MASKS BENCH_REPLICAS=4 BENCH_EXTRA=0 \
    timeout 2400 python bench.py 2>&1 | tee "$LOG/3_bench_b76.log"
BENCH_MASK_ASSEMBLY=xla BENCH_REPLICAS=4 BENCH_EXTRA=0 \
    timeout 2400 python bench.py 2>&1 | tee "$LOG/3_bench_b76_xla.log"

if [ "${1:-}" = retrain ]; then
  echo "=== stage 4: x-scale distill retrain, seg-weight 3, EMA, 20k steps ==="
  timeout 28800 python examples/train_yolo_distill.py \
      --steps 20000 --scale x --seg-weight 3.0 --lr 2e-3 --ema-decay 0.999 \
      --ckpt /tmp/yolo_x_segw3.msgpack --cache /tmp/yolo_labels2.npz \
      --resume 2>&1 | tee "$LOG/4_retrain.log"
  echo "=== stage 4a: re-sweep the serving point for the NEW weights ==="
  timeout 3600 python examples/quality_knob_sweep.py \
      --ckpt /tmp/yolo_x_segw3.msgpack --conf 0.25 \
      --mask-thr 0.5 0.7 0.8 0.9 0.95 0.99 \
      --guarded-grid 0.9:0.5:200 0.95:0.5:200 0.99:0.5:200 \
      --tta-grid 0.95:0.5:200 0.99:0.5:200 \
      --out /tmp/knob_sweep_retrain.json \
      2>&1 | tee "$LOG/4a_sweep.log"
  # coverage rule (quality_threshold_cv.py): only configs keeping the
  # MOST matched cars compete on mean inside-%, so "best" can't be won
  # by dropping hard cars; a missing sweep or failed parse falls back to
  # the committed serving point (hflip TTA @ 0.99 + floor 0.5 @ 200 px)
  read -r BEST_THR BEST_FLOOR BEST_PIX BEST_TTA <<<"$(python - <<'PY'
import json
try:
    rows = json.load(open("/tmp/knob_sweep_retrain.json"))["results"]
    top = max(r["matched_cars"] for r in rows)
    best = max((r for r in rows if r["matched_cars"] == top),
               key=lambda r: r["mean_inside_pct_eroded"])
    floor = best.get("mask_threshold_floor")
    print(best["mask_threshold"],
          "" if floor is None else floor,
          best.get("mask_min_pixels", ""),
          best.get("tta", "none"))
except Exception:
    print("0.99 0.5 200 hflip")
PY
)"
  FLOOR_ARGS=""
  [ -n "$BEST_FLOOR" ] && \
      FLOOR_ARGS="--mask-floor $BEST_FLOOR --mask-min-pixels $BEST_PIX"
  echo "=== stage 4b: regen artifacts (mask-thr $BEST_THR $FLOOR_ARGS tta $BEST_TTA) ==="
  timeout 3600 python examples/regen_artifacts.py \
      --ckpt /tmp/yolo_x_segw3.msgpack --out /tmp/artifacts_x_segw3 \
      --mask-thr "$BEST_THR" --tta "$BEST_TTA" $FLOOR_ARGS \
      2>&1 | tee "$LOG/4b_regen.log"
  python - <<'PY' | tee "$LOG/4b_verdict.log"
import json
s = json.load(open("/tmp/artifacts_x_segw3/summary.json"))
got = s["erosion_study"]["mean_inside_pct_eroded"]
ref = 74.48
best_prev = 77.44   # committed ckpt, hflip TTA @ 0.99+floor0.5@200 (round 5)
print(f"mean inside-% eroded: {got} (ref {ref}, repo best {best_prev})")
print("VERDICT:", "NEW-BEST" if got > best_prev
      else "BEATS-REFERENCE" if got >= ref else "NO-GAIN")
PY
  echo "(on NEW-BEST: export via examples/export_yolo_ckpt.py,"
  echo " commit checkpoint + artifacts, update PERFORMANCE/BASELINE)"
  echo "=== stage 5: PointPillars REAL held-out split runs (ssd + center) ==="
  timeout 14400 python examples/train_pointpillars_surround.py 8000 \
      /tmp/pp_split_ssd.json --eval-frames=auto --protect-starved=2048 \
      --cache=/tmp/pp_frames_split.npz --ckpt=/tmp/pp_split_ssd.msgpack \
      2>&1 | tee "$LOG/5_pp_split_ssd.log"
  timeout 14400 python examples/train_pointpillars_surround.py 8000 \
      /tmp/pp_split_center.json --eval-frames=auto --head=center \
      --starve-weight=4 --protect-starved=2048 \
      --cache=/tmp/pp_frames_split.npz --ckpt=/tmp/pp_split_center.msgpack \
      2>&1 | tee "$LOG/5_pp_split_center.log"
  echo "(report heldout recall + heldout_clean_recall in PERFORMANCE.md)"
fi
echo "=== runbook done; logs in $LOG ==="
