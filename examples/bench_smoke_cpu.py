"""CPU smoke run of bench.py — validates every bench code path (headline
+ all three extras) on tiny settings without a TPU.

The numbers are meaningless on CPU; the point is that the driver's
end-of-round `python bench.py` cannot hit an unexercised branch: the
learned-checkpoint load/fold path, the exact-mask detector build, and the
disk->CSV stream loop all run here.

Usage:  python examples/bench_smoke_cpu.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    # LIDAR_TPU_PLATFORM (not JAX_PLATFORMS -- the sitecustomize overrides
    # that env var): bench.py probes the backend and runs each extra in
    # SUBPROCESSES (round-4 hang-proofing), and each of those re-pins the
    # platform from this variable via bench._select_platform()
    os.environ["LIDAR_TPU_PLATFORM"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")   # before first backend use

    os.environ.setdefault("BENCH_YOLO_SCALE", "n")
    os.environ.setdefault("BENCH_ITERS", "1")
    os.environ.setdefault("BENCH_REPLICAS", "1")
    os.environ.setdefault("BENCH_STREAM_REPS", "1")
    os.environ.setdefault("BENCH_EXTRA_BUDGET_S", "100000")

    import io
    import contextlib

    import bench

    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
    except SystemExit as e:   # diagnostic path: show what bench printed
        sys.stdout.write(buf.getvalue())
        print(f"SMOKE FAIL: bench exited rc={e.code}")
        return 1
    line = buf.getvalue().strip().splitlines()[-1]
    out = json.loads(line)
    print(json.dumps(out, indent=2))

    extra = out.get("extra", {})
    problems = [k for k in extra if k.endswith("_error") or
                k.endswith("_skipped")]
    required = ("exact_masks_frames_per_sec", "learned_ckpt_frames_per_sec",
                "stream_frames_per_sec")
    missing = [k for k in required if k not in extra]
    if problems or missing:
        print(f"SMOKE FAIL: problems={problems} missing={missing}")
        return 1
    print("SMOKE OK: headline + all extras ran")
    return 0


if __name__ == "__main__":
    sys.exit(main())
