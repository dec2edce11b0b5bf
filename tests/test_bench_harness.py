"""Hang/crash-discipline guards for bench.py (the round-3 BENCH gate died
rc=1 with no JSON line when the TPU relay was sick)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def test_probe_timeout_is_detected(monkeypatch):
    def _expire(argv, **kwargs):
        raise subprocess.TimeoutExpired(argv, kwargs["timeout"])

    monkeypatch.setattr(bench.subprocess, "run", _expire)
    ok, info = bench._probe_backend(1.0)
    assert not ok and "hung" in info


def test_wait_for_backend_raises_clean_diagnostic(monkeypatch):
    monkeypatch.setenv("BENCH_PROBE_TIMEOUT_S", "1")
    monkeypatch.setenv("BENCH_INIT_BUDGET_S", "2")
    monkeypatch.setenv("BENCH_INIT_RETRY_SLEEP_S", "0.1")

    def _dead(argv, **kwargs):
        return subprocess.CompletedProcess(argv, 1, stdout="",
                                           stderr="RuntimeError: UNAVAILABLE")

    monkeypatch.setattr(bench.subprocess, "run", _dead)
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._wait_for_backend()


def test_headline_record_is_driver_parseable():
    bench._HEADLINE.clear()
    bench._HEADLINE.update({"metric": "m", "value": 1.0, "unit": "u",
                            "vs_baseline": 0.002})
    line = json.dumps(bench._headline_record({"stream_reps": 5}))
    parsed = json.loads(line)
    assert parsed["value"] == 1.0
    assert parsed["extra"]["stream_reps"] == 5
    bench._HEADLINE.clear()


def test_extras_run_in_bounded_subprocesses(monkeypatch):
    """Every extra must go through subprocess.run with a timeout; a hang
    inside one extra becomes a bounded `_error` entry, never a stall."""
    calls = []

    def _fake_run(argv, **kwargs):
        calls.append((argv, kwargs))
        assert kwargs.get("timeout", 0) > 0
        name = argv[-1]
        if name == "stream":
            raise subprocess.TimeoutExpired(argv, kwargs["timeout"])
        payload = json.dumps({f"{name}_frames_per_sec": 123.0})
        return subprocess.CompletedProcess(
            argv, 0, stdout=f"BENCH_EXTRA_JSON {payload}\n", stderr="")

    monkeypatch.setattr(bench.subprocess, "run", _fake_run)
    extra = {}
    bench._run_extras_subprocess(extra)
    assert len(calls) == len(bench.EXTRAS)
    assert extra["learned_ckpt_frames_per_sec"] == 123.0
    assert extra["exact_masks_frames_per_sec"] == 123.0
    assert "timeout" in extra["stream_error"]


def test_extras_budget_skips(monkeypatch):
    monkeypatch.setenv("BENCH_EXTRA_BUDGET_S", "0")

    def _fail(*a, **k):
        raise AssertionError("no subprocess should run with a zero budget")

    monkeypatch.setattr(bench.subprocess, "run", _fail)
    extra = {}
    bench._run_extras_subprocess(extra)
    assert all(extra[f"{n}_skipped"] == "budget" for n in bench.EXTRAS)


def test_cpu_fallback_on_backend_failure(monkeypatch):
    """A dead relay must not cost the round's evidence: the headline runs
    on CPU, loudly labeled, and extras inherit the CPU pin."""
    monkeypatch.setattr(bench, "_wait_for_backend",
                        lambda: (_ for _ in ()).throw(RuntimeError("down")))
    monkeypatch.setattr(bench, "_run_extras_subprocess", lambda extra: None)

    class _Ctx:
        scale = "x"
        variables = None
        wpath = "none"
        serving_thr = 0.5   # BenchContext resolves this from the sidecar

        def __init__(self):
            import jax
            self.jax = jax

        def make_detector(self, *a, **k):
            return None

        def timed_e2e(self, det):
            return 7.0

    monkeypatch.setattr(bench, "BenchContext", _Ctx)
    monkeypatch.setenv("BENCH_CPU_FALLBACK", "1")
    monkeypatch.delenv("BENCH_REPLICAS", raising=False)
    monkeypatch.delenv("LIDAR_TPU_PLATFORM", raising=False)  # restored
    import io
    import sys as _sys
    buf = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", buf)
    monkeypatch.setattr(_sys, "argv", ["bench.py"])
    bench.main()
    lines = [json.loads(l) for l in buf.getvalue().strip().splitlines()]
    assert any("CPU-FALLBACK" in r.get("metric", "") for r in lines)
    assert lines[0]["value"] == 7.0
    assert os.environ["LIDAR_TPU_PLATFORM"] == "cpu"
    assert os.environ["BENCH_REPLICAS"] == "1"


def test_cpu_fallback_disabled(monkeypatch):
    monkeypatch.setattr(bench, "_wait_for_backend",
                        lambda: (_ for _ in ()).throw(RuntimeError("down")))
    monkeypatch.setenv("BENCH_CPU_FALLBACK", "0")
    import io
    import sys as _sys
    buf = io.StringIO()
    monkeypatch.setattr(_sys, "stdout", buf)
    monkeypatch.setattr(_sys, "argv", ["bench.py"])
    with pytest.raises(SystemExit):
        bench.main()
    assert "down" in json.loads(buf.getvalue().strip())["error"]
