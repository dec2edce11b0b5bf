"""Unit tests for the chip watcher's probe/trigger logic (examples/chip_watch.py).

The probe subprocess is faked with tiny python one-liners so no backend is
touched; the watch loop's sleep is stubbed so tests run in milliseconds.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import chip_watch  # noqa: E402


def _argv_ok():
    return [sys.executable, "-c", "print('PROBE_OK', 'tpu')"]


def _argv_fail():
    return [sys.executable, "-c",
            "import sys; print('nope', file=sys.stderr); sys.exit(1)"]


def _argv_hang():
    return [sys.executable, "-c", "import time; time.sleep(30)"]


def test_probe_once_up():
    ok, info = chip_watch.probe_once(20.0, _argv_ok())
    assert ok and info == "tpu"


def test_probe_once_down_fast():
    ok, info = chip_watch.probe_once(20.0, _argv_fail())
    assert not ok and "nope" in info


def test_probe_once_hang_bounded():
    ok, info = chip_watch.probe_once(1.0, _argv_hang())
    assert not ok and "hung" in info


def test_write_trigger_idempotent_append(tmp_path):
    d = str(tmp_path / "state")
    p1 = chip_watch.write_trigger(d, "tpu")
    p2 = chip_watch.write_trigger(d, "tpu")
    assert p1 == p2 and os.path.exists(p1)
    lines = open(p1).read().strip().splitlines()
    assert len(lines) == 2 and all("backend=tpu" in ln for ln in lines)


def test_watch_fires_cmd_on_up(tmp_path):
    d = str(tmp_path / "state")
    marker = tmp_path / "ran"
    rc = chip_watch.watch(
        interval_s=0.0, probe_timeout_s=20.0, max_hours=1.0,
        cmd=f"touch {marker}", state_dir=d, probe_argv=_argv_ok(),
        sleep=lambda _s: None, log=lambda *a, **k: None)
    assert rc == 0
    assert marker.exists(), "runbook command must run on trigger"
    assert os.path.exists(os.path.join(d, "triggered")), \
        "trigger file must be written before the runbook"


def test_watch_retries_then_fires(tmp_path, monkeypatch):
    """Down twice, then up -- the loop keeps probing and fires exactly once."""
    d = str(tmp_path / "state")
    calls = []
    seq = [(False, "down"), (False, "down"), (True, "tpu")]

    def fake_probe(timeout_s, probe_argv=None):
        calls.append(1)
        return seq[min(len(calls) - 1, len(seq) - 1)]

    monkeypatch.setattr(chip_watch, "probe_once", fake_probe)
    rc = chip_watch.watch(
        interval_s=0.0, probe_timeout_s=1.0, max_hours=1.0,
        cmd="true", state_dir=d, sleep=lambda _s: None,
        log=lambda *a, **k: None)
    assert rc == 0 and len(calls) == 3
    assert len(open(os.path.join(d, "triggered")).readlines()) == 1


def test_watch_escalates_probe_timeout(tmp_path, monkeypatch):
    """Every Nth probe must use the long timeout — a warming relay that
    takes minutes on its first device grant is only catchable there."""
    d = str(tmp_path / "state")
    timeouts = []
    seq = [(False, "down")] * 5 + [(True, "tpu")]

    def fake_probe(timeout_s, probe_argv=None):
        timeouts.append(timeout_s)
        return seq[min(len(timeouts) - 1, len(seq) - 1)]

    monkeypatch.setattr(chip_watch, "probe_once", fake_probe)
    rc = chip_watch.watch(
        interval_s=0.0, probe_timeout_s=150.0, max_hours=1.0,
        cmd="true", state_dir=d, sleep=lambda _s: None,
        log=lambda *a, **k: None, escalate_every=3,
        escalate_timeout_s=600.0)
    assert rc == 0
    assert timeouts == [150.0, 150.0, 600.0, 150.0, 150.0, 600.0]
    # escalate_every=0 disables escalation
    timeouts.clear()
    rc = chip_watch.watch(
        interval_s=0.0, probe_timeout_s=150.0, max_hours=1.0,
        cmd="true", state_dir=str(tmp_path / "s2"), sleep=lambda _s: None,
        log=lambda *a, **k: None, escalate_every=0,
        escalate_timeout_s=600.0)
    assert rc == 0 and 600.0 not in timeouts


def test_watch_window_expiry(tmp_path, monkeypatch):
    d = str(tmp_path / "state")
    monkeypatch.setattr(chip_watch, "probe_once",
                        lambda *a, **k: (False, "down"))
    clock = [0.0]

    def fake_sleep(s):
        clock[0] += max(s, 1.0)

    monkeypatch.setattr(chip_watch.time, "monotonic", lambda: clock[0])
    rc = chip_watch.watch(
        interval_s=10.0, probe_timeout_s=1.0, max_hours=0.01,  # 36s window
        cmd="true", state_dir=d, sleep=fake_sleep,
        log=lambda *a, **k: None)
    assert rc == 2
    assert not os.path.exists(os.path.join(d, "triggered"))


def test_watch_cmd_rc_propagates(tmp_path):
    d = str(tmp_path / "state")
    rc = chip_watch.watch(
        interval_s=0.0, probe_timeout_s=20.0, max_hours=1.0,
        cmd="exit 7", state_dir=d, probe_argv=_argv_ok(),
        sleep=lambda _s: None, log=lambda *a, **k: None)
    assert rc == 7


def test_watch_refuses_duplicate(tmp_path, monkeypatch):
    """Two live watchers on one state dir would fire the runbook twice."""
    d = str(tmp_path / "state")
    os.makedirs(d)
    # simulate a live chip_watch holding the dir: our own pid, with a
    # cmdline reader that reports a chip_watch process
    with open(os.path.join(d, "watch.pid"), "w") as f:
        f.write("999999999")
    monkeypatch.setattr(chip_watch, "_other_watcher_alive",
                        lambda sd: 999999999)
    rc = chip_watch.watch(
        interval_s=0.0, probe_timeout_s=1.0, max_hours=1.0,
        cmd="true", state_dir=d, sleep=lambda _s: None,
        log=lambda *a, **k: None)
    assert rc == 3


def test_other_watcher_alive_detection(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    # no pidfile -> None
    assert chip_watch._other_watcher_alive(d) is None
    # dead pid -> None
    with open(os.path.join(d, "watch.pid"), "w") as f:
        f.write("999999999")
    assert chip_watch._other_watcher_alive(d) is None
    # own pid -> None (re-entry after restart with same pid is fine)
    with open(os.path.join(d, "watch.pid"), "w") as f:
        f.write(str(os.getpid()))
    assert chip_watch._other_watcher_alive(d) is None
