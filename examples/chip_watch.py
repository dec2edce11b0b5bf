#!/usr/bin/env python
"""Chip watcher: probe the TPU relay in a loop and fire the TPU-window
runbook the moment the chip answers.

Rounds 3-4 lost their perf/quality agenda to relay downtime because the
"probe every 14 minutes" habit lived outside the repo (VERDICT r4, weak #1).
This commits it: run

    python examples/chip_watch.py --cmd "bash examples/tpu_window.sh retrain"

in a tmux pane (or nohup) and the runbook launches automatically in the
first window the relay answers.  State lands in /tmp/tpu_window/:

* ``watch.log``   -- one line per probe (timestamp, ok/err, latency);
* ``triggered``   -- written (with the timestamp + probe info) the moment a
  probe succeeds, BEFORE the runbook starts, so the trigger is observable
  even if the runbook itself dies.

Probe discipline (same as bench.py's hardening): the relay, when sick, can
either fail fast ("No jellyfish device found") or HANG jax.devices() --
so the probe always runs in a subprocess with a hard timeout, and the
image's sitecustomize overrides a plain JAX_PLATFORMS env var, so the
child pins the backend via jax.config (see bench._select_platform).
"""

from __future__ import annotations

import argparse
import datetime
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Probe the DEFAULT backend -- the axon TPU plugin the image's
# sitecustomize registers, i.e. the exact path bench.py and the runbook
# serve through.  (Pinning jax_platforms='tpu' probes a different init
# path that can fail fast while the axon plugin hangs, or vice versa.)
# The sick relay can hang the first device op, hence the subprocess +
# hard timeout around this.  A cpu default means the TPU plugin is
# absent -- that is a DOWN verdict, not a trigger.
PROBE_CODE = (
    "import jax, jax.numpy as jnp; "
    "x = float(jnp.ones(()).sum()); "
    "b = jax.default_backend(); "
    "assert b != 'cpu', 'default backend is cpu (no TPU plugin)'; "
    "print('PROBE_OK', b)")


def default_probe_argv() -> list[str]:
    return [sys.executable, "-c", PROBE_CODE]


def probe_once(timeout_s: float, probe_argv: list[str] | None = None,
               ) -> tuple[bool, str]:
    """One subprocess probe with a hard timeout.

    Returns (ok, info): info is the backend name on success, else a short
    diagnostic (last stderr/stdout line, or a hang notice).
    """
    argv = probe_argv or default_probe_argv()
    try:
        res = subprocess.run(argv, cwd=ROOT, capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe hung >{timeout_s:.0f}s"
    if res.returncode == 0 and "PROBE_OK" in res.stdout:
        return True, res.stdout.strip().split()[-1]
    tail = (res.stderr or res.stdout or "").strip().splitlines()
    # prefer the actual exception line over JAX's trailing
    # traceback-filtering notice
    for line in reversed(tail):
        if "Error" in line or "error" in line:
            return False, line.strip()[:240]
    return False, (tail[-1][:240] if tail else f"rc={res.returncode}")


def write_trigger(state_dir: str, info: str) -> str:
    """Record that the chip answered (idempotent, pre-runbook)."""
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, "triggered")
    with open(path, "a") as f:
        f.write(f"{datetime.datetime.now().isoformat()} backend={info}\n")
    return path


def _other_watcher_alive(state_dir: str) -> int | None:
    """PID of another live chip_watch holding this state dir, else None."""
    pid_path = os.path.join(state_dir, "watch.pid")
    try:
        pid = int(open(pid_path).read().strip())
    except (OSError, ValueError):
        return None
    if pid == os.getpid():
        return None
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmdline = f.read().decode(errors="replace")
    except OSError:
        return None
    return pid if "chip_watch" in cmdline else None


def watch(interval_s: float, probe_timeout_s: float, max_hours: float,
          cmd: str | None, state_dir: str,
          probe_argv: list[str] | None = None,
          sleep=time.sleep, log=print,
          escalate_every: int = 4, escalate_timeout_s: float = 600.0) -> int:
    """Probe loop.  Returns the runbook's exit code on trigger, 2 if the
    watch window expired with the chip still down, 3 if another watcher
    already holds the state dir (two watchers would fire the runbook
    twice).

    Every ``escalate_every``-th probe waits ``escalate_timeout_s`` instead
    of the base timeout: a RECOVERING relay registers the backend fast but
    can sit minutes in the first device grant (observed round 5 — probes
    flipped from fail-fast to hang-at-init), and a fixed short timeout
    would classify that live-but-warming chip as down forever."""
    os.makedirs(state_dir, exist_ok=True)
    other = _other_watcher_alive(state_dir)
    if other is not None:
        log(f"[chip_watch] another watcher (pid {other}) holds "
            f"{state_dir}; refusing to double-watch", flush=True)
        return 3
    with open(os.path.join(state_dir, "watch.pid"), "w") as f:
        f.write(str(os.getpid()))
    deadline = time.monotonic() + max_hours * 3600.0
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        timeout_s = (escalate_timeout_s
                     if escalate_every and attempt % escalate_every == 0
                     else probe_timeout_s)
        t0 = time.monotonic()
        ok, info = probe_once(timeout_s, probe_argv)
        dt = time.monotonic() - t0
        stamp = datetime.datetime.now().isoformat(timespec="seconds")
        log(f"[chip_watch] {stamp} probe#{attempt} "
            f"{'UP ' + info if ok else 'down: ' + info} ({dt:.1f}s)",
            flush=True)
        if ok:
            write_trigger(state_dir, info)
            if not cmd:
                return 0
            log(f"[chip_watch] firing: {cmd}", flush=True)
            return subprocess.call(cmd, shell=True, cwd=ROOT)
        sleep(max(0.0, interval_s - dt))
    log("[chip_watch] window expired, chip never answered", flush=True)
    return 2


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--interval", type=float, default=600.0,
                    help="seconds between probes (default 600)")
    ap.add_argument("--probe-timeout", type=float, default=150.0,
                    help="hard per-probe subprocess timeout (default 150)")
    ap.add_argument("--escalate-every", type=int, default=4,
                    help="every Nth probe uses the long timeout (0 = "
                         "never; default 4) to catch a relay that grants "
                         "its first device slowly while warming up")
    ap.add_argument("--escalate-timeout", type=float, default=600.0,
                    help="the long probe timeout (default 600)")
    ap.add_argument("--max-hours", type=float, default=24.0,
                    help="give up after this many hours (default 24)")
    ap.add_argument("--cmd", default="bash examples/tpu_window.sh retrain",
                    help="command to exec (cwd=repo root) when the chip "
                         "answers; empty string = just record + exit 0")
    ap.add_argument("--state-dir", default="/tmp/tpu_window")
    ap.add_argument("--once", action="store_true",
                    help="single probe: exit 0 if up, 1 if down (no cmd)")
    args = ap.parse_args()
    if args.once:
        ok, info = probe_once(args.probe_timeout)
        print(f"[chip_watch] {'UP ' + info if ok else 'down: ' + info}")
        return 0 if ok else 1
    return watch(args.interval, args.probe_timeout, args.max_hours,
                 args.cmd or None, args.state_dir,
                 escalate_every=args.escalate_every,
                 escalate_timeout_s=args.escalate_timeout)


if __name__ == "__main__":
    sys.exit(main())
