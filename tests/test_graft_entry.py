"""Driver-gate regression guards for ``__graft_entry__``.

Round 3's MULTICHIP gate timed out (rc=124) because ``dryrun_multichip``
probed ``jax.devices()`` on the default axon backend in the parent
process, and that call HANGS (does not raise) when the TPU relay is sick.
These tests pin the hang-proof contract: the parent goes straight to a
bounded subprocess and never initialises the default backend itself.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __graft_entry__ as graft  # noqa: E402


class _Recorder:
    def __init__(self, returncode=0):
        self.calls = []
        self.returncode = returncode

    def __call__(self, argv, **kwargs):
        self.calls.append((argv, kwargs))
        return subprocess.CompletedProcess(argv, self.returncode)


def test_parent_never_probes_default_backend(monkeypatch):
    """The parent must not call jax.devices()/jax.local_devices(): on a
    sick axon relay those hang forever and ``except Exception`` cannot
    catch a hang."""
    import jax

    def _hang_trap(*a, **k):
        raise AssertionError(
            "dryrun_multichip touched the default backend in the parent")

    monkeypatch.setattr(jax, "devices", _hang_trap)
    monkeypatch.setattr(jax, "local_devices", _hang_trap)
    rec = _Recorder()
    monkeypatch.setattr(graft.subprocess, "run", rec)
    monkeypatch.delenv("GRAFT_DRYRUN_INPROC", raising=False)

    graft.dryrun_multichip(8)

    assert len(rec.calls) == 1
    argv, kwargs = rec.calls[0]
    assert "timeout" in kwargs and kwargs["timeout"] > 0
    env = kwargs["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]


def test_subprocess_failure_raises(monkeypatch):
    rec = _Recorder(returncode=3)
    monkeypatch.setattr(graft.subprocess, "run", rec)
    monkeypatch.delenv("GRAFT_DRYRUN_INPROC", raising=False)
    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(4)


def test_subprocess_timeout_raises(monkeypatch):
    def _expire(argv, **kwargs):
        raise subprocess.TimeoutExpired(argv, kwargs["timeout"])

    monkeypatch.setattr(graft.subprocess, "run", _expire)
    monkeypatch.delenv("GRAFT_DRYRUN_INPROC", raising=False)
    with pytest.raises(RuntimeError, match="exceeded"):
        graft.dryrun_multichip(4)


def test_entry_returns_jittable():
    fn, args = graft.entry()
    assert callable(fn) and len(args) == 2
