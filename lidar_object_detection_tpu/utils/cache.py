"""Persistent XLA compilation cache.

TPU compiles of the fused pipeline / Hungarian scan are tens of seconds;
enabling JAX's on-disk compilation cache makes every repeat process start
warm.  Called by the CLI and bench entry points; safe to call twice.

Cross-host safety: XLA:CPU cache entries embed host machine code (AOT
executables).  When the cache dir is shared between hosts with different
CPU features -- as happens when the driver's multichip dryrun runs on a
different machine than the builder -- a cache hit can deserialize an
executable compiled for the other host's ISA ("could lead to execution
errors such as SIGILL", observed in MULTICHIP_r04.json).  So unless the
platform is definitely a TPU (tpu/axon), the cache lives in a
per-CPU-signature subdirectory keyed by the /proc/cpuinfo flags line;
TPU executables are not host-CPU-dependent and keep the shared
directory (warm across hosts, which is what the driver bench wants).

Note: XLA:CPU's AOT loader still logs a feature-mismatch ERROR even when
a host loads an entry it compiled itself -- the compile side records LLVM
*tuning* pseudo-features (+prefer-no-gather / +prefer-no-scatter, x86
Downfall mitigations) that load-time host-feature enumeration never
reports.  With the per-host keying here those lines are same-host false
positives by construction; __graft_entry__.dryrun_multichip filters them
from its tail.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_cpu_tag() -> str:
    """Short stable signature of this host's CPU ISA feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return platform.machine() or "unknown"


def _effective_platform() -> str:
    """The platform jax will use, WITHOUT initializing a backend."""
    try:
        import jax

        val = jax.config.read("jax_platforms")
        if val:
            return val.split(",")[0]
    except Exception:
        pass
    # the image's sitecustomize exports JAX_PLATFORMS for the axon TPU
    return (os.environ.get("JAX_PLATFORMS") or "default").split(",")[0]


# platforms whose executables are NOT host-CPU machine code; everything
# else (cpu, and any ambiguous "default" that may resolve to CPU when no
# TPU plugin registers) gets the per-host keyed directory -- erring
# toward keyed costs one cold compile per host, erring toward shared
# risks loading another host's AOT machine code (SIGILL)
_TPU_PLATFORMS = ("tpu", "axon")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "LIDAR_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "lidar_tpu_xla"))
    if _effective_platform() not in _TPU_PLATFORMS:
        cache_dir = os.path.join(cache_dir, f"cpu-{_host_cpu_tag()}")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the run for it
