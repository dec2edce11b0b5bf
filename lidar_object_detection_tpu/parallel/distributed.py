"""Multi-host initialization helpers.

Single-slice multi-chip needs nothing beyond ``make_mesh``; across hosts
(and across slices over DCN) JAX needs the distributed runtime brought up
before any backend use.  The reference has no distributed story at all
(SURVEY.md section 2.4); here the whole comm stack is jax collectives --
ICI within a slice, DCN across slices -- with no custom transport.

Typical multi-host launch (same program on every host):

    from lidar_object_detection_tpu.parallel import distributed, make_mesh
    distributed.initialize()          # env-driven (TPU pods autoconfigure)
    mesh = make_mesh(model_parallel=4)  # global devices, dp x tp

Failure/elastic behavior follows the JAX coordinator model: a lost host
fails the step; restart re-initializes from the latest Orbax checkpoint
(parallel/checkpoint.py) and the idempotent metric store (eval/store.py)
makes eval reruns safe -- the batched analogue of the reference's
skip-and-continue frame loop (V1:322-327).
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed.  On TPU pods all arguments are inferred
    from the environment; pass them explicitly elsewhere.  Safe to call
    when already initialized (no-op)."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError as e:
        if "already" not in str(e).lower():
            raise


def is_primary() -> bool:
    """True on the process that should write checkpoints / CSVs."""
    import jax

    return jax.process_index() == 0
