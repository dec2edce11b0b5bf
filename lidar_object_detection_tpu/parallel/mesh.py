"""Device mesh construction for multi-chip scale-out.

The reference is entirely sequential (one process, one GPU -- SURVEY.md
section 2.4); the TPU framework scales through a ``jax.sharding.Mesh`` with
two axes:

* ``data``  -- the primary axis: frames are embarrassingly parallel, so the
  frame batch shards here (DP).
* ``model`` -- the secondary axis, used two ways: tensor-parallel sharding
  of detector conv channels (TP), and point-axis sharding of the 131k-point
  scan dimension inside the fusion step (the sequence/context-parallel
  analogue for this workload, SURVEY.md section 5.7).

All communication is XLA collectives (psum / all-gather) over ICI within a
slice and DCN across slices; there is no custom transport.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given (or all) devices.

    ``model_parallel`` divides the device count; the remainder is the data
    axis.  With one device this degenerates to a 1x1 mesh, so all sharded
    code paths also run single-chip.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch/frame) axis over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def point_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the point axis (axis 1 of a (B, P, ...) array) over ``model``."""
    spec = [DATA_AXIS, MODEL_AXIS] + [None] * (ndim - 2)
    return NamedSharding(mesh, P(*spec))
