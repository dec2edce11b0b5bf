"""GPipe-style pipeline parallelism over the ``model`` mesh axis.

SURVEY.md section 2.4 row 3.  The reference has no model bigger than one
GPU, and neither does this framework today -- but the scale-out design
must not dead-end, so the pipeline executor is a first-class primitive
like the DP/TP/point-sharding paths.

TPU-first shape: pipeline stages live one-per-device along ``model``;
microbatches stream stage-to-stage over ICI via ``lax.ppermute`` (the
neighbor-shift collective, ring-friendly on TPU interconnect).  The whole
schedule is ONE ``lax.fori_loop`` inside ONE ``shard_map`` -- static
control flow, no per-tick dispatch:

  tick t:   every device applies its stage to the microbatch it holds
            (devices still in the fill/drain bubble compute on zeros --
            cheaper to compute-and-discard than to branch);
  then:     states shift +1 along ``model``; stage 0 injects microbatch
            t+1, the last stage banks its finished output.

``M`` microbatches through ``S`` stages take ``M + S - 1`` ticks (the
classic GPipe bubble of ``(S-1)/(M+S-1)``).  The loop is differentiable --
``ppermute`` transposes to the reverse shift -- so ``jax.grad`` through
:func:`pipeline_apply` implements pipeline-parallel training without any
extra machinery (tested in tests/test_pipeline_parallel.py).

The executor handles the homogeneous-chain case (every stage maps
(microbatch features) -> (same-shape features), stage parameters stacked
on a leading S axis) -- exactly the transformer-block / repeated-conv-block
shape pipeline parallelism exists for.  Heterogeneous chains pad to the
union shape or stay on the TP/DP paths.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lidar_object_detection_tpu.parallel.mesh import MODEL_AXIS


def pipeline_apply(mesh: Mesh, stage_fn: Callable, stacked_params, x):
    """Run a homogeneous stage chain as a pipeline over ``model``.

    Args:
      mesh: a mesh whose ``model`` axis size S equals the stage count.
      stage_fn: ``stage_fn(params_i, h) -> h`` for one stage; must preserve
        the microbatch feature shape.
      stacked_params: pytree whose leaves have leading axis S (stage i's
        parameters at index i).
      x: (M, mb, ...) microbatched input, M >= 1 microbatches.

    Returns:
      (M, mb, ...) output of the full chain, replicated.
    """
    s = mesh.shape[MODEL_AXIS]
    m = x.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(MODEL_AXIS), P()),
        out_specs=P(),
    )
    def run(params, xs):
        # params: leading axis 1 (this device's stage); xs: (M, mb, ...)
        my_params = jax.tree_util.tree_map(lambda a: a[0], params)
        stage = jax.lax.axis_index(MODEL_AXIS)
        perm = [(i, (i + 1) % s) for i in range(s)]
        zero = jnp.zeros_like(xs[0])

        def tick(t, carry):
            state, out = carry
            # stage 0 swaps in microbatch t (zeros once the input drains)
            inject = jnp.where(t < m, xs[jnp.minimum(t, m - 1)], zero)
            h = jnp.where(stage == 0, inject, state)
            h = stage_fn(my_params, h)
            # the last stage banks microbatch (t - s + 1) when it exists
            done_idx = t - (s - 1)
            bank = (stage == s - 1) & (done_idx >= 0)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(bank, h, out[jnp.maximum(done_idx, 0)]),
                jnp.maximum(done_idx, 0), axis=0)
            # shift every state one stage forward (ring; stage 0's incoming
            # wrap-around value is ignored -- it injects instead)
            state = jax.lax.ppermute(h, MODEL_AXIS, perm)
            return state, out

        # the carry varies per stage; mark the (replicated) zeros as such
        out0 = jax.lax.pcast(jnp.zeros_like(xs), (MODEL_AXIS,),
                             to="varying")
        zero_v = jax.lax.pcast(zero, (MODEL_AXIS,), to="varying")
        _, out = jax.lax.fori_loop(0, m + s - 1, tick, (zero_v, out0))
        # only the last stage holds real outputs; replicate via psum
        out = jnp.where(stage == s - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, MODEL_AXIS)

    return run(stacked_params, x)


def pipeline_loss_fn(mesh: Mesh, stage_fn: Callable,
                     loss_fn: Callable) -> Callable:
    """Wrap :func:`pipeline_apply` into a scalar loss for ``jax.grad``.

    ``loss_fn(outputs, targets) -> scalar``; gradients flow back through
    the ppermute schedule (its transpose is the reverse shift), giving
    pipeline-parallel backprop with the same bubble.
    """
    def fn(stacked_params, x, targets):
        out = pipeline_apply(mesh, stage_fn, stacked_params, x)
        return loss_fn(out, targets)
    return fn
