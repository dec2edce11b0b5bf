"""Pipeline parallelism (GPipe schedule over the model axis) on the
8-device virtual CPU mesh: forward parity, gradient parity, bubble math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.parallel import make_mesh
from lidar_object_detection_tpu.parallel.pipeline import (
    pipeline_apply, pipeline_loss_fn)

S = 8            # stages = model axis size
D = 16           # feature dim
MB = 4           # microbatch size
M = 6            # microbatches


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(model_parallel=8)     # 1 x 8 (data, model)


def _stage(params, h):
    return jax.nn.relu(h @ params["w"] + params["b"])


def _stacked_params(rng):
    return {"w": jnp.asarray(rng.normal(0, 0.5, (S, D, D)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(0, 0.1, (S, D)).astype(np.float32))}


def _sequential(params, x):
    h = x
    for i in range(S):
        h = _stage(jax.tree_util.tree_map(lambda a: a[i], params), h)
    return h


def test_pipeline_forward_matches_sequential(rng, mesh8):
    params = _stacked_params(rng)
    x = jnp.asarray(rng.normal(size=(M, MB, D)).astype(np.float32))
    out = pipeline_apply(mesh8, _stage, params, x)
    ref = _sequential(params, x.reshape(M * MB, D)).reshape(M, MB, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_single_microbatch(rng, mesh8):
    params = _stacked_params(rng)
    x = jnp.asarray(rng.normal(size=(1, MB, D)).astype(np.float32))
    out = pipeline_apply(mesh8, _stage, params, x)
    ref = _sequential(params, x[0])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential(rng, mesh8):
    """Backprop through the ppermute schedule == sequential backprop:
    pipeline-parallel TRAINING, not just inference."""
    params = _stacked_params(rng)
    x = jnp.asarray(rng.normal(size=(M, MB, D)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(M, MB, D)).astype(np.float32))

    mse = lambda out, tgt: jnp.mean((out - tgt) ** 2)
    pipe_loss = pipeline_loss_fn(mesh8, _stage, mse)
    seq_loss = lambda p, x_, y_: mse(
        _sequential(p, x_.reshape(-1, D)).reshape(x_.shape), y_)

    lp, gp = jax.value_and_grad(pipe_loss)(params, x, y)
    ls, gs = jax.value_and_grad(seq_loss)(params, x, y)
    assert np.isclose(float(lp), float(ls), rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(np.asarray(gp[k]), np.asarray(gs[k]),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_trains(rng, mesh8):
    """A few SGD steps through the pipeline reduce the loss."""
    params = _stacked_params(rng)
    x = jnp.asarray(rng.normal(size=(M, MB, D)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(M, MB, D)).astype(np.float32)) * 0.1

    loss = pipeline_loss_fn(mesh8, _stage,
                            lambda o, t: jnp.mean((o - t) ** 2))
    step = jax.jit(lambda p, x_, y_: jax.value_and_grad(loss)(p, x_, y_))
    losses = []
    for _ in range(8):
        l, g = step(params, x, y)
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.05 * gg,
                                        params, g)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9, losses
