"""BN-fold serving-weight transform parity (weights.fold_serving_variables).

The serving path folds BatchNorm into conv kernels and casts the tree to
bf16 once at load (profiling showed per-step f32->bf16 weight conversion
dominating the detector forward).  These tests pin the transform's
numerics: exact in f32, and no worse than the unfolded bf16 path at the
bf16 level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_object_detection_tpu.models.yolo.model import Yolo11, YoloConfig
from lidar_object_detection_tpu.models.yolo.weights import \
    fold_serving_variables


def _jitter(variables, seed=0):
    """Give params + BN running stats nontrivial values so the fold
    actually moves numbers (flax init leaves mean=0, var=1, scale=1)."""
    rng = np.random.default_rng(seed)

    def leafmap(path, x):
        x = np.asarray(x, np.float32)
        name = None
        for p in reversed(path):
            if hasattr(p, "key"):
                name = p.key
                break
        if name == "var":
            return x * rng.uniform(0.5, 2.0, x.shape).astype(np.float32)
        if name == "mean":
            return x + rng.normal(0, 0.2, x.shape).astype(np.float32)
        if name in ("scale",):
            return x * rng.uniform(0.8, 1.2, x.shape).astype(np.float32)
        if name in ("bias",):
            return x + rng.normal(0, 0.05, x.shape).astype(np.float32)
        return x

    return jax.tree_util.tree_map_with_path(leafmap, variables)


@pytest.fixture(scope="module")
def jittered_model():
    cfg = YoloConfig(scale="n", num_classes=80, segment=True)
    model = Yolo11(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    variables = _jitter(variables, seed=7)
    img = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    return model, variables, img


def _flat_outputs(out):
    return jnp.concatenate(
        [jnp.ravel(t).astype(jnp.float32)
         for t in jax.tree_util.tree_leaves(out)])


def test_fold_identity_f32(jittered_model):
    """Folded f32 variables reproduce the unfolded forward exactly (to
    reassociation-level float error)."""
    model, variables, img = jittered_model
    folded = fold_serving_variables(variables, dtype=jnp.float32)
    fwd = jax.jit(model.apply)   # eager apply dispatches ~10x slower on CPU
    ref = _flat_outputs(fwd(variables, img))
    got = _flat_outputs(fwd(folded, img))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fold_bn_degenerates(jittered_model):
    """After the fold every BN is the exact-identity pair: scale 1,
    mean 0, var + eps == 1 (so rsqrt(var+eps) == 1 even in bf16)."""
    _, variables, _ = jittered_model
    folded = fold_serving_variables(variables, dtype=jnp.float32)

    def check(path, x):
        name = next((p.key for p in reversed(path) if hasattr(p, "key")), "")
        names = [p.key for p in path if hasattr(p, "key")]
        if "bn" in names:
            x = np.asarray(x, np.float32)
            if name == "scale":
                assert np.all(x == 1.0)
            elif name == "mean":
                assert np.all(x == 0.0)
            elif name == "var":
                np.testing.assert_allclose(x + 1e-3, 1.0, atol=1e-6)
        return x

    jax.tree_util.tree_map_with_path(check, folded["params"])
    jax.tree_util.tree_map_with_path(check, folded["batch_stats"])


def test_fold_bf16_no_worse_than_unfolded(jittered_model):
    """bf16 folded serving output stays within the unfolded bf16 path's
    own distance from the f32 reference (the fold changes only when
    rounding happens, not the math)."""
    model, variables, img = jittered_model
    ref = np.asarray(_flat_outputs(jax.jit(model.apply)(variables, img)))

    bf16_model = Yolo11(model.cfg, dtype=jnp.bfloat16)
    fwd16 = jax.jit(bf16_model.apply)
    img16 = img.astype(jnp.bfloat16)
    unfolded = np.asarray(_flat_outputs(fwd16(variables, img16)))
    folded_vars = fold_serving_variables(variables, dtype=jnp.bfloat16)
    folded = np.asarray(_flat_outputs(fwd16(folded_vars, img16)))

    err_unfolded = np.abs(unfolded - ref).mean()
    err_folded = np.abs(folded - ref).mean()
    # same error regime; 1.5x headroom for different rounding points
    assert err_folded <= 1.5 * err_unfolded + 1e-4, \
        (err_folded, err_unfolded)
