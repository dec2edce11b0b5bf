"""Sharded PointPillars training step (DP over frames on the mesh)."""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_object_detection_tpu.models.pointpillars.loss import (
    pointpillars_loss)
from lidar_object_detection_tpu.models.pointpillars.model import (
    PillarsConfig, PointPillars)
from lidar_object_detection_tpu.parallel.mesh import DATA_AXIS
from lidar_object_detection_tpu.parallel.train import TrainState


class PillarsTrainer:
    def __init__(self, cfg: PillarsConfig, mesh: Mesh,
                 num_points: int = 131072, learning_rate: float = 2e-3,
                 weight_decay: float = 1e-4, dtype: Any = jnp.float32,
                 seed: int = 0):
        self.cfg = cfg
        self.mesh = mesh
        self.model = PointPillars(cfg, dtype=dtype)
        self.tx = optax.adamw(learning_rate, weight_decay=weight_decay)

        pts = jnp.zeros((1, num_points, 4), jnp.float32)
        pv = jnp.zeros((1, num_points), bool)
        variables = jax.jit(functools.partial(self.model.init, train=False))(
            jax.random.PRNGKey(seed), pts, pv)
        variables = jax.device_put(
            variables, NamedSharding(mesh, P()))
        self.state = TrainState(variables=variables,
                                opt_state=self.tx.init(variables["params"]),
                                step=jnp.zeros((), jnp.int32))
        self._step = jax.jit(functools.partial(
            _train_step, model=self.model, tx=self.tx, cfg=cfg))

    def train_step(self, points, valid, gt_boxes7, gt_classes,
                   gt_valid) -> Dict[str, Any]:
        put = lambda a: jax.device_put(
            jnp.asarray(a),
            NamedSharding(self.mesh,
                          P(DATA_AXIS, *([None] * (jnp.asarray(a).ndim - 1)))))
        self.state, metrics = self._step(
            self.state, put(points), put(valid), put(gt_boxes7),
            put(gt_classes), put(gt_valid))
        return metrics

    def apply(self, points, valid):
        return self.model.apply(self.state.variables, jnp.asarray(points),
                                jnp.asarray(valid))


def _train_step(state: TrainState, points, valid, gt_boxes7, gt_classes,
                gt_valid, *, model: PointPillars, tx, cfg: PillarsConfig):
    variables = state.variables
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    gt_pw = None
    if cfg.head == "center" and cfg.starve_weight > 0:
        from lidar_object_detection_tpu.models.pointpillars.center import (
            starve_weights)
        gt_pw = starve_weights(points, valid, gt_boxes7, gt_valid, cfg)

    def loss_fn(p):
        out, updates = model.apply({"params": p, **rest}, points, valid,
                                   train=True, mutable=["batch_stats"])
        losses = pointpillars_loss(out, gt_boxes7, gt_classes, gt_valid, cfg,
                                   gt_pos_weight=gt_pw)
        return losses["loss"], (losses, updates)

    (loss, (losses, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates_tx, opt_state = tx.update(grads, state.opt_state, params)
    params = optax.apply_updates(params, updates_tx)
    new_vars = {"params": params, **rest}
    new_vars.update(updates)
    return (TrainState(variables=new_vars, opt_state=opt_state,
                       step=state.step + 1),
            {k: v for k, v in losses.items()})
