"""Orbax checkpoint / resume for training state.

The reference has no state checkpointing (weights are external ``.pt``
files loaded at import, V1:14; SURVEY.md section 5 prescribes "Orbax for
converted Flax YOLO params").  This wraps ``orbax.checkpoint`` with the
framework's :class:`~lidar_object_detection_tpu.parallel.train.TrainState`.
"""

from __future__ import annotations

import os
from typing import Any, Optional


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        tree = {
            "variables": state.variables,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Optional[Any]:
        """Restore into the structure of ``state_template``; None when no
        checkpoint exists."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "variables": state_template.variables,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        return type(state_template)(
            variables=restored["variables"],
            opt_state=restored["opt_state"],
            step=restored["step"])

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save_detector_variables(self, variables: Any, step: int = 0) -> None:
        """Checkpoint converted detector weights (e.g. the yolo11x-seg
        conversion) for fast reload without the torch state dict."""
        import orbax.checkpoint as ocp

        self._mgr.save(step, args=ocp.args.StandardSave(
            {"variables": variables}))
        self._mgr.wait_until_finished()
