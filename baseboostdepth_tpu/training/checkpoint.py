"""Checkpointing via Orbax.

The reference saves one .pth per model + adam.pth per epoch folder and
infers the resume epoch from the folder name (trainer.py:783-829). Here a
single Orbax CheckpointManager owns (TrainState, config dict, epoch):
atomic, async-capable, step-indexed, restorable onto any mesh.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state: Any, extra: Optional[dict] = None) -> None:
        payload = {"state": state}
        if extra is not None:
            payload["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target_state: Any, step: Optional[int] = None) -> Tuple[Any, Optional[dict]]:
        """Restore onto the structure/shardings of `target_state`."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        ref = {"state": target_state, "extra": ocp.args.StandardRestore}
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": target_state})
        )
        return restored["state"], restored.get("extra")

    def close(self):
        self._mgr.close()
