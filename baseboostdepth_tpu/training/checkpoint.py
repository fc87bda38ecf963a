"""Checkpointing via Orbax.

The reference saves one .pth per model + adam.pth per epoch folder and
infers the resume epoch from the folder name (trainer.py:783-829). Here a
single Orbax CheckpointManager owns (TrainState, config dict, epoch):
atomic, async-capable, step-indexed, restorable onto any mesh.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

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
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        self._mgr.wait_until_finished()
        if extra is not None:
            # sidecar metadata (epoch, val metrics) next to the step dir
            with open(os.path.join(self.directory, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target_state: Any, step: Optional[int] = None) -> Tuple[Any, Optional[dict]]:
        """Restore onto the structure/shardings of `target_state`."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": target_state})
        )
        extra = None
        sidecar = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                extra = json.load(f)
        return restored["state"], extra

    def close(self):
        self._mgr.close()
