"""Checkpointing via Orbax.

The reference saves one .pth per model + adam.pth per epoch folder and
infers the resume epoch from the folder name (trainer.py:783-829) -- every
epoch folder survives the whole run, so the best-val checkpoint is always
restorable. Here a single Orbax CheckpointManager owns (TrainState, config
dict, epoch): atomic, async-capable, step-indexed, restorable onto any mesh.

Retention: periodic saves are rolled (newest `max_to_keep` kept) but saves
marked ``pinned=True`` (best-abs_rel checkpoints) are exempt from GC, so a
best checkpoint from epoch 12 survives arbitrarily many later periodic
saves. Pins persist across restarts via the ``extra_{step}.json`` sidecars
(``"pin": true``). GC is performed in this wrapper (Orbax max_to_keep=None)
so the policy is explicit and unit-testable.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None, create=True, enable_async_checkpointing=False
            ),
        )
        self._pinned = self._scan_pinned()

    def _scan_pinned(self) -> set:
        pinned = set()
        for path in glob.glob(os.path.join(self.directory, "extra_*.json")):
            m = re.match(r"extra_(\d+)\.json$", os.path.basename(path))
            if not m:
                continue
            try:
                with open(path) as f:
                    extra = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            if extra.get("pin") or extra.get("best"):
                pinned.add(int(m.group(1)))
        return pinned

    def save(self, step: int, state: Any, extra: Optional[dict] = None,
             pinned: bool = False) -> None:
        if pinned or (extra or {}).get("best"):
            self._pinned.add(step)
            extra = dict(extra or {}, pin=True)
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        self._mgr.wait_until_finished()
        if extra is not None:
            # sidecar metadata (epoch, val metrics) next to the step dir
            with open(os.path.join(self.directory, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)
        self._gc()

    def _gc(self) -> None:
        """Delete the oldest unpinned steps beyond max_to_keep."""
        if self.max_to_keep is None:
            return
        steps = sorted(self._mgr.all_steps())
        unpinned = [s for s in steps if s not in self._pinned]
        for s in unpinned[: max(0, len(unpinned) - self.max_to_keep)]:
            self._mgr.delete(s)
            sidecar = os.path.join(self.directory, f"extra_{s}.json")
            if os.path.exists(sidecar):
                os.remove(sidecar)

    def all_steps(self):
        return sorted(self._mgr.all_steps())

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
