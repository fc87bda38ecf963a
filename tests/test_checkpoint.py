"""Checkpoint retention: best (pinned) checkpoints must survive max_to_keep
GC. The reference keeps every per-epoch folder (trainer.py:783-805) so the
best-val weights always survive the run; our rolling retention must exempt
best saves (VERDICT r3 weak #3)."""

import jax.numpy as jnp
import numpy as np

from baseboostdepth_tpu.training.checkpoint import CheckpointManager


def _state(v):
    return {"w": jnp.full((4,), float(v)), "step": jnp.asarray(v)}


def test_best_checkpoint_survives_gc(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=3)
    # best at step 2, then 7 later periodic saves
    mgr.save(1, _state(1), {"epoch": 0})
    mgr.save(2, _state(2), {"epoch": 0, "best": True, "abs_rel": 0.1})
    for s in range(3, 10):
        mgr.save(s, _state(s), {"epoch": s // 3})
    steps = mgr.all_steps()
    assert 2 in steps, "pinned best checkpoint was garbage-collected"
    # rolling window holds the newest 3 unpinned
    assert [s for s in steps if s != 2] == [7, 8, 9]
    restored, extra = mgr.restore(_state(0), step=2)
    assert float(np.asarray(restored["w"])[0]) == 2.0
    assert extra["best"] is True and extra["pin"] is True
    # latest_step still resumes from the newest save
    assert mgr.latest_step() == 9
    mgr.close()


def test_pins_persist_across_restart(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    mgr.save(1, _state(1), {"best": True, "abs_rel": 0.2})
    mgr.save(2, _state(2), {})
    mgr.close()
    # new process: pin set must be rebuilt from sidecars
    mgr2 = CheckpointManager(str(tmp_path), max_to_keep=2)
    for s in range(3, 8):
        mgr2.save(s, _state(s), {})
    assert 1 in mgr2.all_steps()
    restored, extra = mgr2.restore(_state(0), step=1)
    assert float(np.asarray(restored["w"])[0]) == 1.0
    mgr2.close()


def test_gc_removes_stale_sidecars(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=1)
    for s in range(1, 4):
        mgr.save(s, _state(s), {"epoch": s})
    assert mgr.all_steps() == [3]
    import glob
    import os

    sidecars = sorted(glob.glob(os.path.join(str(tmp_path), "extra_*.json")))
    assert [os.path.basename(p) for p in sidecars] == ["extra_3.json"]
    mgr.close()
