"""End-to-end accuracy evidence on CPU: training on the analytic synthetic
scene must drive depth abs_rel (vs exact GT) down, not just the photometric
loss. This is the CI-able slice of tools/synthetic_benchmark.py (which runs
the full two-stage method on TPU); reference counterpart: online val with
best-abs_rel tracking (/root/reference/trainer.py:623-665).
"""

import os

import numpy as np
import jax
import pytest

from baseboostdepth_tpu.data import kitti
from baseboostdepth_tpu.data.curriculum import stage_for_epoch
from baseboostdepth_tpu.data.loader import KittiTrainLoader
from baseboostdepth_tpu.data.synthetic import SyntheticScene, materialize_kitti_layout
from baseboostdepth_tpu.evaluation.metrics import METRIC_NAMES, single_image_errors
from baseboostdepth_tpu.training.optim import make_optimizer
from baseboostdepth_tpu.training.step import (
    StepStatic,
    init_state,
    make_eval_forward,
    make_train_step,
)

H, W = 64, 192


def _abs_rel(st, state, paths, gt, height, width):
    import cv2

    from baseboostdepth_tpu.data.loader import EvalLoader

    fwd = make_eval_forward(st)
    totals = np.zeros(len(METRIC_NAMES))
    n = 0
    for imgs, start, cnt in EvalLoader(paths, height, width, batch_size=4):
        depth = np.asarray(
            jax.device_get(fwd(state.params, state.stats, imgs.astype(np.float32) / 255.0))
        )
        for j in range(cnt):
            g = gt[start + j]
            pred = cv2.resize(depth[j], (g.shape[1], g.shape[0]))
            totals += np.array(single_image_errors(pred, g))
            n += 1
    return dict(zip(METRIC_NAMES, totals / n))


@pytest.mark.slow
def test_training_reduces_abs_rel_on_synthetic_gt(tmp_path):
    root, splits_dir = materialize_kitti_layout(
        str(tmp_path), n_frames=56, width=W, height=H, seed=0, margin=7,
        val_fraction=0.2, scene=SyntheticScene(seed=0),
    )
    split = os.path.join(splits_dir, "synth")
    index = kitti.KittiRawIndex(root, os.path.join(split, "train_files_baselines.txt"))
    val_index = kitti.KittiRawIndex(root, os.path.join(split, "val_files.txt"))
    val_paths = [
        val_index.image_path(s.folder, s.frame_index, s.side) for s in val_index.samples
    ]
    gt = np.load(os.path.join(split, "gt_depths.npz"))["data"]

    # epoch-8 stage: F=2, cutoff 0.42 -> with the scene's ~0.15/frame motion
    # every sample trains with temporal +-2 AND the stereo pair. Recipe
    # calibrated on this exact setup (B=12, lr 1e-4): depth escapes the
    # constant-depth plateau by step ~75 and sits at abs_rel ~0.32 / a1
    # ~0.54 by step 100 (lr 5e-4 collapses to constant depth and never
    # escapes -- the constant-prediction plateau is INVARIANT under the
    # median-scaled metric, so a frozen abs_rel means a flat depth map).
    stage = stage_for_epoch(8, trimin=True)
    st = StepStatic(
        zoo="md2", num_layers=18, height=H, width=W, F=stage.F, scales=(0, 1),
        trimin=True, incremental=False, partial=False, decomp=True,
    )
    opt = make_optimizer(learning_rate=1e-4, steps_per_epoch=10**6)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    step_fn = make_train_step(st, opt)

    init_m = _abs_rel(st, state, val_paths, gt, H, W)

    losses = []
    rng = np.random.default_rng(0)
    n_steps, B = 100, 12
    while len(losses) < n_steps:
        loader = KittiTrainLoader(
            index, stage, batch_size=B, height=H, width=W, trimin=True,
            use_stereo=True, num_workers=2,
            seed=int(rng.integers(2**31)), use_native=False,
        )
        for batch in loader:
            batch = jax.tree.map(jax.numpy.asarray, batch)
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(int(rng.integers(2**31))))
            losses.append(float(metrics["loss"]))
            if len(losses) >= n_steps:
                break

    final_m = _abs_rel(st, state, val_paths, gt, H, W)
    print(f"\nsteps={len(losses)} loss {losses[0]:.4f}->{np.mean(losses[-5:]):.4f} "
          f"abs_rel {init_m['abs_rel']:.4f}->{final_m['abs_rel']:.4f} "
          f"a1 {init_m['a1']:.4f}->{final_m['a1']:.4f}")

    assert np.mean(losses[-5:]) < 0.6 * losses[0], losses
    # the real evidence: depth accuracy against exact GT improves materially
    # (measured 0.663 -> 0.316 at step 100; generous margins below)
    assert final_m["abs_rel"] < 0.75 * init_m["abs_rel"], (init_m, final_m)
    assert final_m["a1"] > init_m["a1"] + 0.15, (init_m, final_m)
    assert final_m["abs_rel"] < 0.45, final_m
