"""Calibrate synthetic-scene convergence on TPU: train the method on the
analytic scene and print abs_rel/a1 vs exact GT every eval-interval steps.
Used to pin the thresholds of tests/test_synthetic_convergence.py and to
size tools/synthetic_benchmark.py runs.

  python tools/conv_calibrate.py --steps 600 --height 64 --width 192
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--n-frames", type=int, default=56)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--epoch-stage", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--root", default="/tmp/synth_calib")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    import jax

    from baseboostdepth_tpu.data import kitti
    from baseboostdepth_tpu.data.curriculum import stage_for_epoch
    from baseboostdepth_tpu.data.loader import EvalLoader, KittiTrainLoader
    from baseboostdepth_tpu.data.synthetic import SyntheticScene, materialize_kitti_layout
    from baseboostdepth_tpu.evaluation.metrics import METRIC_NAMES, single_image_errors
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import (
        StepStatic, init_state, make_eval_forward, make_train_step,
    )
    import cv2

    H, W = args.height, args.width
    marker = os.path.join(args.root, f".done_{args.n_frames}_{W}x{H}")
    if not os.path.exists(marker):
        materialize_kitti_layout(
            args.root, n_frames=args.n_frames, width=W, height=H, seed=0,
            margin=7, val_fraction=0.2, scene=SyntheticScene(seed=0),
        )
        open(marker, "w").close()
    split = os.path.join(args.root, "splits", "synth")
    index = kitti.KittiRawIndex(args.root, os.path.join(split, "train_files_baselines.txt"))
    val_index = kitti.KittiRawIndex(args.root, os.path.join(split, "val_files.txt"))
    val_paths = [val_index.image_path(s.folder, s.frame_index, s.side) for s in val_index.samples]
    gt = np.load(os.path.join(split, "gt_depths.npz"))["data"]

    stage = stage_for_epoch(args.epoch_stage, trimin=True)
    st = StepStatic(
        zoo="md2", num_layers=18, height=H, width=W, F=stage.F, scales=(0, 1),
        trimin=True, incremental=stage.incremental_active,
        partial=stage.incremental_active, decomp=True, dtype=args.dtype,
    )
    opt = make_optimizer(learning_rate=args.lr, steps_per_epoch=10**6)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    step_fn = make_train_step(st, opt)
    eval_fn = make_eval_forward(st)

    def evaluate(state):
        totals = np.zeros(len(METRIC_NAMES))
        n = 0
        for imgs, start, cnt in EvalLoader(val_paths, H, W, batch_size=4):
            depth = np.asarray(jax.device_get(
                eval_fn(state.params, state.stats, imgs.astype(np.float32) / 255.0)
            ))
            for j in range(cnt):
                g = gt[start + j]
                pred = cv2.resize(depth[j], (g.shape[1], g.shape[0]))
                totals += np.array(single_image_errors(pred, g))
                n += 1
        return dict(zip(METRIC_NAMES, totals / n))

    m = evaluate(state)
    print(f"step 0: abs_rel {m['abs_rel']:.4f} a1 {m['a1']:.4f}")

    rng = np.random.default_rng(0)
    step = 0
    t0 = time.time()
    loss_hist = []
    while step < args.steps:
        loader = KittiTrainLoader(
            index, stage, batch_size=args.batch, height=H, width=W,
            trimin=True, use_stereo=True, num_workers=4,
            seed=int(rng.integers(2**31)), use_native=False,
        )
        for batch in loader:
            batch = jax.tree.map(jax.numpy.asarray, batch)
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(int(rng.integers(2**31))))
            loss_hist.append(float(metrics["loss"]))
            step += 1
            if step % args.eval_every == 0:
                m = evaluate(state)
                print(
                    f"step {step}: loss {np.mean(loss_hist[-20:]):.4f} "
                    f"abs_rel {m['abs_rel']:.4f} a1 {m['a1']:.4f} "
                    f"({(time.time()-t0)/step*1e3:.0f} ms/step)"
                )
            if step >= args.steps:
                break
    print("done in", round(time.time() - t0, 1), "s")


if __name__ == "__main__":
    main()
