"""Quantitative accuracy benchmark on the analytic synthetic scene.

Trains the full BaseBoostDepth method (both curriculum stages) on a
procedurally generated, exactly multi-view-consistent driving scene
(data/synthetic.py) through the REAL pipeline -- KittiRawIndex, curriculum
loader, Trainer -- then evaluates abs_rel/a1 against the scene's analytic
ground-truth depth. No KITTI data exists on this machine; this is the
framework's stand-in convergence evidence toward the BASELINE.json targets
(Abs_Rel <= 0.106 / a1 >= 0.883 on real KITTI).

Usage (TPU; ~10 min rendering once + training):
  python tools/synthetic_benchmark.py --dtype bfloat16
  python tools/synthetic_benchmark.py --dtype float32    # precision ablation

Results land in logs/synth_bench_<dtype>/result.json and are summarized in
ROADMAP.md's accuracy-evidence table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_scene(root: str, n_frames: int, width: int, height: int, seed: int):
    """Render (or reuse) the scene in KITTI layout under root."""
    marker = os.path.join(root, f".done_{n_frames}_{width}x{height}_{seed}")
    if not os.path.exists(marker):
        from baseboostdepth_tpu.data.synthetic import SyntheticScene, materialize_kitti_layout

        t0 = time.time()
        materialize_kitti_layout(
            root, n_frames=n_frames, width=width, height=height, seed=seed,
            scene=SyntheticScene(seed=seed),
        )
        open(marker, "w").close()
        print(f"rendered {n_frames} frames x2 cams in {time.time() - t0:.0f}s")
    return root, os.path.join(root, "splits")


def evaluate(cfg, state, st):
    """abs_rel/a1 & friends of `state` on the synthetic val split (the
    online-val protocol: median scaling + Garg crop, which here keeps the
    lower image band where ground/billboard parallax lives)."""
    import cv2
    import jax

    from baseboostdepth_tpu.data import kitti
    from baseboostdepth_tpu.data.loader import EvalLoader
    from baseboostdepth_tpu.evaluation.metrics import METRIC_NAMES, single_image_errors
    from baseboostdepth_tpu.training.step import make_eval_forward

    split = os.path.join(cfg.data.splits_dir, cfg.data.split)
    val_index = kitti.KittiRawIndex(
        cfg.data.kt_path, os.path.join(split, "val_files.txt")
    )
    paths = [
        val_index.image_path(s.folder, s.frame_index, s.side)
        for s in val_index.samples
    ]
    gt = np.load(os.path.join(split, "gt_depths.npz"))["data"]
    fwd = make_eval_forward(st)
    totals = np.zeros(len(METRIC_NAMES))
    n = 0
    for imgs, start, cnt in EvalLoader(paths, cfg.data.height, cfg.data.width, batch_size=8):
        depth = np.asarray(
            jax.device_get(fwd(state.params, state.stats, imgs.astype(np.float32) / 255.0))
        )
        for j in range(cnt):
            g = gt[start + j]
            pred = cv2.resize(depth[j], (g.shape[1], g.shape[0]))
            totals += np.array(single_image_errors(pred, g))
            n += 1
    return dict(zip(METRIC_NAMES, (totals / max(n, 1)).tolist()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--zoo", default="md2",
                    choices=["md2", "monovit", "sql", "cadepth", "diffnet"],
                    help="depth-network zoo (convergence evidence per zoo)")
    ap.add_argument("--root", default="logs/synth_scene")
    ap.add_argument("--n-frames", type=int, default=420)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--switch-epoch", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--disp-bias", type=float, default=None,
                    help="cold-start disparity-head bias (method.disp_init_bias)")
    ap.add_argument("--pose-scale", type=float, default=1.0,
                    help="model.pose_input_scale (perf mode; quantify here)")
    ap.add_argument("--no-bucket", action="store_true",
                    help="disable f_max bucketing (data.bucket_fs=()); A/B "
                    "the default-on bucketed loader's accuracy impact")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.data.curriculum import stage_for_epoch
    from baseboostdepth_tpu.training.trainer import Trainer

    scene_root = args.root if args.seed == 0 else f"{args.root}_seed{args.seed}"
    data_path, splits_dir = ensure_scene(
        scene_root, args.n_frames, args.width, args.height, args.seed
    )

    cfg = Config()
    cfg.model.zoo = args.zoo
    cfg.model.dtype = args.dtype
    cfg.data.kt_path = data_path
    cfg.data.splits_dir = splits_dir
    cfg.data.split = "synth"
    cfg.data.height, cfg.data.width = args.height, args.width
    cfg.optim.batch_size = args.batch_size
    cfg.optim.num_epochs = args.epochs
    # compress the 20-epoch schedule: milestones scale with the epoch count
    scale = args.epochs / 20.0
    cfg.optim.lr_milestones = tuple(
        sorted({max(1, round(m * scale)) for m in cfg.optim.lr_milestones})
    )
    cfg.method.curriculum_switch_epoch = args.switch_epoch
    cfg.method.disp_init_bias = args.disp_bias
    cfg.model.pose_input_scale = args.pose_scale
    if args.no_bucket:
        cfg.data.bucket_fs = ()
    suffix = "" if args.zoo == "md2" else f"_{args.zoo}"
    suffix += "" if args.disp_bias is None else f"_bias{args.disp_bias}"
    if args.pose_scale != 1.0:
        suffix += f"_ps{args.pose_scale}"
    if args.no_bucket:
        suffix += "_nobucket"
    if args.seed != 0:
        suffix += f"_seed{args.seed}"
    cfg.log.model_name = f"synth_bench_{args.dtype}{suffix}"
    cfg.log.log_frequency = 10**9  # no online val; we evaluate at the end
    cfg.seed = args.seed

    t0 = time.time()
    tr = Trainer(cfg)
    st0 = tr._static_for_stage(stage_for_epoch(0, cfg.method.trimin))
    init_metrics = evaluate(cfg, tr.state, st0)
    print("init:", {k: round(v, 4) for k, v in init_metrics.items()})
    tr.train()
    st = tr._static_for_stage(
        stage_for_epoch(args.epochs - 1, cfg.method.trimin, args.switch_epoch)
    )
    final_metrics = evaluate(cfg, tr.state, st)
    wall = time.time() - t0
    print("final:", {k: round(v, 4) for k, v in final_metrics.items()})

    out = {
        "dtype": args.dtype,
        "zoo": args.zoo,
        "disp_bias": args.disp_bias,
        "pose_input_scale": args.pose_scale,
        "bucket_fs": list(cfg.data.bucket_fs),
        "epochs": args.epochs,
        "n_frames": args.n_frames,
        "resolution": [args.height, args.width],
        "wall_s": round(wall, 1),
        "init": init_metrics,
        "final": final_metrics,
    }
    path = os.path.join(tr.log_path, "result.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
