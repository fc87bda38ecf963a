"""Depth evaluation entry point (reference evaluate_depth.py).

Usage:
  python -m baseboostdepth_tpu.cli.evaluate_depth --config cfg.json \
      --checkpoint logs/bbd_tpu/checkpoints [--split eigen] [--stereo true]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    import jax

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.evaluation.depth import evaluate_kitti, print_metrics
    from baseboostdepth_tpu.evaluation.syns import evaluate_syns
    from baseboostdepth_tpu.training.checkpoint import CheckpointManager
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--split", default="eigen",
                    choices=["eigen", "eigen_benchmark", "benchmark", "SYNS"])
    ap.add_argument("--stereo", action="store_true")
    ap.add_argument("--post_process", action="store_true")
    ap.add_argument("--chamfer", action="store_true")
    ap.add_argument("--save_pred_disps", default=None)
    ap.add_argument("--ext_disp_to_eval", default=None,
                    help="evaluate a saved .npy disparity stack instead of a model")
    args = ap.parse_args(argv)

    cfg = Config.load(args.config)

    if args.ext_disp_to_eval:
        # metric loop only, over precomputed disparities (reference
        # evaluate_depth.py --ext_disp_to_eval)
        import os

        import numpy as np

        from baseboostdepth_tpu.evaluation import metrics as M

        disps = np.load(args.ext_disp_to_eval)
        from baseboostdepth_tpu.utils import resolve_splits_dir

        gt = np.load(
            os.path.join(resolve_splits_dir(cfg.data.splits_dir), args.split, "gt_depths.npz"),
            fix_imports=True, encoding="latin1", allow_pickle=True,
        )["data"]
        protocol = M.EvalProtocol.stereo() if args.stereo else M.EvalProtocol.mono()
        # same input interpretation as the live eval (SQL saves metric depth,
        # not disparity), so scoring a --save_pred_disps file reproduces the
        # live run bit-for-bit
        from baseboostdepth_tpu.models import DEPTH_IS_METRIC

        protocol.disp_input = cfg.model.zoo not in DEPTH_IS_METRIC
        mean_errors, ratios = M.evaluate_disparities(disps, list(gt), protocol)
        result = dict(zip(M.METRIC_NAMES, mean_errors.tolist()))
        if len(ratios):
            med = np.median(ratios)
            result["median_ratio"] = float(med)
            result["ratio_std"] = float(np.std(ratios / med))
        print_metrics(result)
        for k, v in result.items():
            print(f"{k}: {v:.6f}")
        return

    st = StepStatic(
        zoo=cfg.model.zoo, num_layers=cfg.model.num_layers,
        height=cfg.data.height, width=cfg.data.width, dtype=cfg.model.dtype,
    )
    state = init_state(st, make_optimizer(), jax.random.PRNGKey(0))
    mgr = CheckpointManager(args.checkpoint)
    state, _ = mgr.restore(state)

    if args.split == "SYNS":
        result = evaluate_syns(cfg, state.params, state.stats, chamfer=args.chamfer)
    else:
        result = evaluate_kitti(
            cfg, state.params, state.stats,
            eval_split=args.split, stereo=args.stereo,
            post_process=args.post_process, save_pred_disps=args.save_pred_disps,
        )
    print_metrics(result)
    for k, v in result.items():
        print(f"{k}: {v:.6f}")


if __name__ == "__main__":
    main(sys.argv[1:])
