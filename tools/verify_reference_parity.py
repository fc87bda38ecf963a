"""Checkpoint-parity protocol: import a published reference checkpoint and
reproduce its KITTI eigen metrics through our evaluation path.

This is the acceptance test SURVEY.md section 7 calls for ("import weights
-> assert metric parity ~0.001"); it needs the reference's pretrained
folder (encoder.pth/depth.pth/...) and KITTI raw + gt_depths.npz, so it
runs on demand rather than in CI.

Usage:
  python tools/verify_reference_parity.py \
      --weights /path/to/weights_folder --kt_path /data/KITTI_RAW \
      --splits_dir splits [--expected_abs_rel 0.106]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="reference weights_* folder")
    ap.add_argument("--kt_path", required=True)
    ap.add_argument("--splits_dir", default="splits")
    ap.add_argument("--split", default="eigen")
    ap.add_argument(
        "--zoo", default="md2",
        choices=["md2", "monovit", "sql", "sql_large", "cadepth", "diffnet"],
    )
    ap.add_argument("--num_layers", type=int, default=18)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--expected_abs_rel", type=float, default=None)
    ap.add_argument("--tolerance", type=float, default=0.002)
    args = ap.parse_args()

    import jax

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.evaluation.depth import evaluate_kitti, print_metrics
    from baseboostdepth_tpu.models.torch_import import IMPORTERS
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state
    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    cfg = Config()
    cfg.data.kt_path = args.kt_path
    cfg.data.splits_dir = args.splits_dir
    cfg.data.height = args.height
    cfg.data.width = args.width
    cfg.model.zoo = args.zoo
    cfg.model.num_layers = args.num_layers
    cfg.model.dtype = "float32"  # bit-parity evaluation

    st = StepStatic(
        zoo=args.zoo, num_layers=args.num_layers,
        height=args.height, width=args.width, dtype="float32",
    )
    state = init_state(st, make_optimizer(), jax.random.PRNGKey(0))

    print(f"importing reference checkpoint from {args.weights}")
    params, stats = IMPORTERS[args.zoo](args.weights)
    from baseboostdepth_tpu.models.torch_import import _merge

    merged_params = _merge(state.params, params)
    merged_stats = _merge(state.stats, stats)

    result = evaluate_kitti(cfg, merged_params, merged_stats, eval_split=args.split)
    print_metrics(result)

    if args.expected_abs_rel is not None:
        diff = abs(result["abs_rel"] - args.expected_abs_rel)
        status = "PASS" if diff <= args.tolerance else "FAIL"
        print(f"{status}: abs_rel {result['abs_rel']:.4f} vs expected "
              f"{args.expected_abs_rel:.4f} (|diff| {diff:.4f}, tol {args.tolerance})")
        sys.exit(0 if diff <= args.tolerance else 1)


if __name__ == "__main__":
    main()
