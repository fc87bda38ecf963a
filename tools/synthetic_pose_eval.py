"""Pose-accuracy evidence: run the REAL odometry evaluator (parity with
/root/reference/evaluate_pose.py) over a synthetic-scene sequence with
exact GT poses, using a trained checkpoint from tools/synthetic_benchmark.py.

  python tools/synthetic_pose_eval.py --ckpt logs/synth_bench_bfloat16/checkpoints

Reports the SfMLearner-protocol ATE for both the direct 2-frame pose and
the chained (step-composed) pose -- the two estimates the reference's
evaluate_pose.py compares.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="logs/synth_bench_bfloat16/checkpoints")
    ap.add_argument("--root", default="logs/synth_odom")
    ap.add_argument("--n-frames", type=int, default=80)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--untrained", action="store_true",
                    help="baseline: freshly initialized pose net")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    import jax

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.data.synthetic import SyntheticScene, materialize_odometry_layout
    from baseboostdepth_tpu.evaluation.pose import evaluate_odometry

    marker = os.path.join(args.root, f".done_{args.n_frames}_{args.width}x{args.height}")
    if not os.path.exists(marker):
        materialize_odometry_layout(
            args.root, n_frames=args.n_frames, width=args.width,
            height=args.height, scene=SyntheticScene(seed=0),
        )
        open(marker, "w").close()
    gt_path = os.path.join(args.root, "poses", "09.txt")

    cfg = Config()
    cfg.data.kt_path = args.root
    cfg.data.splits_dir = os.path.join(args.root, "splits")
    cfg.data.height, cfg.data.width = args.height, args.width

    if args.untrained:
        import optax

        from baseboostdepth_tpu.training.step import StepStatic, init_state

        st = StepStatic(zoo="md2", height=args.height, width=args.width)
        state = init_state(st, optax.adam(1e-4), jax.random.PRNGKey(0))
        params, stats = state.params, state.stats
    else:
        import optax

        from baseboostdepth_tpu.training.checkpoint import CheckpointManager
        from baseboostdepth_tpu.training.optim import make_optimizer
        from baseboostdepth_tpu.training.step import StepStatic, init_state

        st = StepStatic(zoo="md2", height=args.height, width=args.width)
        state = init_state(st, make_optimizer(steps_per_epoch=100), jax.random.PRNGKey(0))
        ckpt = CheckpointManager(args.ckpt)
        step = ckpt.latest_step()
        assert step is not None, f"no checkpoint under {args.ckpt}"
        state, _ = ckpt.restore(state, step)
        print(f"restored step {step} from {args.ckpt}")
        params, stats = state.params, state.stats

    res = evaluate_odometry(cfg, params, stats, 9, gt_path)
    tag = "untrained" if args.untrained else "trained"
    print(f"[{tag}] ate_direct {res['ate_direct']:.4f} +- {res['ate_direct_std']:.4f} | "
          f"ate_chained {res['ate_chained']:.4f} +- {res['ate_chained_std']:.4f} "
          f"(units; 1 unit ~ 5.4 m)")


if __name__ == "__main__":
    main()
