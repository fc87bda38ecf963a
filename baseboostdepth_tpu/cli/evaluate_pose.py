"""Odometry ATE evaluation entry point (reference evaluate_pose.py).

Usage:
  python -m baseboostdepth_tpu.cli.evaluate_pose --config cfg.json \
      --checkpoint ckpts --sequence 9 --gt_poses /data/odom/poses/09.txt
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    import jax

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.evaluation.pose import evaluate_odometry
    from baseboostdepth_tpu.training.checkpoint import CheckpointManager
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--sequence", type=int, required=True, choices=[9, 10])
    ap.add_argument("--gt_poses", required=True, help="KITTI odometry poses txt")
    ap.add_argument("--skip_frame", type=int, default=2)
    args = ap.parse_args(argv)

    cfg = Config.load(args.config)
    st = StepStatic(
        zoo=cfg.model.zoo, num_layers=cfg.model.num_layers,
        height=cfg.data.height, width=cfg.data.width, dtype=cfg.model.dtype,
    )
    state = init_state(st, make_optimizer(), jax.random.PRNGKey(0))
    state, _ = CheckpointManager(args.checkpoint).restore(state)

    res = evaluate_odometry(
        cfg, state.params, state.stats, args.sequence, args.gt_poses, args.skip_frame
    )
    print(f"\n  Trajectory error (direct):  {res['ate_direct']:.3f}, std {res['ate_direct_std']:.3f}")
    print(f"  Trajectory error (chained): {res['ate_chained']:.3f}, std {res['ate_chained_std']:.3f}\n")


if __name__ == "__main__":
    main(sys.argv[1:])
