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

Pretrained-START validation (day-1 runbook, NO KITTI needed): feed the raw
ImageNet-style encoder init the reference auto-loads -- mpvit_small.pth
(networksvit/mpvit.py:809-821), hrnetv2_w18 ImageNet weights
(networksDIFF/test_hr_encoder.py:500-547), or a torchvision resnet .pth --
and validate the importer on the real bytes the first minutes egress is
available:

  python tools/verify_reference_parity.py --zoo monovit \
      --pretrained_start ckpt/mpvit_small.pth [--pose_weights resnet18.pth]
  python tools/verify_reference_parity.py --zoo diffnet \
      --pretrained_start hrnetv2_w18_imagenet_pretrained.pth

monovit additionally gets forward parity against the reference-faithful
torch replica (tests/torch_mpvit_ref.py) loaded with the SAME bytes; all
zoos get key-coverage reporting + a finite-forward check.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def verify_pretrained_start(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.models.torch_import import (
        load_pretrained_encoder, load_torch_state_dict,
    )
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state
    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    st = StepStatic(
        zoo=args.zoo, num_layers=args.num_layers,
        height=args.height, width=args.width, dtype="float32",
    )
    state = init_state(st, make_optimizer(), jax.random.PRNGKey(0))
    sd = load_torch_state_dict(args.pretrained_start)
    print(f"{args.pretrained_start}: {len(sd)} tensors")

    resnet_backed = args.zoo in ("md2", "sql", "sql_large", "cadepth")
    pose_path = args.pose_weights or (args.pretrained_start if resnet_backed else None)
    state = load_pretrained_encoder(
        state, args.pretrained_start, args.zoo, pose_path=pose_path
    )
    print("importer: encoder merged into the flax tree (shape-checked)"
          + ("" if pose_path else "; pose encoder SKIPPED (pass a resnet18 "
             ".pth via --pose_weights to cover it)"))

    # key coverage against the reference-faithful replica layout
    import torch

    replica = None
    if args.zoo == "monovit":
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from tests.torch_mpvit_ref import mpvit_small

        replica = mpvit_small()
    elif args.zoo == "diffnet":
        from tests.torch_zoo_refs import make_hrnet18

        replica = make_hrnet18()
    if replica is not None:
        res = replica.load_state_dict(
            {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
        )
        missing = [k for k in res.missing_keys if "num_batches" not in k]
        print(f"replica coverage: {len(sd) - len(res.unexpected_keys)}/{len(sd)} "
              f"file tensors consumed; {len(missing)} replica keys missing "
              f"(left at random init)")
        if missing:
            print("  missing:", missing[:10], "..." if len(missing) > 10 else "")
        if len(missing) > 0.05 * len(sd):
            print("FAIL: >5% of the architecture has no weights in this file")
            sys.exit(1)

    # finite-forward check on the imported encoder (full depth net forward;
    # decoder is random init, we only assert finiteness + feature scale)
    from baseboostdepth_tpu.training.step import build_networks

    depth_net, _ = build_networks(st)
    rng = np.random.default_rng(0)
    x = rng.random((2, args.height, args.width, 3)).astype(np.float32)
    disps = depth_net.apply(
        {"params": state.params["depth"], "batch_stats": state.stats["depth"]},
        jnp.asarray(x), train=False,
    )
    for i, d in enumerate(disps):
        assert np.isfinite(np.asarray(d)).all(), f"non-finite disp at scale {i}"
    print("forward: finite disparities at all scales")

    # monovit: full encoder forward parity against the torch replica running
    # the SAME real bytes (the strongest no-KITTI check available)
    if args.zoo == "monovit":
        from baseboostdepth_tpu.models.monovit import MPViT
        from baseboostdepth_tpu.models.torch_import import mpvit_torch_to_flax

        params, bstats = mpvit_torch_to_flax(sd)
        replica.eval()
        with torch.no_grad():
            t_outs = replica(torch.from_numpy(x).permute(0, 3, 1, 2).contiguous())
        f_outs = MPViT().apply(
            {"params": params, "batch_stats": bstats}, jnp.asarray(x), train=False
        )
        worst = 0.0
        for i, (t, f) in enumerate(zip(t_outs, f_outs)):
            t_np = t.permute(0, 2, 3, 1).numpy()
            err = np.abs(t_np - np.asarray(f)).max() / (np.abs(t_np).max() + 1e-6)
            worst = max(worst, err)
            print(f"  feature {i}: rel err {err:.2e}")
        status = "PASS" if worst < 1e-3 else "FAIL"
        print(f"{status}: monovit encoder forward parity on real bytes "
              f"(worst rel err {worst:.2e}, tol 1e-3)")
        sys.exit(0 if worst < 1e-3 else 1)
    print("PASS")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", help="reference weights_* folder")
    ap.add_argument("--pretrained_start", default=None,
                    help="raw encoder init .pth (mpvit_small / hrnetv2_w18 / "
                    "torchvision resnet): validate the importer on real "
                    "bytes without KITTI")
    ap.add_argument("--pose_weights", default=None,
                    help="resnet18 .pth for the pose encoder (defaults to "
                    "--pretrained_start for resnet-backed zoos)")
    ap.add_argument("--kt_path", default=None)
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

    if args.pretrained_start:
        verify_pretrained_start(args)
        return
    if not args.weights or not args.kt_path:
        ap.error("--weights and --kt_path are required (or use --pretrained_start)")

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
