"""Day-1 data runbook: validate a KITTI tree + splits + exported GT in
minutes, before burning hours on a training run.

Checks, in order (each prints PASS/FAIL/SKIP and the tool exits non-zero on
any FAIL):
  1. splits resolve and parse (train/val lists, baseline column)
  2. KITTI image tree: sampled existence of train/val frames + stereo pairs
  3. intrinsics/resolution sanity on a decoded image
  4. exported GT depths present and aligned with the val list
  5. one real train batch loads through the production loader
  6. one train step compiles and runs finite (same step the Trainer jits)
  7. a 10-image eval through the metric path returns finite numbers

Replaces the reference's implicit setup ritual (README.md:15-30: download
KITTI, export_gt_depth.py, then hope) with an explicit gate.

Usage:
  python tools/preflight.py --kt_path /data/kitti_raw [--splits_dir splits]
      [--split eigen_zhou] [--quick]   # --quick skips the device checks
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def check(name, fn, skip=False):
    if skip:
        print(f"SKIP  {name}")
        return None
    try:
        out = fn()
        print(f"PASS  {name}" + (f"  ({out})" if isinstance(out, str) else ""))
        return out
    except Exception as e:
        print(f"FAIL  {name}: {type(e).__name__}: {e}")
        FAILURES.append(name)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kt_path", required=True)
    ap.add_argument("--splits_dir", default="splits")
    ap.add_argument("--split", default="eigen_zhou")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--png", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="host-side checks only (no jit/compile)")
    ap.add_argument("--sample", type=int, default=200,
                    help="existence-check sample size per list")
    args = ap.parse_args()

    import numpy as np

    from baseboostdepth_tpu.data import kitti
    from baseboostdepth_tpu.utils import readlines, resolve_splits_dir

    splits_dir = resolve_splits_dir(args.splits_dir)
    split_dir = os.path.join(splits_dir, args.split)
    ext = ".png" if args.png else ".jpg"

    # 1. splits ------------------------------------------------------------
    def parse_splits():
        train_file = os.path.join(split_dir, "train_files_baselines.txt")
        if not os.path.exists(train_file):
            train_file = os.path.join(split_dir, "train_files.txt")
        train = readlines(train_file)
        val = readlines(os.path.join(split_dir, "val_files.txt"))
        has_baseline = len(train[0].split()) == 5
        if has_baseline:
            bs = [float(ln.split()[4]) for ln in train[:1000]]
            assert min(bs) > 0, "non-positive baseline entries"
        return f"{len(train)} train / {len(val)} val, baselines={has_baseline}"

    check("splits parse", parse_splits)

    train_file = os.path.join(split_dir, "train_files_baselines.txt")
    if not os.path.exists(train_file):
        train_file = os.path.join(split_dir, "train_files.txt")
    index = kitti.KittiRawIndex(args.kt_path, train_file, ext)

    # 2. image tree --------------------------------------------------------
    def existence():
        n = len(index)
        sel = np.linspace(0, n - 1, min(args.sample, n)).astype(int)
        missing = []
        for i in sel:
            s = index.samples[int(i)]
            p = index.image_path(s.folder, s.frame_index, s.side)
            if not os.path.exists(p):
                missing.append(p)
            ps = index.image_path(s.folder, s.frame_index, kitti.OTHER_SIDE[s.side])
            if not os.path.exists(ps):
                missing.append(ps)
        assert not missing, f"{len(missing)} missing, e.g. {missing[:2]}"
        return f"{2 * len(sel)} files sampled"

    check("KITTI image tree", existence)

    # 3. decode sanity -----------------------------------------------------
    def decode():
        from baseboostdepth_tpu.data.loader import load_resized

        s = index.samples[0]
        img = load_resized(
            index.image_path(s.folder, s.frame_index, s.side), args.width, args.height
        )
        assert img.shape == (args.height, args.width, 3), img.shape
        assert img.std() > 1.0, "image looks blank"
        return f"shape {img.shape}"

    check("image decode+resize", decode)

    # 4. exported GT -------------------------------------------------------
    gt_file = os.path.join(split_dir, "gt_depths.npz")

    def gt():
        assert os.path.exists(gt_file), (
            f"{gt_file} missing -- run python -m baseboostdepth_tpu.cli.export_gt "
            f"--split {args.split} --kt_path {args.kt_path} --val"
        )
        data = np.load(gt_file, fix_imports=True, encoding="latin1",
                       allow_pickle=True)["data"]
        val = readlines(os.path.join(split_dir, "val_files.txt"))
        assert len(data) == len(val), (len(data), len(val))
        d0 = data[0]
        assert d0.ndim == 2 and (d0 > 0).sum() > 100, "GT depth 0 looks empty"
        return f"{len(data)} GT maps"

    check("exported GT depths", gt)

    # 5-7. device path -----------------------------------------------------
    if args.quick:
        for name in ("train batch", "train step", "10-image eval"):
            check(name, lambda: None, skip=True)
    else:
        from baseboostdepth_tpu.utils.jax_setup import setup_jax

        setup_jax()
        import jax

        from baseboostdepth_tpu.data.curriculum import stage_for_epoch
        from baseboostdepth_tpu.data.loader import EvalLoader, KittiTrainLoader
        from baseboostdepth_tpu.training.optim import make_optimizer
        from baseboostdepth_tpu.training.step import (
            StepStatic, init_state, make_train_step,
        )

        stage = stage_for_epoch(0, trimin=True)
        batch_holder = {}

        def one_batch():
            loader = KittiTrainLoader(
                index, stage, args.batch_size, args.height, args.width,
                trimin=True, use_stereo=True, num_workers=4, seed=0,
            )
            batch_holder["b"] = next(iter(loader))
            return f"frames {batch_holder['b']['frames'].shape}"

        check("train batch", one_batch)

        def one_step():
            st = StepStatic(
                zoo="md2", height=args.height, width=args.width,
                F=stage.F, scales=tuple(stage.scales), trimin=True,
                decomp=True, dtype="bfloat16",
            )
            opt = make_optimizer(steps_per_epoch=100)
            state = init_state(st, opt, jax.random.PRNGKey(0))
            fn = make_train_step(st, opt)
            state, metrics = fn(state, batch_holder["b"], jax.random.PRNGKey(1))
            loss = float(metrics["loss"])
            assert np.isfinite(loss), loss
            return f"loss {loss:.4f}"

        check("train step", one_step, skip="b" not in batch_holder)

        def small_eval():
            from baseboostdepth_tpu.evaluation.metrics import single_image_errors
            from baseboostdepth_tpu.training.step import StepStatic, make_eval_forward

            data = np.load(gt_file, fix_imports=True, encoding="latin1",
                           allow_pickle=True)["data"]
            val_index = kitti.KittiRawIndex(
                args.kt_path, os.path.join(split_dir, "val_files.txt"), ext
            )
            paths = [
                val_index.image_path(s.folder, s.frame_index, s.side)
                for s in val_index.samples[:10]
            ]
            st = StepStatic(zoo="md2", height=args.height, width=args.width)
            opt = make_optimizer(steps_per_epoch=100)
            state = init_state(st, opt, jax.random.PRNGKey(0))
            fwd = make_eval_forward(st)
            import cv2

            errs = []
            for imgs, start, n in EvalLoader(paths, args.height, args.width, 10):
                depth = np.asarray(jax.device_get(
                    fwd(state.params, state.stats, imgs.astype(np.float32) / 255.0)
                ))
                for j in range(n):
                    gt_d = data[start + j]
                    pred = cv2.resize(depth[j], (gt_d.shape[1], gt_d.shape[0]))
                    errs.append(single_image_errors(pred, gt_d))
            m = np.mean(np.asarray(errs), axis=0)
            assert np.all(np.isfinite(m)), m
            return f"abs_rel {m[0]:.3f} (untrained net -- finiteness check only)"

        check("10-image eval", small_eval, skip=os.path.exists(gt_file) is False)

    print()
    if FAILURES:
        print(f"preflight FAILED: {FAILURES}")
        sys.exit(1)
    print("preflight OK -- ready to train")


if __name__ == "__main__":
    main()
