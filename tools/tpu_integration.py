"""TPU integration check: build a synthetic KITTI-layout dataset at full
resolution and run the real Trainer (loader + device-put + train step + val)
for one short epoch on the actual chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from PIL import Image

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    root = "/tmp/bbd_tpu_integration"
    kt = os.path.join(root, "raw")
    splits = os.path.join(root, "splits", "eigen_zhou")
    logs = os.path.join(root, "logs")
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    n_frames = 140

    if not os.path.exists(splits):
        os.makedirs(splits)
        rng = np.random.default_rng(0)
        for cam in (2, 3):
            d = os.path.join(kt, folder, f"image_0{cam}", "data")
            os.makedirs(d, exist_ok=True)
            base = rng.integers(30, 220, (24, 78, 3), dtype=np.uint8)
            for i in range(n_frames):
                # smooth drifting pattern so photometrics are non-degenerate
                shifted = np.roll(base, i % 13, axis=1)
                img = np.asarray(
                    Image.fromarray(shifted).resize((1242, 375), Image.BILINEAR)
                )
                Image.fromarray(img).save(
                    os.path.join(d, f"{i:010d}.jpg"), quality=92
                )
        train_lines = [f"{folder} {i} l kt 0.08" for i in range(8, 128)]
        with open(os.path.join(splits, "train_files_baselines.txt"), "w") as f:
            f.write("\n".join(train_lines) + "\n")
        val_lines = [f"{folder} {i} l" for i in range(130, 134)]
        with open(os.path.join(splits, "val_files.txt"), "w") as f:
            f.write("\n".join(val_lines) + "\n")
        yy = np.linspace(2, 70, 375)[:, None] * np.ones((1, 1242))
        gt = np.empty(4, dtype=object)
        for i in range(4):
            gt[i] = yy.astype(np.float32)
        np.savez_compressed(os.path.join(splits, "gt_depths.npz"), data=gt)

    cfg = Config()
    cfg.data.kt_path = kt
    cfg.data.splits_dir = os.path.join(root, "splits")
    cfg.optim.batch_size = 12
    cfg.optim.num_epochs = 1
    cfg.log.log_dir = logs
    cfg.log.model_name = "tpu_integration"
    cfg.log.log_frequency = 8  # trigger logging + validation once

    from baseboostdepth_tpu.training.trainer import Trainer

    t0 = time.time()
    tr = Trainer(cfg)
    tr.train()
    print(f"integration run done in {time.time()-t0:.1f}s; "
          f"steps={tr.steps_per_epoch}, best_abs_rel={tr.best_abs_rel:.4f}")


if __name__ == "__main__":
    main()
