"""End-to-end Trainer test: one tiny epoch over a synthetic KITTI fixture on
the 8-device CPU mesh, checkpoint written, loss finite, resume works."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from baseboostdepth_tpu.config import Config


@pytest.fixture(scope="module")
def tiny_kitti(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_e2e")
    data = root / "raw"
    splits = root / "splits" / "eigen_zhou"
    splits.mkdir(parents=True)
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    rng = np.random.default_rng(0)
    for cam in (2, 3):
        d = data / folder / f"image_0{cam}" / "data"
        d.mkdir(parents=True)
        for i in range(16):
            # smooth-ish scene so photometric losses are meaningful
            base = rng.integers(40, 200, (8, 25, 3), dtype=np.uint8)
            img = np.asarray(
                Image.fromarray(base).resize((100, 32), Image.BILINEAR), dtype=np.uint8
            )
            Image.fromarray(img).save(d / f"{i:010d}.jpg")
    lines = [f"{folder} {i} l kt 0.05" for i in range(4, 12)]
    (splits / "train_files_baselines.txt").write_text("\n".join(lines) + "\n")
    # online-validation assets: two val frames + matching GT
    (splits / "val_files.txt").write_text(
        f"{folder} 13 l\n{folder} 14 l\n"
    )
    yy = np.linspace(2, 50, 32)[:, None] * np.ones((1, 100))
    gt = np.empty(2, dtype=object)
    for i in range(2):
        gt[i] = yy.astype(np.float32)
    np.savez_compressed(splits / "gt_depths.npz", data=gt)
    return str(data), str(root / "splits"), str(root / "logs")


def _config(data, splits, logs):
    cfg = Config()
    cfg.data.kt_path = data
    cfg.data.splits_dir = splits
    cfg.data.height = 32
    cfg.data.width = 64
    cfg.data.num_workers = 2
    cfg.model.dtype = "float32"  # CPU test speed
    cfg.optim.batch_size = 8
    cfg.optim.num_epochs = 1
    cfg.log.log_dir = logs
    cfg.log.model_name = "e2e"
    cfg.log.log_frequency = 10000
    return cfg


def test_trainer_one_epoch_and_resume(tiny_kitti):
    from baseboostdepth_tpu.training.trainer import Trainer

    data, splits, logs = tiny_kitti
    cfg = _config(data, splits, logs)
    tr = Trainer(cfg)
    assert tr.steps_per_epoch == 1
    assert tr.gt_depths is not None  # val assets picked up
    tr.train()

    # the online-validation path (eigen_zhou val + median-scaled Garg-crop
    # metrics + best-abs_rel checkpoint, reference trainer.py:623-665)
    st = tr._static_for_stage(
        __import__("baseboostdepth_tpu.data.curriculum", fromlist=["stage_for_epoch"]).stage_for_epoch(0, cfg.method.trimin)
    )
    tr.validate(st, 1, 0, 0)
    assert tr.best_abs_rel < 10.0

    # quick-val subsampling path (weak-item 8: tunnel-friendly periodic val)
    tr.validate(st, 1, 0, 0, quick=1)

    # image panels (reference wandb image logging, trainer.py:736-772)
    import jax

    from baseboostdepth_tpu.data.curriculum import stage_for_epoch
    from baseboostdepth_tpu.data.loader import KittiTrainLoader
    from baseboostdepth_tpu.parallel import shard_batch

    loader = KittiTrainLoader(
        tr.train_index, stage_for_epoch(0, cfg.method.trimin),
        cfg.optim.batch_size, cfg.data.height, cfg.data.width,
        trimin=True, use_stereo=True, num_workers=2, seed=0, use_native=False,
    )
    batch = shard_batch(next(iter(loader)), tr.mesh)
    tr.save_image_panels(st, batch, jax.random.PRNGKey(0), 123)
    assert os.path.exists(
        os.path.join(logs, "e2e", "panels", "step_00000123.png")
    )

    # metrics logged, checkpoint saved
    metrics_file = os.path.join(logs, "e2e", "metrics.jsonl")
    ckpt_dir = os.path.join(logs, "e2e", "checkpoints")
    assert os.path.exists(os.path.join(logs, "e2e", "config.json"))
    assert tr.ckpt.latest_step() == 1

    # resume: a fresh Trainer picks up the checkpoint
    tr2 = Trainer(_config(data, splits, logs))
    assert int(np.asarray(tr2.state.step)) == 1


def test_resume_positions_come_from_metadata(tiny_kitti):
    """Resume must land on the epoch/batch recorded in checkpoint metadata,
    not on latest_step // steps_per_epoch: best-abs_rel checkpoints are
    written mid-epoch and bucket_fs drops per-class leftovers, so the step
    count alone cannot recover the position (VERDICT weak #4; the reference
    replays epoch + scheduler from its folder name, trainer.py:168-186)."""
    import jax

    from baseboostdepth_tpu.training.trainer import Trainer

    data, splits, logs = tiny_kitti
    cfg = _config(data, splits, logs)
    cfg.log.model_name = "resume_meta"
    tr = Trainer(cfg)

    # a mid-epoch best-val checkpoint: epoch 1, just finished batch 3.
    # steps=5 with steps_per_epoch=1 would have (wrongly) put the old
    # heuristic at epoch 5.
    tr.ckpt.save(5, jax.device_get(tr.state),
                 {"epoch": 1, "batch_in_epoch": 3, "best": True,
                  "abs_rel": 0.42, "best_abs_rel": 0.42})
    cfg2 = _config(data, splits, logs)
    cfg2.log.model_name = "resume_meta"
    tr2 = Trainer(cfg2)
    assert tr2.start_epoch == 1
    assert tr2.start_batch == 4  # resumes at the NEXT batch
    assert abs(tr2.best_abs_rel - 0.42) < 1e-9  # best survives restart

    # an epoch-end checkpoint resumes at the next epoch's first batch
    tr2.ckpt.save(9, jax.device_get(tr2.state),
                  {"epoch": 1, "epoch_complete": True, "best_abs_rel": 0.42})
    cfg3 = _config(data, splits, logs)
    cfg3.log.model_name = "resume_meta"
    tr3 = Trainer(cfg3)
    assert tr3.start_epoch == 2
    assert tr3.start_batch == 0
