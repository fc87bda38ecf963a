"""The shipped splits/ directory (data files, copied from the reference
checkout: /root/reference/splits/*) must parse through the framework's own
index/curriculum machinery with zero external dependency -- especially
eigen_zhou/train_files_baselines.txt, whose 5th column drives the entire
boosting curriculum (reference datasets/mono_dataset.py:90-91)."""

import os

import numpy as np
import pytest

from baseboostdepth_tpu.utils import readlines, resolve_splits_dir

SPLITS = resolve_splits_dir("splits")


def test_shipped_splits_resolve():
    assert os.path.isdir(SPLITS), SPLITS
    for sub in ("eigen_zhou", "eigen", "eigen_benchmark", "eigen_full",
                "benchmark", "odom", "SYNS"):
        assert os.path.isdir(os.path.join(SPLITS, sub)), sub


def test_eigen_zhou_baselines_column():
    lines = readlines(os.path.join(SPLITS, "eigen_zhou", "train_files_baselines.txt"))
    assert len(lines) == 39810  # SURVEY section 2.9
    baselines = []
    for ln in lines:
        parts = ln.split()
        assert len(parts) == 5, ln
        folder, frame, side, tag, baseline = parts
        assert side in ("l", "r")
        assert tag == "kt"
        int(frame)
        baselines.append(float(baseline))
    b = np.asarray(baselines)
    # per-sample motion magnitudes in the documented range (SURVEY: 0.0013-0.48)
    assert 0.001 < b.min() < 0.01 and 0.1 < b.max() < 1.0
    assert len(readlines(os.path.join(SPLITS, "eigen_zhou", "val_files.txt"))) == 4424


def test_eigen_test_lists():
    assert len(readlines(os.path.join(SPLITS, "eigen", "test_files.txt"))) == 697
    assert len(readlines(os.path.join(SPLITS, "eigen_benchmark", "test_files.txt"))) == 652


def test_odom_lists():
    for seq in (9, 10):
        lines = readlines(os.path.join(SPLITS, "odom", f"test_files_{seq:02d}.txt"))
        assert lines, seq
        s, f, side = lines[0].split()
        assert int(s) == seq and side == "l"
    assert len(readlines(os.path.join(SPLITS, "odom", "train_files.txt"))) == 36671


def test_syns_lists():
    assert len(readlines(os.path.join(SPLITS, "SYNS", "val_files.txt"))) == 501
    assert len(readlines(os.path.join(SPLITS, "SYNS", "test_files.txt"))) == 1438


def test_index_parses_shipped_eigen_zhou():
    """KittiRawIndex consumes the shipped train file directly (no image IO:
    existence checks are lazy)."""
    from baseboostdepth_tpu.data import kitti

    idx = kitti.KittiRawIndex(
        "/nonexistent", os.path.join(SPLITS, "eigen_zhou", "train_files_baselines.txt")
    )
    assert len(idx) == 39810
    s = idx.samples[0]
    assert s.baseline is not None and s.baseline > 0
    # curriculum window draw over real baselines stays in the legal range
    from baseboostdepth_tpu.data.curriculum import sample_f_max, stage_for_epoch

    stage = stage_for_epoch(14, trimin=True)
    rng = np.random.default_rng(0)
    fs = [
        sample_f_max(idx.samples[i].baseline, stage, rng, exists=lambda o: True)
        for i in range(0, 2000, 40)
    ]
    assert max(fs) <= stage.F and min(fs) >= 0
