"""End-to-end evaluation-path tests over synthetic fixtures: KITTI eigen
eval, SYNS eval (with chamfer), odometry ATE -- with a freshly initialized
model. Catches API/shape breaks across the whole eval surface."""

import os

import numpy as np
import jax
import pytest
from PIL import Image

from baseboostdepth_tpu.config import Config
from baseboostdepth_tpu.training.optim import make_optimizer
from baseboostdepth_tpu.training.step import StepStatic, init_state

H, W = 64, 128


@pytest.fixture(scope="module")
def state():
    st = StepStatic(zoo="md2", height=H, width=W, dtype="float32")
    return st, init_state(st, make_optimizer(), jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def eval_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalfix")
    kt = root / "kitti"
    splits = root / "splits"
    folder = "2011_09_26/2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(0)
    d = kt / folder / "image_02" / "data"
    d.mkdir(parents=True)
    n = 5
    for i in range(n):
        img = rng.integers(0, 255, (40, 120, 3), dtype=np.uint8)
        Image.fromarray(img).save(d / f"{i:010d}.jpg")

    eigen = splits / "eigen"
    eigen.mkdir(parents=True)
    eigen.joinpath("test_files.txt").write_text(
        "\n".join(f"{folder} {i} l" for i in range(n)) + "\n"
    )
    yy, xx = np.meshgrid(np.linspace(0, 1, 40), np.linspace(0, 1, 120), indexing="ij")
    gt = [(4 + 30 * yy + 5 * np.sin(4 * xx)).astype(np.float32) for _ in range(n)]
    arr = np.empty(n, dtype=object)
    for i, g in enumerate(gt):
        arr[i] = g
    np.savez_compressed(eigen / "gt_depths.npz", data=arr)
    return str(kt), str(splits), n


def _cfg(kt, splits):
    cfg = Config()
    cfg.data.kt_path = kt
    cfg.data.splits_dir = splits
    cfg.data.height = H
    cfg.data.width = W
    cfg.model.dtype = "float32"
    return cfg


class TestKittiEvalE2E:
    def test_evaluate_kitti_runs(self, state, eval_fixture, tmp_path):
        from baseboostdepth_tpu.evaluation.depth import evaluate_kitti

        st, s = state
        kt, splits, n = eval_fixture
        cfg = _cfg(kt, splits)
        out = os.path.join(str(tmp_path), "disps.npy")
        res = evaluate_kitti(cfg, s.params, s.stats, eval_split="eigen",
                             save_pred_disps=out)
        for k in ("abs_rel", "rmse", "a1"):
            assert np.isfinite(res[k]), res
        disps = np.load(out)
        assert disps.shape == (n, H, W)
        # post-process variant
        res_pp = evaluate_kitti(cfg, s.params, s.stats, eval_split="eigen",
                                post_process=True)
        assert np.isfinite(res_pp["abs_rel"])
        # stereo protocol: no median scaling
        res_st = evaluate_kitti(cfg, s.params, s.stats, eval_split="eigen", stereo=True)
        assert "median_ratio" not in res_st


class TestSynsEvalE2E:
    def test_evaluate_syns_runs(self, state, tmp_path):
        from baseboostdepth_tpu.evaluation.syns import evaluate_syns

        st, s = state
        rng = np.random.default_rng(1)
        syns = tmp_path / "syns"
        splits = tmp_path / "splits" / "SYNS"
        splits.mkdir(parents=True)
        n = 2
        lines = []
        gt_d, gt_e = [], []
        for i in range(n):
            folder = f"{i+1:02d}"
            d = syns / "images" / folder
            d.mkdir(parents=True)
            img = rng.integers(0, 255, (38, 116, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"{i:02d}.png")
            lines.append(f"{folder} {i:02d}")
            yy = np.linspace(1, 60, 38)[:, None] * np.ones((1, 116))
            gt_d.append(yy.astype(np.float32))
            edges = np.zeros((38, 116, 1), dtype=bool)
            edges[::7] = True
            gt_e.append(edges)
        splits.joinpath("test_files.txt").write_text("\n".join(lines) + "\n")
        np.savez_compressed(splits / "gt_depths.npz", data=np.array(gt_d, dtype=object))
        np.savez_compressed(splits / "gt_edges.npz", data=np.array(gt_e, dtype=object))

        cfg = _cfg("unused", str(tmp_path / "splits"))
        cfg.data.syns_path = str(syns)
        res = evaluate_syns(cfg, s.params, s.stats, chamfer=True)
        for k in ("abs_rel", "edge_acc", "edge_comp", "f1", "iou"):
            assert k in res and np.isfinite(res[k]), res

        # online-validation variant (reference trainer.py:646-663, the
        # --SYNS_edge path): val split + *_val.npz GT sidecars
        splits.joinpath("val_files.txt").write_text(lines[0] + "\n")
        np.savez_compressed(
            splits / "gt_depths_val.npz", data=np.array(gt_d[:1], dtype=object)
        )
        np.savez_compressed(
            splits / "gt_edges_val.npz", data=np.array(gt_e[:1], dtype=object)
        )
        res_val = evaluate_syns(cfg, s.params, s.stats, file_name="val_files.txt")
        for k in ("abs_rel", "edge_acc", "edge_comp"):
            assert k in res_val and np.isfinite(res_val[k]), res_val

    def test_export_gt_val_roundtrip(self, state, tmp_path):
        """cli/export_gt --split SYNS [--val] must write the exact sidecars
        the SYNS evaluators read (gt_depths[_val].npz / gt_edges[_val].npz,
        evaluation/syns.py) and a --val export must not clobber the test GT
        (reference export_gt_depth.py:15-90 writes per-split files)."""
        from baseboostdepth_tpu.cli import export_gt
        from baseboostdepth_tpu.evaluation.syns import evaluate_syns

        st, s = state
        rng = np.random.default_rng(3)
        syns = tmp_path / "syns"
        splits_root = tmp_path / "splits"
        splits = splits_root / "SYNS"
        splits.mkdir(parents=True)
        lines = []
        for i in range(3):
            folder = f"{i+1:02d}"
            (syns / "images" / folder).mkdir(parents=True)
            (syns / "depths" / folder).mkdir(parents=True)
            img = rng.integers(0, 255, (38, 116, 3), dtype=np.uint8)
            Image.fromarray(img).save(syns / "images" / folder / f"{i:02d}.png")
            depth = (np.linspace(1, 60, 38)[:, None] * np.ones((1, 116))
                     + rng.normal(0, 0.5, (38, 116))).astype(np.float32)
            np.save(syns / "depths" / folder / f"{i:02d}.npy", depth)
            lines.append(f"{folder} {i:02d}")
        splits.joinpath("test_files.txt").write_text("\n".join(lines[:2]) + "\n")
        splits.joinpath("val_files.txt").write_text(lines[2] + "\n")

        args = ["--split", "SYNS", "--syns_path", str(syns),
                "--splits_dir", str(splits_root)]
        export_gt.main(args)
        export_gt.main(args + ["--val"])

        # distinct files, correct cardinality, test GT survives the val export
        test_gt = np.load(splits / "gt_depths.npz", allow_pickle=True)["data"]
        val_gt = np.load(splits / "gt_depths_val.npz", allow_pickle=True)["data"]
        assert len(test_gt) == 2 and len(val_gt) == 1
        assert (splits / "gt_edges.npz").exists()
        assert (splits / "gt_edges_val.npz").exists()

        cfg = _cfg("unused", str(splits_root))
        cfg.data.syns_path = str(syns)
        res = evaluate_syns(cfg, s.params, s.stats)
        res_val = evaluate_syns(cfg, s.params, s.stats, file_name="val_files.txt")
        for r in (res, res_val):
            for k in ("abs_rel", "edge_acc", "edge_comp"):
                assert k in r and np.isfinite(r[k]), r


class TestPoseEvalE2E:
    def test_evaluate_odometry_runs(self, state, tmp_path):
        from baseboostdepth_tpu.evaluation.pose import evaluate_odometry

        st, s = state
        rng = np.random.default_rng(2)
        kt = tmp_path / "odom"
        seq = kt / "sequences" / "09" / "image_2"
        seq.mkdir(parents=True)
        n = 8
        for i in range(n):
            img = rng.integers(0, 255, (40, 120, 3), dtype=np.uint8)
            Image.fromarray(img).save(seq / f"{i:06d}.png")
        splits = tmp_path / "splits" / "odom"
        splits.mkdir(parents=True)
        splits.joinpath("test_files_09.txt").write_text(
            "\n".join(f"09 {i} l" for i in range(n)) + "\n"
        )
        # GT poses: forward motion 1m per frame
        gt = []
        for i in range(n):
            T = np.eye(4)
            T[2, 3] = i * 1.0
            gt.append(T[:3].reshape(-1))
        gt_file = tmp_path / "poses09.txt"
        np.savetxt(gt_file, np.array(gt))

        cfg = _cfg(str(kt), str(tmp_path / "splits"))
        res = evaluate_odometry(cfg, s.params, s.stats, 9, str(gt_file), batch_size=4)
        assert np.isfinite(res["ate_direct"]) and np.isfinite(res["ate_chained"])
