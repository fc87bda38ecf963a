"""Evaluation tests: metric math vs torch-reference formulas, chamfer vs
scipy KDTree oracle, eval protocol behaviors, kitti_utils calib parsing."""

import numpy as np
import pytest

from baseboostdepth_tpu.evaluation import metrics as M
from baseboostdepth_tpu.evaluation.pose import compute_ate, dump_xyz, local_gt_poses
from baseboostdepth_tpu.ops.chamfer import chamfer_nn_distances, pointcloud_f_iou


class TestDepthMetrics:
    def test_perfect_prediction(self):
        gt = np.random.default_rng(0).uniform(1, 80, 1000)
        e = M.compute_errors(gt, gt.copy())
        assert e[0] == 0 and e[2] == 0  # abs_rel, rmse
        assert e[4] == e[5] == e[6] == 1.0  # a1..a3

    def test_known_values(self):
        gt = np.array([10.0, 20.0])
        pred = np.array([12.0, 16.0])
        abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 = M.compute_errors(gt, pred)
        assert abs_rel == pytest.approx((2 / 10 + 4 / 20) / 2)
        assert sq_rel == pytest.approx((4 / 10 + 16 / 20) / 2)
        assert rmse == pytest.approx(np.sqrt((4 + 16) / 2))
        # 12/10 = 1.2 < 1.25 counts; 20/16 = 1.25 is NOT < 1.25 (strict)
        assert a1 == pytest.approx(0.5)
        assert a2 == pytest.approx(1.0)

    def test_median_scaling_protocol(self):
        # smooth synthetic depth so half-res resampling is benign
        yy, xx = np.meshgrid(np.linspace(0, 1, 40), np.linspace(0, 1, 100), indexing="ij")
        base = (5 + 40 * yy + 10 * np.sin(3 * xx)).astype(np.float32)
        gt = np.stack([base + i for i in range(5)])
        # predictions off by a constant scale in disparity space
        disp = (1.0 / gt[:, ::2, ::2]) * 3.7  # half-res disparities
        mean_err, ratios = M.evaluate_disparities(disp, list(gt), M.EvalProtocol.mono())
        assert mean_err[0] < 0.02  # abs_rel ~ 0 after median scaling
        np.testing.assert_allclose(ratios, 3.7, rtol=0.05)

    def test_garg_crop(self):
        m = M.garg_crop_mask(375, 1242)
        assert m.shape == (375, 1242)
        assert not m[0].any() and not m[374].any()
        assert m[200, 600]


class TestChamfer:
    def test_vs_kdtree(self):
        from scipy.spatial import cKDTree

        rng = np.random.default_rng(2)
        p = rng.normal(size=(3000, 3)).astype(np.float32)
        q = rng.normal(size=(4500, 3)).astype(np.float32) * 1.1
        pnn, qnn = chamfer_nn_distances(p, q)
        ref_p = cKDTree(q).query(p)[0]
        ref_q = cKDTree(p).query(q)[0]
        np.testing.assert_allclose(pnn, ref_p, atol=2e-2, rtol=1e-2)
        np.testing.assert_allclose(qnn, ref_q, atol=2e-2, rtol=1e-2)

    def test_f_iou(self):
        pred_nn = np.array([0.05, 0.2, 0.05, 0.05])
        tgt_nn = np.array([0.05, 0.05])
        f, iou = pointcloud_f_iou(pred_nn, tgt_nn, th=0.1)
        P, R = 0.75, 1.0
        assert f == pytest.approx(2 * P * R / (P + R))
        assert iou == pytest.approx(P * R / (P + R - P * R))


class TestPoseEval:
    def test_dump_xyz_integrates(self):
        T = np.eye(4)
        T[0, 3] = 1.0
        xyz = dump_xyz([T, T, T])
        np.testing.assert_allclose(xyz[:, 0], [0, 1, 2, 3])

    def test_ate_zero_for_perfect(self):
        rng = np.random.default_rng(3)
        gt = rng.normal(size=(5, 3))
        assert compute_ate(gt, gt.copy()) == pytest.approx(0, abs=1e-9)

    def test_ate_scale_invariance(self):
        rng = np.random.default_rng(4)
        gt = np.cumsum(rng.normal(size=(6, 3)), axis=0)
        gt -= gt[0]  # trajectories from dump_xyz always start at the origin
        pred = gt * 4.2  # pure scale is optimized away
        assert compute_ate(gt, pred) == pytest.approx(0, abs=1e-9)

    def test_local_gt_poses(self):
        g = np.broadcast_to(np.eye(4), (5, 4, 4)).copy()
        for i in range(5):
            g[i, 0, 3] = i * 2.0
        local = local_gt_poses(g, 2)
        assert len(local) == 3
        # relative motion over 2 frames is 4 units; protocol inverts it
        np.testing.assert_allclose(np.abs(local[0][0, 3]), 4.0)


class TestKittiUtils:
    def test_calib_parse_and_projection(self, tmp_path):
        from baseboostdepth_tpu.data.kitti_utils import generate_depth_map

        # synthetic calibration: identity-ish camera
        (tmp_path / "calib_cam_to_cam.txt").write_text(
            "S_rect_02: 20.0 10.0\n"
            "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
            "P_rect_02: 5 0 10 0 0 5 5 0 0 0 1 0\n"
        )
        (tmp_path / "calib_velo_to_cam.txt").write_text(
            "R: 0 -1 0 0 0 -1 1 0 0\nT: 0 0 0\n"
        )
        # velodyne: x forward, y left, z up. Point 4m ahead.
        pts = np.array([[4.0, 0.0, 0.0, 1.0]], dtype=np.float32)
        velo = tmp_path / "velo.bin"
        pts.astype(np.float32).tofile(velo)
        depth = generate_depth_map(str(tmp_path), str(velo), cam=2, vel_depth=True)
        assert depth.shape == (10, 20)
        ys, xs = np.nonzero(depth)
        assert len(ys) == 1
        # principal point (10, 5) with matlab -1 offset -> (9, 4)
        assert (ys[0], xs[0]) == (4, 9)
        assert depth[ys[0], xs[0]] == pytest.approx(4.0)
