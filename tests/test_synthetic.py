"""Synthetic-scene validity: the analytic renderer must be exactly
multi-view consistent UNDER OUR OWN geometry/warp stack -- warping a
neighboring view (or the stereo pair) into the target with GT depth + GT
pose must reproduce the target almost perfectly. This certifies that any
abs_rel measured on synthetic training runs is attributable to the method,
not to data/convention bugs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from baseboostdepth_tpu import geometry
from baseboostdepth_tpu.data.kitti import intrinsics
from baseboostdepth_tpu.data.synthetic import SyntheticScene, materialize_kitti_layout
from baseboostdepth_tpu.ops.sampling import bilinear_sample

H, W = 96, 320


def _gt_warp_error(scene, i, f, stereo=False):
    """Warp source frame (i+f or stereo pair) into frame i with GT depth and
    GT pose; return per-pixel |err| of warped vs target (float [H,W])."""
    K, inv_K = intrinsics(W, H)
    tgt, depth = scene.render(i, "l", K, W, H)
    if stereo:
        src, _ = scene.render(i, "r", K, W, H)
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -0.1  # x_r = x_l - 0.1 (side 'l', no flip)
    else:
        src, _ = scene.render(i + f, "l", K, W, H)
        T = scene.pose_0_to_f(i + f, base=i)

    grid = geometry.warp_grid(
        jnp.asarray(depth)[None],
        jnp.asarray(K)[None],
        jnp.asarray(inv_K)[None],
        jnp.asarray(T)[None],
    )
    warped = bilinear_sample(jnp.asarray(src, jnp.float32)[None] / 255.0, grid)
    err = np.abs(np.asarray(warped[0]) - tgt.astype(np.float32) / 255.0).mean(-1)
    g = np.asarray(grid[0])
    in_fov = (np.abs(g[..., 0]) <= 1.0) & (np.abs(g[..., 1]) <= 1.0)
    # points behind the source camera project to mirrored in-FOV coords;
    # mask them (training discards such pixels via the candidate min)
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    rays = np.stack([u, v, np.ones_like(u)], -1) @ np.linalg.inv(K[:3, :3]).T
    p_src = (depth[..., None] * rays) @ np.asarray(T[:3, :3]).T + np.asarray(T[:3, 3])
    in_fov &= p_src[..., 2] > 0.05
    return err, in_fov


class TestSceneConsistency:
    def test_temporal_gt_warp_reconstructs_target(self):
        """Backward sources (-f) contain the whole target view (the camera
        drives forward), so their GT warp must reconstruct almost every
        pixel; forward sources (+f) lose FOV overlap, so the strict check
        applies only to in-FOV pixels. The method's min over +-f candidates
        relies on exactly this asymmetry."""
        scene = SyntheticScene(seed=3)
        base, _ = _gt_warp_error(scene, 20, 0)  # identity sanity floor
        assert np.median(base) < 1e-3
        for f in (-1, -4, -7):
            err, _ = _gt_warp_error(scene, 20, f)
            assert np.median(err) < 0.02, (f, np.median(err))
            assert (err < 0.05).mean() > 0.65, (f, (err < 0.05).mean())
        for f in (1, 4, 7):
            err, valid = _gt_warp_error(scene, 20, f)
            assert valid.mean() > 0.25, (f, valid.mean())
            assert np.median(err[valid]) < 0.03, (f, np.median(err[valid]))

    def test_stereo_gt_warp_reconstructs_target(self):
        scene = SyntheticScene(seed=3)
        err, _ = _gt_warp_error(scene, 30, 0, stereo=True)
        assert np.median(err) < 0.02, np.median(err)

    def test_unwarped_neighbor_is_much_worse(self):
        """The scene must have enough texture/motion that NOT warping is
        visibly wrong -- otherwise photometric training signal is nil."""
        scene = SyntheticScene(seed=3)
        K, _ = intrinsics(W, H)
        tgt, _ = scene.render(20, "l", K, W, H)
        src, _ = scene.render(27, "l", K, W, H)
        raw = np.abs(src.astype(np.float32) - tgt.astype(np.float32)).mean() / 255.0
        err, _ = _gt_warp_error(scene, 20, -7)
        warped_med = float(np.median(err))
        assert raw > 5 * warped_med, (raw, warped_med)
        assert raw > 0.05

    def test_depth_statistics(self):
        scene = SyntheticScene(seed=0)
        K, _ = intrinsics(W, H)
        _, depth = scene.render(15, "l", K, W, H)
        assert depth.min() > 0.2
        assert depth.max() <= scene.sky_depth + 1e-5
        # depth must vary strongly (parallax signal)
        assert depth.max() / depth.min() > 5


class TestOdometryLayout:
    def test_gt_poses_match_training_convention(self, tmp_path):
        """The materialized KITTI-odometry gt file must reproduce the
        scene's training-side pose convention: the evaluator's local GT
        pose inv(inv(g[i]) @ g[i+1]) == scene.pose_0_to_f(i+1, base=i)."""
        from baseboostdepth_tpu.data.synthetic import materialize_odometry_layout
        from baseboostdepth_tpu.evaluation.pose import local_gt_poses

        scene = SyntheticScene(seed=2)
        root, splits_dir, gt_path = materialize_odometry_layout(
            str(tmp_path), n_frames=10, width=96, height=64, scene=scene,
        )
        gt = np.loadtxt(gt_path).reshape(-1, 3, 4)
        assert gt.shape[0] == 10
        gt_global = np.concatenate([gt, np.zeros((len(gt), 1, 4))], axis=1)
        gt_global[:, 3, 3] = 1
        local = local_gt_poses(gt_global, skip_frame=1)
        for i in range(9):
            expected = scene.pose_0_to_f(i + 1, base=i)
            np.testing.assert_allclose(local[i], expected, atol=1e-6)
        import os

        assert os.path.exists(
            os.path.join(splits_dir, "odom", "test_files_09.txt")
        )
        assert os.path.exists(
            os.path.join(root, "sequences", "09", "image_2", "000003.png")
        )


class TestMaterializedLayout:
    def test_layout_feeds_the_real_pipeline(self, tmp_path):
        from baseboostdepth_tpu.data import kitti
        from baseboostdepth_tpu.data.curriculum import stage_for_epoch
        from baseboostdepth_tpu.data.loader import KittiTrainLoader

        root, splits_dir = materialize_kitti_layout(
            str(tmp_path), n_frames=24, width=96, height=64, seed=1,
            margin=7, val_fraction=0.3, scene=SyntheticScene(seed=1),
        )
        import os

        split = os.path.join(splits_dir, "synth")
        index = kitti.KittiRawIndex(root, os.path.join(split, "train_files_baselines.txt"))
        assert len(index) > 4
        assert all(s.baseline > 0 for s in index.samples)

        gt = np.load(os.path.join(split, "gt_depths.npz"))["data"]
        assert gt.shape[1:] == (64, 96)

        stage = stage_for_epoch(0, trimin=True)
        loader = KittiTrainLoader(
            index, stage, batch_size=2, height=64, width=96, trimin=True,
            use_stereo=True, num_workers=2, seed=0, use_native=False,
        )
        batch = next(iter(loader))
        assert batch["frames"].shape[0] == 2
        assert batch["slot_valid"].any(axis=1).all()
