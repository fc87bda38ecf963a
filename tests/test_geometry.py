"""Geometry unit tests: Rodrigues / SE(3) / warp-grid parity against
independent oracles (scipy rotations, torch reference formulas)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from baseboostdepth_tpu import geometry


def test_disp_to_depth_roundtrip():
    disp = jnp.array([0.0, 0.25, 0.5, 1.0])
    scaled, depth = geometry.disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(depth[0], 100.0, rtol=1e-5)
    np.testing.assert_allclose(depth[-1], 0.1, rtol=1e-5)
    np.testing.assert_allclose(scaled * depth, 1.0, rtol=1e-5)


def test_rot_from_axisangle_matches_scipy():
    rng = np.random.RandomState(0)
    vec = rng.randn(16, 3).astype(np.float32) * 0.5
    R = np.asarray(geometry.rot_from_axisangle(jnp.asarray(vec)))
    R_ref = Rotation.from_rotvec(vec).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rot_zero_angle_is_identity():
    R = np.asarray(geometry.rot_from_axisangle(jnp.zeros((2, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_transformation_invert_is_inverse():
    rng = np.random.RandomState(1)
    aa = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 0.3)
    t = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 0.2)
    T = geometry.transformation_from_parameters(aa, t, invert=False)
    Tinv = geometry.transformation_from_parameters(aa, t, invert=True)
    eye = np.broadcast_to(np.eye(4), (8, 4, 4))
    np.testing.assert_allclose(np.asarray(T @ Tinv), eye, atol=1e-5)
    # bottom row form
    np.testing.assert_allclose(np.asarray(T)[:, 3], np.tile([0, 0, 0, 1.0], (8, 1)), atol=1e-6)


def test_compose_poses_matches_sequential_matmul():
    rng = np.random.RandomState(2)
    steps = []
    for _ in range(5):
        aa = jnp.asarray(rng.randn(3, 3).astype(np.float32) * 0.1)
        t = jnp.asarray(rng.randn(3, 3).astype(np.float32) * 0.1)
        steps.append(geometry.transformation_from_parameters(aa, t))
    steps = jnp.stack(steps, axis=1)  # [B=3, N=5, 4, 4]
    out = geometry.compose_poses(steps)
    # oracle: T(0->g) = step_{g-1} @ ... @ step_0  (reference trainer.py:362-373)
    acc = np.broadcast_to(np.eye(4, dtype=np.float32), (3, 4, 4)).copy()
    for g in range(5):
        acc = np.asarray(steps[:, g]) @ acc
        np.testing.assert_allclose(np.asarray(out[:, g]), acc, atol=1e-5)


def _kitti_K(width, height):
    K = np.array(
        [[0.58, 0, 0.5, 0], [0, 1.92, 0.5, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    )
    K[0] *= width
    K[1] *= height
    return K


def test_warp_grid_identity_pose_gives_identity_grid():
    H, W = 24, 48
    K = _kitti_K(W, H)
    inv_K = np.linalg.inv(K).astype(np.float32)
    depth = jnp.full((2, H, W), 10.0)
    T = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    grid = geometry.warp_grid(depth, jnp.asarray(K)[None].repeat(2, 0), jnp.asarray(inv_K)[None].repeat(2, 0), T)
    # identity warp: grid should be the regular normalized lattice
    gx = np.linspace(-1, 1, W, dtype=np.float32)
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(grid[0, 0, :, 0]), gx, atol=2e-4)
    np.testing.assert_allclose(np.asarray(grid[0, :, 0, 1]), gy, atol=2e-4)


def test_warp_grid_matches_backproject_project_chain():
    """Fused warp_grid == separate backproject_depth + project_3d (the
    reference's two-module chain, layers.py:136-195)."""
    rng = np.random.RandomState(3)
    H, W = 16, 32
    B = 4
    K = np.broadcast_to(_kitti_K(W, H), (B, 4, 4)).astype(np.float32)
    inv_K = np.linalg.inv(K).astype(np.float32)
    depth = jnp.asarray(rng.uniform(1, 50, (B, H, W)).astype(np.float32))
    aa = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.05)
    t = jnp.asarray(rng.randn(B, 3).astype(np.float32) * 0.1)
    T = geometry.transformation_from_parameters(aa, t)

    fused = geometry.warp_grid(depth, jnp.asarray(K), jnp.asarray(inv_K), T)
    pts = geometry.backproject_depth(depth, jnp.asarray(inv_K))
    chained = geometry.project_3d(pts, jnp.asarray(K), T, H, W)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(chained), atol=1e-4)


def test_warp_grid_stereo_translation_shifts_x_only():
    """A pure x-translation (stereo baseline, mono_dataset.py:136-140) must
    shift the grid horizontally by fx * tx / depth pixels."""
    H, W = 32, 64
    B = 1
    K = np.broadcast_to(_kitti_K(W, H), (B, 4, 4)).astype(np.float32)
    inv_K = np.linalg.inv(K).astype(np.float32)
    d = 10.0
    depth = jnp.full((B, H, W), d)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.1
    grid = geometry.warp_grid(depth, jnp.asarray(K), jnp.asarray(inv_K), jnp.asarray(T)[None])
    # expected pixel shift
    fx = K[0, 0, 0]
    shift_px = fx * 0.1 / d
    gx = np.linspace(-1, 1, W, dtype=np.float32) + 2 * shift_px / (W - 1)
    gy = np.linspace(-1, 1, H, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(grid[0, 5, :, 0]), gx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(grid[0, :, 7, 1]), gy, atol=1e-4)
