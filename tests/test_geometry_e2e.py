"""Physical-consistency tests through the full geometry + warp chain:
a synthetic stereo pair with known disparity must be reconstructed exactly
at the true depth (the SURVEY section-4 'synthetic translated image
recovers known disparity' acceptance test), and the photometric loss must
be minimized at the true depth."""

import numpy as np
import jax
import jax.numpy as jnp

from baseboostdepth_tpu import geometry
from baseboostdepth_tpu.ops import bilinear_sample
from baseboostdepth_tpu.ops.ssim import reprojection_loss


H, W = 64, 128
FX = 0.58 * W
BASELINE = 0.1


def _K():
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = FX, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    return K


def _smooth_image(rng):
    base = rng.random((H // 8, W // 8, 3)).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (H, W, 3), "linear")
    return np.asarray(img)


def test_stereo_warp_recovers_target_at_true_depth():
    """Right image = left shifted by disparity d; warping right with
    T = stereo baseline at depth fx*b/d must reproduce the left image."""
    rng = np.random.default_rng(0)
    left = _smooth_image(rng)
    d_px = 4  # integer disparity so the shift is exact
    # the warp samples the source at x + d (verified sign: T_x=+b =>
    # grid_x = x + fx*b/z), so a consistent source satisfies
    # source(x + d) = target(x), i.e. source = target rolled right by d
    right = np.roll(left, d_px, axis=1)

    depth_true = FX * BASELINE / d_px
    K = _K()[None]
    inv_K = np.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = BASELINE  # reference stereo_T sign for side 'l', no flip
    depth = jnp.full((1, H, W), depth_true)

    grid = geometry.warp_grid(depth, jnp.asarray(K), jnp.asarray(inv_K), jnp.asarray(T)[None])
    warped = np.asarray(bilinear_sample(jnp.asarray(right)[None], grid))[0]

    # interior must match exactly (borders wrap from np.roll)
    err = np.abs(warped[:, : W - d_px] - left[:, : W - d_px]).max()
    assert err < 1e-4, err


def test_photometric_minimized_at_true_depth():
    rng = np.random.default_rng(1)
    left = _smooth_image(rng)
    d_px = 4
    right = np.roll(left, d_px, axis=1)
    depth_true = FX * BASELINE / d_px

    K = jnp.asarray(_K()[None])
    inv_K = jnp.linalg.inv(K)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = BASELINE

    def loss_at(depth_val):
        depth = jnp.full((1, H, W), depth_val)
        grid = geometry.warp_grid(depth, K, inv_K, jnp.asarray(T)[None])
        warped = bilinear_sample(jnp.asarray(right)[None], grid)
        pe = reprojection_loss(warped, jnp.asarray(left)[None])
        return float(jnp.mean(pe[:, :, : W - 2 * d_px]))

    at_true = loss_at(depth_true)
    assert at_true < loss_at(depth_true * 0.7)
    assert at_true < loss_at(depth_true * 1.4)
    assert at_true < 0.01


def test_forward_motion_geometry():
    """Pure forward translation: the warp grid must expand radially around
    the principal point (points move outward in the source view when the
    camera moves backward... sign check against the projection chain)."""
    K = jnp.asarray(_K()[None])
    inv_K = jnp.linalg.inv(K)
    depth = jnp.full((1, H, W), 10.0)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = -1.0  # source camera 1 unit behind the target
    grid = np.asarray(geometry.warp_grid(depth, K, inv_K, jnp.asarray(T)[None]))[0]
    # pixel right of the principal point must sample further right
    x_px = (grid[H // 2, 3 * W // 4, 0] + 1) / 2 * (W - 1)
    assert x_px > 3 * W // 4
    x_px_l = (grid[H // 2, W // 4, 0] + 1) / 2 * (W - 1)
    assert x_px_l < W // 4
