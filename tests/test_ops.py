"""Op parity tests against torch oracles (grid_sample, avg_pool SSIM,
interpolate). torch here is only a test oracle, never a runtime dependency."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from baseboostdepth_tpu.ops import bilinear_sample, ssim, upsample2x_nearest, resize_bilinear
from baseboostdepth_tpu.ops.ssim import reprojection_loss


def _rand_img(rng, b, h, w, c):
    return rng.uniform(0, 1, (b, h, w, c)).astype(np.float32)


def _rand_grid(rng, b, h, w, scale=1.3):
    """Grid spanning in and out of bounds to exercise border clamping."""
    return (rng.uniform(-scale, scale, (b, h, w, 2))).astype(np.float32)


class TestBilinearSample:
    def test_matches_torch_grid_sample(self):
        rng = np.random.RandomState(0)
        img = _rand_img(rng, 3, 20, 31, 4)
        grid = _rand_grid(rng, 3, 20, 31)

        ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(grid)))

        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        t_grid = torch.from_numpy(grid)
        ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="border", align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_identity_grid_returns_image(self):
        rng = np.random.RandomState(1)
        img = _rand_img(rng, 2, 8, 16, 3)
        gy, gx = np.meshgrid(
            np.linspace(-1, 1, 8, dtype=np.float32),
            np.linspace(-1, 1, 16, dtype=np.float32),
            indexing="ij",
        )
        grid = np.stack([gx, gy], axis=-1)[None].repeat(2, 0)
        out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_gradients_match_torch(self):
        """Both image and grid gradients must match torch: the depth/pose
        learning signal flows exclusively through the grid gradient."""
        rng = np.random.RandomState(2)
        img = _rand_img(rng, 2, 10, 12, 3)
        grid = _rand_grid(rng, 2, 10, 12, scale=1.1)

        def f(im, gr):
            return jnp.sum(bilinear_sample(im, gr) ** 2)

        gi, gg = jax.grad(f, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

        t_img = torch.from_numpy(img).permute(0, 3, 1, 2).requires_grad_(True)
        t_grid = torch.from_numpy(grid).requires_grad_(True)
        out = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="border", align_corners=True)
        (out**2).sum().backward()

        np.testing.assert_allclose(
            np.asarray(gi), t_img.grad.permute(0, 2, 3, 1).numpy(), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(gg), t_grid.grad.numpy(), atol=1e-4)

    def test_leading_slot_axis(self):
        rng = np.random.RandomState(3)
        img = rng.uniform(0, 1, (2, 5, 8, 12, 3)).astype(np.float32)
        grid = _rand_grid(rng, 2 * 5, 8, 12).reshape(2, 5, 8, 12, 2)
        out = bilinear_sample(jnp.asarray(img), jnp.asarray(grid))
        assert out.shape == (2, 5, 8, 12, 3)
        one = bilinear_sample(jnp.asarray(img[1, 2]), jnp.asarray(grid[1, 2]))
        np.testing.assert_allclose(np.asarray(out[1, 2]), np.asarray(one), atol=1e-6)


class TestSSIM:
    def test_matches_torch_reference_formula(self):
        """Oracle re-derives the reference SSIM (layers.py:219-249) with torch
        pooling ops."""
        rng = np.random.RandomState(4)
        x = _rand_img(rng, 2, 16, 24, 3)
        y = np.clip(x + rng.randn(2, 16, 24, 3).astype(np.float32) * 0.1, 0, 1)

        ours = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))

        tx = F.pad(torch.from_numpy(x).permute(0, 3, 1, 2), (1, 1, 1, 1), mode="reflect")
        ty = F.pad(torch.from_numpy(y).permute(0, 3, 1, 2), (1, 1, 1, 1), mode="reflect")
        mu_x = F.avg_pool2d(tx, 3, 1)
        mu_y = F.avg_pool2d(ty, 3, 1)
        sigma_x = F.avg_pool2d(tx**2, 3, 1) - mu_x**2
        sigma_y = F.avg_pool2d(ty**2, 3, 1) - mu_y**2
        sigma_xy = F.avg_pool2d(tx * ty, 3, 1) - mu_x * mu_y
        C1, C2 = 0.01**2, 0.03**2
        n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
        d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
        ref = torch.clamp((1 - n / d) / 2, 0, 1).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_identical_images_zero(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(_rand_img(rng, 1, 12, 12, 3))
        np.testing.assert_allclose(np.asarray(ssim(x, x)), 0.0, atol=1e-6)

    def test_reprojection_loss_weighting(self):
        rng = np.random.RandomState(6)
        x = jnp.asarray(_rand_img(rng, 1, 12, 12, 3))
        y = jnp.asarray(_rand_img(rng, 1, 12, 12, 3))
        pe = reprojection_loss(x, y)
        l1 = jnp.mean(jnp.abs(y - x), axis=-1, keepdims=True)
        s = jnp.mean(ssim(x, y), axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(pe), np.asarray(0.85 * s + 0.15 * l1), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(reprojection_loss(x, y, use_ssim=False)), np.asarray(l1), atol=1e-6
        )


class TestResize:
    def test_upsample2x_matches_torch_nearest(self):
        rng = np.random.RandomState(7)
        x = _rand_img(rng, 2, 6, 10, 5)
        ours = np.asarray(upsample2x_nearest(jnp.asarray(x)))
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="nearest")
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)

    def test_bilinear_matches_torch_align_corners_false(self):
        rng = np.random.RandomState(8)
        x = _rand_img(rng, 2, 12, 20, 1)
        ours = np.asarray(resize_bilinear(jnp.asarray(x), 48, 80))
        ref = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(48, 80), mode="bilinear", align_corners=False
        )
        np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


class TestSmoothLoss:
    def test_matches_torch_reference_formula(self):
        """Edge-aware smoothness (reference layers.py:203-216) vs a torch
        re-derivation."""
        from baseboostdepth_tpu.losses import normalized_disp, smooth_loss

        rng = np.random.RandomState(11)
        disp = rng.uniform(0.01, 1, (2, 16, 24, 1)).astype(np.float32)
        img = rng.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)

        ours = float(smooth_loss(jnp.asarray(disp), jnp.asarray(img)))

        d = torch.from_numpy(disp).permute(0, 3, 1, 2)
        im = torch.from_numpy(img).permute(0, 3, 1, 2)
        gdx = torch.abs(d[:, :, :, :-1] - d[:, :, :, 1:])
        gdy = torch.abs(d[:, :, :-1, :] - d[:, :, 1:, :])
        gix = torch.mean(torch.abs(im[:, :, :, :-1] - im[:, :, :, 1:]), 1, keepdim=True)
        giy = torch.mean(torch.abs(im[:, :, :-1, :] - im[:, :, 1:, :]), 1, keepdim=True)
        ref = (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()
        np.testing.assert_allclose(ours, float(ref), rtol=1e-5)

        # normalization: disp / (mean + 1e-7)
        nd = np.asarray(normalized_disp(jnp.asarray(disp)))
        ref_nd = disp / (disp.mean(axis=(1, 2), keepdims=True) + 1e-7)
        np.testing.assert_allclose(nd, ref_nd, rtol=1e-5)


class TestLanczosPyramid:
    def test_matches_pil_cascade(self):
        """Device-side pyramid vs the reference's host-side PIL LANCZOS
        cascade (mono_dataset.py:190-192): each scale resized from the
        previous one."""
        from PIL import Image
        from baseboostdepth_tpu.ops.resize import lanczos_pyramid

        rng = np.random.RandomState(12)
        base = rng.randint(0, 255, (12, 40, 3), dtype=np.uint8)
        img = np.asarray(Image.fromarray(base).resize((128, 64), Image.BILINEAR))

        pyr = lanczos_pyramid(jnp.asarray(img[None].astype(np.float32) / 255.0), 4)

        pil = Image.fromarray(img)
        cur = pil
        for s in range(1, 4):
            cur = cur.resize((128 // 2**s, 64 // 2**s), Image.LANCZOS)
            ref = np.asarray(cur).astype(np.float32) / 255.0
            got = np.asarray(pyr[s][0])
            # PIL quantizes to uint8 between cascade levels; jax stays float
            err = np.abs(got - ref)
            assert err.mean() < 0.01 and np.percentile(err, 99) < 0.04, (
                s, err.mean(), err.max()
            )


def test_bilinear_align_corners_matches_torch():
    from baseboostdepth_tpu.ops.resize import resize_bilinear_align_corners

    rng = np.random.RandomState(13)
    x = rng.rand(2, 7, 11, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 20, 30))
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(20, 30),
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
