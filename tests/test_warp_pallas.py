"""Pallas warp kernel correctness (interpret mode on CPU) vs torch
grid_sample and vs the XLA reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from baseboostdepth_tpu.ops.sampling import bilinear_sample
from baseboostdepth_tpu.ops.warp_pallas import (
    bilinear_sample_corner_u8,
    bilinear_sample_pallas,
    bilinear_sample_pallas_u8,
)


def _torch_ref(img, grid):
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(grid)
    ref = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="border", align_corners=True)
    return ref.permute(0, 2, 3, 1).numpy()


class TestPallasWarp:
    def test_forward_matches_torch(self):
        rng = np.random.default_rng(0)
        img = rng.random((2, 40, 256, 3)).astype(np.float32)
        grid = ((rng.random((2, 40, 256, 2)) * 2 - 1) * 1.15).astype(np.float32)
        out = np.asarray(bilinear_sample_pallas(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        np.testing.assert_allclose(out, _torch_ref(img, grid), atol=1e-5)

    def test_forward_matches_xla_path(self):
        rng = np.random.default_rng(1)
        img = rng.random((3, 16, 128, 2)).astype(np.float32)
        grid = ((rng.random((3, 16, 128, 2)) * 2 - 1) * 1.05).astype(np.float32)
        a = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(grid)))
        b = np.asarray(bilinear_sample_pallas(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_grid_gradients_match_torch(self):
        rng = np.random.default_rng(2)
        img = rng.random((1, 24, 128, 3)).astype(np.float32)
        grid = ((rng.random((1, 24, 128, 2)) * 2 - 1) * 1.05).astype(np.float32)

        def f(g):
            return jnp.sum(bilinear_sample_pallas(jnp.asarray(img), g, interpret=True) ** 2)

        gg = np.asarray(jax.grad(f)(jnp.asarray(grid)))

        t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
        tg = torch.from_numpy(grid).requires_grad_(True)
        out = F.grid_sample(t_img, tg, mode="bilinear", padding_mode="border", align_corners=True)
        (out**2).sum().backward()
        np.testing.assert_allclose(gg, tg.grad.numpy(), atol=1e-4)

    def test_non_tile_aligned_shapes(self):
        rng = np.random.default_rng(3)
        img = rng.random((1, 30, 100, 3)).astype(np.float32)  # pads to 40x256 grid
        grid = ((rng.random((1, 30, 100, 2)) * 2 - 1) * 1.1).astype(np.float32)
        out = np.asarray(bilinear_sample_pallas(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        np.testing.assert_allclose(out, _torch_ref(img, grid), atol=1e-5)

    def test_leading_slot_axis(self):
        rng = np.random.default_rng(4)
        img = rng.random((2, 3, 16, 128, 3)).astype(np.float32)
        grid = ((rng.random((2, 3, 16, 128, 2)) * 2 - 1) * 1.05).astype(np.float32)
        out = bilinear_sample_pallas(jnp.asarray(img), jnp.asarray(grid), interpret=True)
        assert out.shape == (2, 3, 16, 128, 3)
        one = bilinear_sample_pallas(jnp.asarray(img[1, 2]), jnp.asarray(grid[1, 2]), interpret=True)
        np.testing.assert_allclose(np.asarray(out[1, 2]), np.asarray(one), atol=1e-6)


class TestCornerWarp:
    """bilinear_sample_corner_u8: same sweep as the packed kernel, but the
    blend (and therefore the whole backward pass) runs in XLA over the saved
    corner planes."""

    def _inputs(self, seed, shape=(2, 24, 128)):
        rng = np.random.default_rng(seed)
        B, H, W = shape
        img = rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
        grid = ((rng.random((B, H, W, 2)) * 2 - 1) * 1.1).astype(np.float32)
        return img, grid

    def test_matches_packed_kernel(self):
        img, grid = self._inputs(10)
        a = np.asarray(bilinear_sample_pallas_u8(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        b = np.asarray(bilinear_sample_corner_u8(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_matches_torch(self):
        img, grid = self._inputs(11)
        out = np.asarray(bilinear_sample_corner_u8(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        ref = _torch_ref(img.astype(np.float32) / 255.0, grid)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_grid_gradients_match_custom_vjp(self):
        """XLA autodiff through the corner blend must equal the packed
        kernel's hand-derived VJP (they compute the same closed form)."""
        img, grid = self._inputs(12, shape=(1, 16, 128))
        ct = np.random.default_rng(13).random((1, 16, 128, 3)).astype(np.float32)

        def loss(fn, g):
            return jnp.sum(fn(jnp.asarray(img), g, interpret=True) * ct)

        g_corner = np.asarray(
            jax.grad(lambda g: loss(bilinear_sample_corner_u8, g))(jnp.asarray(grid))
        )
        g_packed = np.asarray(
            jax.grad(lambda g: loss(bilinear_sample_pallas_u8, g))(jnp.asarray(grid))
        )
        np.testing.assert_allclose(g_corner, g_packed, atol=1e-4)

    def test_grid_gradients_match_torch(self):
        img, grid = self._inputs(14, shape=(1, 16, 128))

        def f(g):
            return jnp.sum(bilinear_sample_corner_u8(jnp.asarray(img), g, interpret=True) ** 2)

        gg = np.asarray(jax.grad(f)(jnp.asarray(grid)))

        t_img = torch.from_numpy(img.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
        tg = torch.from_numpy(grid).requires_grad_(True)
        out = F.grid_sample(t_img, tg, mode="bilinear", padding_mode="border", align_corners=True)
        (out**2).sum().backward()
        np.testing.assert_allclose(gg, tg.grad.numpy(), atol=1e-4)

    def test_non_tile_aligned_shapes(self):
        img, grid = self._inputs(15, shape=(1, 30, 100))
        out = np.asarray(bilinear_sample_corner_u8(jnp.asarray(img), jnp.asarray(grid), interpret=True))
        ref = _torch_ref(img.astype(np.float32) / 255.0, grid)
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestRowSkipVariant:
    """BBD_WARP_ROW_SKIP=1 (ops/warp_pallas.py:62) must be bit-identical to
    the default sweep. The flag is read at import, and flipping the module
    global in-process would race jax's tracing caches, so the variant runs
    in a subprocess with the env set and ships its outputs back via npz."""

    def test_rowskip_outputs_and_grads_match_default(self, tmp_path):
        import os
        import subprocess
        import sys

        rng = np.random.default_rng(21)
        img_u8 = rng.integers(0, 256, (2, 24, 128, 3), dtype=np.uint8)
        imgf = rng.random((1, 40, 256, 3)).astype(np.float32)
        grid_u8 = ((rng.random((2, 24, 128, 2)) * 2 - 1) * 1.1).astype(np.float32)
        gridf = ((rng.random((1, 40, 256, 2)) * 2 - 1) * 1.15).astype(np.float32)
        inp = tmp_path / "inp.npz"
        out = tmp_path / "out.npz"
        np.savez(inp, img_u8=img_u8, grid_u8=grid_u8, imgf=imgf, gridf=gridf)

        prog = (
            "import numpy as np, jax, jax.numpy as jnp;"
            "import sys;"
            "from baseboostdepth_tpu.ops import warp_pallas as wp;"
            "assert wp.ROW_SKIP, 'env did not reach the module';"
            "d = np.load(sys.argv[1]);"
            "corner = np.asarray(wp.bilinear_sample_corner_u8("
            "    jnp.asarray(d['img_u8']), jnp.asarray(d['grid_u8']), interpret=True));"
            "gg = np.asarray(jax.grad(lambda g: jnp.sum(wp.bilinear_sample_corner_u8("
            "    jnp.asarray(d['img_u8']), g, interpret=True) ** 2))(jnp.asarray(d['grid_u8'])));"
            "flt = np.asarray(wp.bilinear_sample_pallas("
            "    jnp.asarray(d['imgf']), jnp.asarray(d['gridf']), interpret=True));"
            "np.savez(sys.argv[2], corner=corner, gg=gg, flt=flt)"
        )
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.update(JAX_PLATFORMS="cpu", BBD_WARP_ROW_SKIP="1")
        subprocess.run(
            [sys.executable, "-c", prog, str(inp), str(out)],
            check=True, env=env, timeout=600,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        got = np.load(out)

        from baseboostdepth_tpu.ops import warp_pallas as wp

        assert not wp.ROW_SKIP  # this process runs the default sweep
        corner = np.asarray(
            wp.bilinear_sample_corner_u8(jnp.asarray(img_u8), jnp.asarray(grid_u8), interpret=True)
        )
        gg = np.asarray(
            jax.grad(
                lambda g: jnp.sum(
                    wp.bilinear_sample_corner_u8(jnp.asarray(img_u8), g, interpret=True) ** 2
                )
            )(jnp.asarray(grid_u8))
        )
        flt = np.asarray(
            wp.bilinear_sample_pallas(jnp.asarray(imgf), jnp.asarray(gridf), interpret=True)
        )
        np.testing.assert_array_equal(got["corner"], corner)
        np.testing.assert_array_equal(got["gg"], gg)
        np.testing.assert_array_equal(got["flt"], flt)
