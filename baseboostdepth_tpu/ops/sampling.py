"""Bilinear grid sampling (the warp): torch.grid_sample parity on TPU.

The single hottest op in the whole method: every loss candidate is an
inverse-warp of a source image through a depth+pose-derived grid
(reference trainer.py:439,442 -- F.grid_sample(..., align_corners=True,
padding_mode="border")). Semantics implemented here:

- grid in [-1, 1], align_corners=True: x_px = (gx + 1)/2 * (W - 1)
- border padding: coordinates clamped into [0, W-1] x [0, H-1] before
  interpolation, so gradients w.r.t. the grid vanish outside the image
  (same saturation behavior as torch's border mode).
- gradients flow into BOTH the source image (scatter-add transpose of the
  gather) and the grid (bilinear weight derivatives) -- this is the
  correctness linchpin: depth and pose only learn through the grid gradient.

Implementation notes (TPU): the four corner reads are expressed as one
flattened take_along_axis over H*W so XLA emits a single gather with the
channel axis minor (contiguous). Gather on TPU is serviced by the scalar/
vector load units; keeping C minor and fusing the weight FMAs means the op
is HBM-bandwidth bound, which is its roofline anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample `img` at `grid` locations, bilinear, border-clamped.

    Args:
      img:  [..., H, W, C] source image(s).
      grid: [..., Ho, Wo, 2] normalized (x, y) sample coords in [-1, 1],
            align_corners=True convention. Leading batch dims must match img.

    Returns:
      [..., Ho, Wo, C] resampled image.
    """
    H, W, C = img.shape[-3:]
    lead = img.shape[:-3]
    Ho, Wo = grid.shape[-3:-1]

    imgf = img.reshape((-1, H * W, C))
    gridf = grid.reshape((-1, Ho * Wo, 2))

    x = (gridf[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (gridf[..., 1] + 1.0) * 0.5 * (H - 1)

    # Border padding: clamp the *coordinate*; clamp saturates the gradient to
    # zero out of range, matching torch border-mode grid gradients.
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    def gather(yi, xi):
        idx = yi * W + xi  # [N, HoWo]
        return jnp.take_along_axis(imgf, idx[..., None], axis=1)  # [N, HoWo, C]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    out = top + (bot - top) * wy

    return out.reshape(lead + (Ho, Wo, C))


def resolve_warp(impl: str = "auto"):
    """Pick the warp backend: the Pallas kernel on TPU (50x the XLA gather
    there), the XLA formulation elsewhere (CPU tests, virtual meshes)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "corner"):
        # "corner" only changes the packed-uint8 training path (step.py);
        # the generic float-planes fallback is the same kernel either way
        import functools

        from baseboostdepth_tpu.ops.warp_pallas import bilinear_sample_pallas

        if jax.default_backend() != "tpu":
            # explicit pallas off-TPU = interpret mode (tests/dryruns that
            # want the production kernel path on a CPU mesh)
            return functools.partial(bilinear_sample_pallas, interpret=True)
        return bilinear_sample_pallas
    return bilinear_sample
