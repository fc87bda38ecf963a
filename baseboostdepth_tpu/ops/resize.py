"""Image resizing ops: bilinear (torch F.interpolate parity), nearest 2x
upsample (decoder), and the device-side LANCZOS pyramid that replaces the
reference's host-side PIL resize cascade (mono_dataset.py:187-204).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x spatial upsample of an NHWC tensor.

    Parity: reference layers.py:197-200 (F.interpolate scale_factor=2
    mode=nearest used throughout the U-Net decoders).
    """
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize with align_corners=False (half-pixel) semantics.

    Matches torch F.interpolate(mode="bilinear", align_corners=False), the
    variant the reference uses to upsample disparities to full resolution
    (trainer.py:456) and predictions to GT resolution (trainer.py:580,598).
    jax.image.resize "linear" uses the same half-pixel convention.
    """
    B = x.shape[0]
    C = x.shape[-1]
    return jax.image.resize(x, (B, height, width, C), method="linear", antialias=False)


def resize_lanczos(x: jax.Array, height: int, width: int) -> jax.Array:
    """Lanczos-3 resize (PIL Image.LANCZOS equivalent, antialiased)."""
    B = x.shape[0]
    C = x.shape[-1]
    return jax.image.resize(x, (B, height, width, C), method="lanczos3", antialias=True)


@functools.partial(jax.jit, static_argnames=("num_scales",))
def lanczos_pyramid(x: jax.Array, num_scales: int = 4):
    """Cascaded /2 Lanczos pyramid of an NHWC image: [x, x/2, x/4, x/8, ...].

    The reference builds each scale by LANCZOS-resizing the *previous* scale
    on the host (mono_dataset.py:190-192). Same cascade, on device.
    """
    out = [x]
    for _ in range(1, num_scales):
        prev = out[-1]
        out.append(resize_lanczos(prev, prev.shape[1] // 2, prev.shape[2] // 2))
    return out


def resize_bilinear_align_corners(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize with align_corners=True (torch F.interpolate
    align_corners=True): endpoints map to endpoints. Used by the SQLdepth
    BN decoder (networksSQL/resnet_encoder.py:108) and the HRNet fuse
    layers (networksDIFF/test_hr_encoder.py:276-281)."""
    B, H, W, C = x.shape
    if (H, W) == (height, width):
        return x
    ys = jnp.linspace(0.0, H - 1.0, height)
    xs = jnp.linspace(0.0, W - 1.0, width)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wy = (ys - y0)[None, :, None, None]
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wx = (xs - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy
