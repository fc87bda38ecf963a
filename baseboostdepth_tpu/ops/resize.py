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
