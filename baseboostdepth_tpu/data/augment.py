"""Device-side photometric augmentation (color jitter) and flips.

The reference jitters on the host with torchvision ColorJitter
(mono_dataset.py:124-128: brightness/contrast/saturation 0.8-1.2, hue +-0.1,
drawn per frame, applied with p=0.5 per sample). Host-side jitter costs CPU
and doubles the host->device transfer (color + color_aug). Here the host
ships ONE uint8 frame stack plus a tiny [B, NF, 4] parameter tensor and the
device derives color_aug inside the train step -- the jitter fuses into the
/255 normalization pass.

Formulas follow torchvision.transforms.functional (blend-with-mean for
contrast, blend-with-grayscale for saturation, HSV hue rotation), applied in
the fixed order brightness -> contrast -> saturation -> hue (torchvision
randomizes the order; the distributional difference is negligible and a
fixed order keeps the kernel branch-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R 601 luma weights (torchvision rgb_to_grayscale).
_LUMA = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    """[..., 3] RGB in [0,1] -> HSV in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)

    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = (i.astype(jnp.int32) % 6)[..., None]

    rgb = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [
            jnp.stack([v, t, p], -1),
            jnp.stack([q, v, p], -1),
            jnp.stack([p, v, t], -1),
            jnp.stack([p, q, v], -1),
            jnp.stack([t, p, v], -1),
            jnp.stack([v, p, q], -1),
        ],
    )
    return rgb


def color_jitter(img: jax.Array, params: jax.Array) -> jax.Array:
    """Apply (brightness, contrast, saturation, hue) jitter.

    Args:
      img: [..., H, W, 3] float in [0, 1].
      params: [..., 4] broadcastable factors (b, c, s) multiplicative around
        1.0 and hue shift h in [-0.5, 0.5]. (1, 1, 1, 0) is identity.
    """
    dt = img.dtype
    params = params.astype(dt)
    b = params[..., 0][..., None, None, None]
    c = params[..., 1][..., None, None, None]
    s = params[..., 2][..., None, None, None]
    h = params[..., 3][..., None, None]

    x = jnp.clip(img * b, 0.0, 1.0)

    gray = jnp.einsum("...c,c->...", x, _LUMA.astype(dt))[..., None]
    mean_gray = jnp.mean(gray, axis=(-3, -2), keepdims=True)
    x = jnp.clip(x * c + mean_gray * (1.0 - c), 0.0, 1.0)

    x = jnp.clip(x * s + gray * (1.0 - s), 0.0, 1.0)

    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 0].set((hsv[..., 0] + h) % 1.0)
    return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)


def sample_jitter_params(
    rng: np.random.Generator, batch: int, num_frames: int
) -> np.ndarray:
    """Host-side draw of per-(sample, frame) jitter params, identity with
    p=0.5 per sample (reference mono_dataset.py:77,124-128)."""
    p = np.ones((batch, num_frames, 4), dtype=np.float32)
    p[..., 3] = 0.0
    do_aug = rng.random(batch) > 0.5
    bcs = rng.uniform(0.8, 1.2, size=(batch, num_frames, 3)).astype(np.float32)
    hue = rng.uniform(-0.1, 0.1, size=(batch, num_frames)).astype(np.float32)
    p[do_aug, :, :3] = bcs[do_aug]
    p[do_aug, :, 3] = hue[do_aug]
    return p


def apply_flip(frames: jax.Array, flip: jax.Array) -> jax.Array:
    """Per-sample horizontal flip: frames [B, ..., H, W, C], flip [B] bool."""
    flipped = frames[..., ::-1, :]
    extra = frames.ndim - 1
    return jnp.where(flip.reshape((-1,) + (1,) * extra), flipped, frames)
