"""Device-side color-jitter parity vs PIL ImageEnhance / colorsys oracles
(the reference jitters via torchvision, whose formulas mirror PIL)."""

import colorsys

import numpy as np
import jax.numpy as jnp
from PIL import Image, ImageEnhance

from baseboostdepth_tpu.data.augment import (
    apply_flip,
    color_jitter,
    hsv_to_rgb,
    rgb_to_hsv,
)


def _rand_img(rng, h, w):
    return rng.random((h, w, 3)).astype(np.float32)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    x = _rand_img(rng, 16, 16)
    y = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_hsv_matches_colorsys():
    rng = np.random.default_rng(1)
    x = _rand_img(rng, 4, 5)
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(x)))
    for i in range(4):
        for j in range(5):
            h, s, v = colorsys.rgb_to_hsv(*x[i, j])
            np.testing.assert_allclose(hsv[i, j], [h, s, v], atol=1e-5)


def test_identity_params_noop():
    rng = np.random.default_rng(2)
    x = _rand_img(rng, 8, 8)
    p = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    y = np.asarray(color_jitter(jnp.asarray(x), p))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_brightness_matches_pil():
    rng = np.random.default_rng(3)
    x = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    factor = 0.85
    ref = np.asarray(ImageEnhance.Brightness(Image.fromarray(x)).enhance(factor))
    p = jnp.asarray([factor, 1.0, 1.0, 0.0])
    ours = np.asarray(color_jitter(jnp.asarray(x / 255.0), p)) * 255
    np.testing.assert_allclose(ours, ref, atol=1.0)  # PIL quantizes to uint8


def test_saturation_matches_pil():
    rng = np.random.default_rng(4)
    x = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    factor = 1.15
    ref = np.asarray(ImageEnhance.Color(Image.fromarray(x)).enhance(factor))
    p = jnp.asarray([1.0, 1.0, factor, 0.0])
    ours = np.asarray(color_jitter(jnp.asarray(x / 255.0), p)) * 255
    # PIL computes the grayscale in uint8 (rounding); allow 2/255
    np.testing.assert_allclose(ours, ref, atol=2.0)


def test_flip():
    rng = np.random.default_rng(5)
    x = rng.random((2, 3, 4, 6, 3)).astype(np.float32)
    flip = jnp.asarray([True, False])
    y = np.asarray(apply_flip(jnp.asarray(x), flip))
    np.testing.assert_allclose(y[0], x[0, :, :, ::-1, :])
    np.testing.assert_allclose(y[1], x[1])
