"""Monodepth2 U-Net depth decoder in Flax linen, NHWC.

Functional equivalent of the reference's networks/depth_decoder.py:11-58:
five up-stages of (3x3 reflect conv + ELU, nearest 2x upsample, skip concat,
3x3 reflect conv + ELU) with sigmoid disparity heads at scales 0-3.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.ops.resize import upsample2x_nearest

DEC_CHANNELS = (16, 32, 64, 128, 256)


class ReflectConv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 conv; reference layers.py:118-133 (Conv3x3)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype, name="conv")(x)


class ConvBlock(nn.Module):
    """ReflectConv3x3 + ELU; reference layers.py:103-115."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(ReflectConv3x3(self.features, dtype=self.dtype, name="conv")(x))


class DepthDecoder(nn.Module):
    """U-Net decoder over 5 encoder feature maps.

    __call__(features) -> tuple of sigmoid disparity maps (disp_0 .. disp_3),
    disp_s at 1/2^s of the input resolution, finest first.
    """

    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features) -> Tuple[jnp.ndarray, ...]:
        x = features[-1]
        disps = {}
        for i in range(4, -1, -1):
            x = ConvBlock(DEC_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(DEC_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                d = ReflectConv3x3(self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}")(x)
                disps[i] = nn.sigmoid(d.astype(jnp.float32))
        return tuple(disps[s] for s in sorted(disps))
