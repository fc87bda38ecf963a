"""CADepth: ResNet-50 encoder + Monodepth2 decoder with channel-attention
modules.

Functional equivalent of networksCA/ (trainer.py:68-75):
- SPM, Structure Perception Module (networksCA/spm.py:4-30): channel-wise
  self-attention on the bottleneck -- C x C energy via batched matmul,
  max-subtracted softmax, residual.
- DEM, Detail Emphasis Module (networksCA/dem.py:4-31): reflect conv + BN +
  ReLU, then a global-pooled 2-layer 1x1 gate, out + out * gate.
- Decoder wiring (networksCA/depth_decoder.py:12-66): MD2 U-Net with SPM at
  the bottleneck and a DEM after every skip concat.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.models.depth_decoder import DEC_CHANNELS, ConvBlock, ReflectConv3x3
from baseboostdepth_tpu.models.resnet import ResnetEncoder, encoder_channels
from baseboostdepth_tpu.ops.resize import upsample2x_nearest


class SPM(nn.Module):
    """Channel self-attention with max-subtracted softmax + residual."""

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        flat = x.reshape(B, H * W, C)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat)  # [B, C, C]
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy_new.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(B, H, W, C)
        return out + x


class DEM(nn.Module):
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = nn.Conv(self.channels, (3, 3), padding="VALID", dtype=self.dtype, name="conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="gate1")(g)
        g = nn.relu(g)
        g = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="gate2")(g)
        g = nn.sigmoid(g)
        return y + y * g


class CADecoder(nn.Module):
    num_ch_enc: Sequence[int]
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool) -> Tuple[jnp.ndarray, ...]:
        x = SPM(name="spm")(features[-1])
        disps = {}
        for i in range(4, -1, -1):
            x = ConvBlock(DEC_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = DEM(x.shape[-1], dtype=self.dtype, name=f"dem_{i}")(x, train)
            x = ConvBlock(DEC_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in (0, 1, 2, 3):
                d = ReflectConv3x3(self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}")(x)
                disps[i] = nn.sigmoid(d.astype(jnp.float32))
        return tuple(disps[s] for s in sorted(disps))


class CADepthNet(nn.Module):
    """ResNet-50 encoder + CA decoder (trainer.py:70-71)."""

    num_layers: int = 50
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResnetEncoder(num_layers=self.num_layers, dtype=self.dtype, name="encoder")(
            x, train=train
        )
        return CADecoder(
            encoder_channels(self.num_layers), dtype=self.dtype, name="decoder"
        )(feats, train)
