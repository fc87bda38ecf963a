"""ResNet encoder family (Monodepth2 zoo) in Flax linen, NHWC.

Functionally equivalent to the reference's networks/resnet_encoder.py:56-91
(torchvision ResNet 18/34/50/101/152, features tapped after relu1 and each
layer block) and the 2-image pose-encoder variant
(networks/resnet_encoder.py:12-53). Built TPU-first:

- NHWC layout so convs hit the MXU without layout transposes,
- BatchNorm statistics reduce over the full (possibly sharded) batch axis;
  under jit+NamedSharding the batch-mean reductions become cross-replica
  psums automatically, i.e. sync-BN comes for free,
- submodule names mirror torchvision state_dict keys (conv1, bn1,
  layer{n}.{m}.conv{k}, downsample.0/1) so pretrained torch checkpoints map
  mechanically (models/torch_import.py).

Input normalization (x - 0.45) / 0.225 matches the reference encoder
forward (networks/resnet_encoder.py:85).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

_BN_MOMENTUM = 0.9  # torch momentum 0.1 == flax momentum 0.9
_BN_EPS = 1e-5


def conv_kaiming_init():
    # torch kaiming_normal_(mode='fan_out', nonlinearity='relu')
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _Conv(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=conv_kaiming_init(),
            name="conv",
        )(x)


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=_BN_MOMENTUM,
            epsilon=_BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    """ResNet-18/34 block: 3x3 -> 3x3 with identity/projection skip."""

    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = _Conv(self.features, 3, self.stride, 1, dtype=self.dtype, name="conv1")(x)
        y = _BN(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = _Conv(self.features, 3, 1, 1, dtype=self.dtype, name="conv2")(y)
        y = _BN(dtype=self.dtype, name="bn2")(y, train)
        if self.downsample:
            identity = _Conv(self.features, 1, self.stride, 0, dtype=self.dtype, name="downsample_conv")(x)
            identity = _BN(dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """ResNet-50+ block: 1x1 -> 3x3(stride) -> 1x1(x4), torchvision v1.5
    stride placement (stride on the 3x3)."""

    features: int  # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = _Conv(self.features, 1, 1, 0, dtype=self.dtype, name="conv1")(x)
        y = _BN(dtype=self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = _Conv(self.features, 3, self.stride, 1, dtype=self.dtype, name="conv2")(y)
        y = _BN(dtype=self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = _Conv(self.features * 4, 1, 1, 0, dtype=self.dtype, name="conv3")(y)
        y = _BN(dtype=self.dtype, name="bn3")(y, train)
        if self.downsample:
            identity = _Conv(self.features * 4, 1, self.stride, 0, dtype=self.dtype, name="downsample_conv")(x)
            identity = _BN(dtype=self.dtype, name="downsample_bn")(identity, train)
        return nn.relu(y + identity)


_LAYER_SPECS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


def encoder_channels(num_layers: int) -> Sequence[int]:
    """Feature channels of the 5 taps; reference
    networks/resnet_encoder.py:63,88 ([64,64,128,256,512], x4 above 34)."""
    base = [64, 64, 128, 256, 512]
    if num_layers > 34:
        return [base[0]] + [c * 4 for c in base[1:]]
    return base


class ResnetEncoder(nn.Module):
    """Multi-scale feature encoder.

    __call__(images [B, H, W, 3*num_input_images]) -> list of 5 feature maps
    at strides [2, 4, 8, 16, 32].
    """

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls, counts = _LAYER_SPECS[self.num_layers]

        x = (x - 0.45) / 0.225

        x = _Conv(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        x = _BN(dtype=self.dtype, name="bn1")(x, train)
        f0 = nn.relu(x)

        x = jnp.pad(f0, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        feats = [f0]
        widths = (64, 128, 256, 512)
        for li, (w, n) in enumerate(zip(widths, counts), start=1):
            for bi in range(n):
                stride = 2 if (bi == 0 and li > 1) else 1
                expansion = 4 if block_cls is Bottleneck else 1
                needs_ds = bi == 0 and (stride != 1 or x.shape[-1] != w * expansion)
                x = block_cls(
                    w,
                    stride=stride,
                    downsample=needs_ds,
                    dtype=self.dtype,
                    name=f"layer{li}_{bi}",
                )(x, train)
            feats.append(x)
        return feats
