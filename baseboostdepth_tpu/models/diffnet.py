"""DIFFNet: HRNet-18 encoder (parallel multi-resolution streams with
cross-resolution fusion) + attention-fusion depth decoder.

Functional equivalent of networksDIFF/ as reached by the trainer
(trainer.py:76-83):
- HRNet-18 (networksDIFF/test_hr_encoder.py:295-497, stage spec
  networksDIFF/hrnet_config.py HRNET_18): 2x stride-2 stem, stage1 = 4
  Bottleneck(64), stages 2-4 grow branches [18, 36, 72, 144] of BasicBlocks
  with SUM fusion (1x1 conv + bilinear align_corners=True up for coarse ->
  fine, stride-2 3x3 chains for fine -> coarse).
- Forward returns per-resolution feature LISTS accumulated across stages
  (test_hr_encoder.py:440-496): [stem_relu1] + [list18(4), list36(3),
  list72(2), x144].
- HRDepthDecoder (networksDIFF/HR_Depth_Decoder.py:10-62): four
  Attention_Module fusions (upsample-high + concat-lows + channel attention
  + 3x3 conv, hr_layers.py:443-467) + 2 upconvs, disp heads at strides
  [1, 2, 4, 8].
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.models.depth_decoder import (
    ConvBlock,
    ReflectConv3x3,
    _phase_tail,
)
from baseboostdepth_tpu.ops.phase_tail import depth_to_space2
from baseboostdepth_tpu.models.monovit import ChannelAttention
from baseboostdepth_tpu.models.resnet import BasicBlock, Bottleneck, _BN, _Conv
from baseboostdepth_tpu.ops.resize import upsample2x_nearest

HRNET18_STAGES = dict(
    stage2=dict(modules=1, branches=2, blocks=4, channels=(18, 36)),
    stage3=dict(modules=4, branches=3, blocks=4, channels=(18, 36, 72)),
    stage4=dict(modules=3, branches=4, blocks=4, channels=(18, 36, 72, 144)),
)


from baseboostdepth_tpu.ops.resize import resize_bilinear_align_corners as _resize_bilinear_ac


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = _Conv(self.features, self.kernel, self.stride, pad, dtype=self.dtype, name="conv")(x)
        x = _BN(dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x) if self.relu else x


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch BasicBlock stacks + SUM fuse."""

    channels: Tuple[int, ...]
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        n = len(self.channels)
        ys = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                needs_ds = b == 0 and x.shape[-1] != self.channels[i]
                x = BasicBlock(
                    self.channels[i], stride=1, downsample=needs_ds,
                    dtype=self.dtype, name=f"branch{i}_block{b}",
                )(x, train)
            ys.append(x)

        fused = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    v = ys[j]
                elif j > i:
                    v = _Conv(self.channels[i], 1, 1, 0, dtype=self.dtype, name=f"fuse{i}_{j}_conv")(ys[j])
                    v = _BN(dtype=self.dtype, name=f"fuse{i}_{j}_bn")(v, train)
                    v = _resize_bilinear_ac(v, ys[i].shape[1], ys[i].shape[2])
                else:
                    v = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        v = ConvBNRelu(
                            out_ch, 3, 2, relu=not last, dtype=self.dtype,
                            name=f"fuse{i}_{j}_down{k}",
                        )(v, train)
                acc = v if acc is None else acc + v
            fused.append(nn.relu(acc))
        return fused


class HRNetEncoder(nn.Module):
    """HRNet-18 returning DIFFNet's stage-accumulated feature lists.

    __call__ -> (f_stem_half, list18, list36, list72, f144): f_stem_half
    [B,H/2,W/2,64]; list18 = 4 maps at H/4; list36 = 3 at H/8; list72 = 2 at
    H/16; f144 at H/32.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = (x - 0.45) / 0.225
        x = ConvBNRelu(64, 3, 2, dtype=self.dtype, name="stem1")(x, train)
        f_half = x
        x = ConvBNRelu(64, 3, 2, dtype=self.dtype, name="stem2")(x, train)
        stem_quarter = x
        list18: List[jnp.ndarray] = [stem_quarter]
        list36: List[jnp.ndarray] = []
        list72: List[jnp.ndarray] = []

        # stage 1: 4 Bottleneck(64) -> 256 channels
        for b in range(4):
            x = Bottleneck(64, stride=1, downsample=(b == 0), dtype=self.dtype, name=f"layer1_{b}")(x, train)

        # transitions + stages
        spec2 = HRNET18_STAGES["stage2"]
        xs = [
            ConvBNRelu(spec2["channels"][0], 3, 1, dtype=self.dtype, name="tr1_0")(x, train),
            ConvBNRelu(spec2["channels"][1], 3, 2, dtype=self.dtype, name="tr1_1")(x, train),
        ]
        for m in range(spec2["modules"]):
            xs = HRModule(spec2["channels"], dtype=self.dtype, name=f"stage2_m{m}")(xs, train)
        list18.append(xs[0])
        list36.append(xs[1])

        spec3 = HRNET18_STAGES["stage3"]
        xs = xs + [ConvBNRelu(spec3["channels"][2], 3, 2, dtype=self.dtype, name="tr2_2")(xs[-1], train)]
        for m in range(spec3["modules"]):
            xs = HRModule(spec3["channels"], dtype=self.dtype, name=f"stage3_m{m}")(xs, train)
        list18.append(xs[0])
        list36.append(xs[1])
        list72.append(xs[2])

        spec4 = HRNET18_STAGES["stage4"]
        xs = xs + [ConvBNRelu(spec4["channels"][3], 3, 2, dtype=self.dtype, name="tr3_3")(xs[-1], train)]
        for m in range(spec4["modules"]):
            xs = HRModule(spec4["channels"], dtype=self.dtype, name=f"stage4_m{m}")(xs, train)
        list18.append(xs[0])
        list36.append(xs[1])
        list72.append(xs[2])

        return f_half, list18, list36, list72, xs[3]


class AttentionFuse(nn.Module):
    """upsample(high) + concat(lows) -> ChannelAttention -> 3x3 conv+relu
    (root hr_layers.py:443-467 Attention_Module)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, high, lows: Sequence[jnp.ndarray]):
        feats = jnp.concatenate([upsample2x_nearest(high)] + list(lows), axis=-1)
        feats = ChannelAttention(feats.shape[-1], dtype=self.dtype, name="ca")(feats)
        feats = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_se")(feats)
        return nn.relu(feats)


class DIFFNetDepthNet(nn.Module):
    """HRNet-18 encoder + attention-fusion decoder; disp tuple finest-first
    at strides [1, 2, 4, 8]."""

    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f_half, list18, list36, list72, f144 = HRNetEncoder(dtype=self.dtype, name="encoder")(
            x, train=train
        )
        x72 = AttentionFuse(256, dtype=self.dtype, name="att72")(f144, list72)
        x36 = AttentionFuse(128, dtype=self.dtype, name="att36")(x72, list36)
        x18 = AttentionFuse(64, dtype=self.dtype, name="att18")(x36, list18)
        x9 = AttentionFuse(32, dtype=self.dtype, name="att9")(x18, [f_half])
        x6 = ConvBlock(16, dtype=self.dtype, name="up_x9_0")(x9)

        def head(name, y):
            d = ReflectConv3x3(1, dtype=self.dtype, name=name)(y)
            return nn.sigmoid(d.astype(jnp.float32))

        if _phase_tail():
            # exact phase-domain scale-0 tail (ops/phase_tail.py): same
            # up_x9_1/dispconv0 params, both convs at half res
            z = ConvBlock(16, dtype=self.dtype, name="up_x9_1")(x6, phase="up")
            d = ReflectConv3x3(1, dtype=self.dtype, name="dispconv0")(z, phase="s2d")
            d0 = depth_to_space2(nn.sigmoid(d.astype(jnp.float32)))
        else:
            x6 = ConvBlock(16, dtype=self.dtype, name="up_x9_1")(upsample2x_nearest(x6))
            d0 = head("dispconv0", x6)

        return (
            d0,
            head("dispconv1", x9),
            head("dispconv2", x18),
            head("dispconv3", x36),
        )
