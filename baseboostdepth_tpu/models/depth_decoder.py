"""Monodepth2 U-Net depth decoder in Flax linen, NHWC.

Functional equivalent of the reference's networks/depth_decoder.py:11-58:
five up-stages of (3x3 reflect conv + ELU, nearest 2x upsample, skip concat,
3x3 reflect conv + ELU) with sigmoid disparity heads at scales 0-3.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.ops.phase_tail import depth_to_space2
from baseboostdepth_tpu.ops.resize import upsample2x_nearest

DEC_CHANNELS = (16, 32, 64, 128, 256)


def _packed_group(W: int, C: int) -> int:
    """Columns-per-cell for the packed conv path, or 0 for the direct conv.

    The decoder's fine scales (C <= 32 at W >= 320) run 3x3 convs at
    0.1-3% MFU because C occupies only C of the 128 vector lanes
    (tools/layer_probe.py); packing G columns into channels runs the same
    arithmetic at full lanes (ops/packed_conv.py; measured 2.3-2.6x
    fwd+wgrad at 192x640). CPU/interpret paths keep the direct conv -- the
    packed transform is exact, so this is purely a perf dispatch.
    BBD_PACKED_CONV=0 disables (A/B switch).
    """
    if os.environ.get("BBD_PACKED_CONV", "1") == "0":
        return 0
    if jax.default_backend() != "tpu":
        return 0
    if C <= 16 and W >= 320 and W % 8 == 0:
        return 8
    if C <= 32 and W >= 320 and W % 4 == 0:
        return 4
    # C<=64/G=2 at W>=160 measured -16% in-step (240->280 ms): C=64 already
    # fills half the lanes and the pack relayout swamps the win. Don't.
    return 0


#: process default for the phase tail, set from config by the entry points
#: (Trainer.__init__/bench.py via set_phase_tail) BEFORE any step is traced.
#: The gate is read at trace time, so it must not be flipped between jit
#: specializations of the same run.
_PHASE_TAIL_DEFAULT = False


def set_phase_tail(enabled: bool) -> None:
    """Set the process-wide phase-tail default (config plumbing).

    Call before tracing any step/eval fn; ModelConfig.resolved_phase_tail()
    supplies the measured per-zoo auto value."""
    global _PHASE_TAIL_DEFAULT
    _PHASE_TAIL_DEFAULT = bool(enabled)


def _phase_tail() -> bool:
    """Run the scale-0 tail in phase (space-to-depth) form on TPU.

    Exact transform (ops/phase_tail.py): both scale-0 convs run at half
    resolution with 4x the output channels and the 2x-upsampled tensor is
    never materialized. Default comes from set_phase_tail (config-resolved
    per zoo: measured +1.4% in-step on md2 at F=7,
    docs/results/bench_worst_phasetail_r5.json); the BBD_PHASE_TAIL env var
    overrides for A/Bs. 'force' enables off-TPU (CPU exactness tests)."""
    v = os.environ.get("BBD_PHASE_TAIL")
    if v == "force":
        return True
    if v is not None:
        return v == "1" and jax.default_backend() == "tpu"
    return _PHASE_TAIL_DEFAULT and jax.default_backend() == "tpu"


class ReflectConv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 conv; reference layers.py:118-133 (Conv3x3).

    Owns its kernel/bias under a child scope named "conv" (same tree as the
    previous nn.Conv child) and dispatches between the direct conv and the
    column-packed formulation (see _packed_group)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, phase: str | None = None):
        B, H, W, C = x.shape
        conv = _Conv3x3Core(self.features, dtype=self.dtype, name="conv")
        if phase is not None:
            # phase-domain execution (ops/phase_tail.py): x is the
            # half-res map (unpadded); the core edge-pads, which
            # reproduces the full-res reflect-pad-1 exactly. Same
            # kernel/bias params as the direct path.
            return conv(x, 0, phase=phase)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return conv(xp, _packed_group(W, C))


class _Conv3x3Core(nn.Module):
    """3x3 VALID conv params + direct/packed execution."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp, G: int, phase: str | None = None):
        C = xp.shape[-1] if phase != "s2d" else xp.shape[-1] // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, C, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        xp = xp.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if phase == "up":
            from baseboostdepth_tpu.ops.phase_tail import phase_upconv

            return phase_upconv(xp, k, bias.astype(self.dtype))
        if phase == "s2d":
            from baseboostdepth_tpu.ops.phase_tail import phase_s2dconv

            return phase_s2dconv(xp, k, bias.astype(self.dtype))
        if G:
            from baseboostdepth_tpu.ops.packed_conv import packed_conv3x3

            y = packed_conv3x3(xp, k, G=G)
        else:
            y = jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    """ReflectConv3x3 + ELU; reference layers.py:103-115."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, phase: str | None = None):
        return nn.elu(
            ReflectConv3x3(self.features, dtype=self.dtype, name="conv")(x, phase)
        )


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
            if i == 0 and 0 in self.scales and _phase_tail():
                # exact phase-domain tail: both convs at half res, no
                # upsampled tensor (ops/phase_tail.py); same params
                z = ConvBlock(DEC_CHANNELS[0], dtype=self.dtype, name="upconv_0_1")(
                    x, phase="up"
                )
                d = ReflectConv3x3(
                    self.num_output_channels, dtype=self.dtype, name="dispconv_0"
                )(z, phase="s2d")
                disps[0] = depth_to_space2(nn.sigmoid(d.astype(jnp.float32)))
                break
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(DEC_CHANNELS[i], dtype=self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                d = ReflectConv3x3(self.num_output_channels, dtype=self.dtype, name=f"dispconv_{i}")(x)
                disps[i] = nn.sigmoid(d.astype(jnp.float32))
        return tuple(disps[s] for s in sorted(disps))
