"""Model zoo registry.

The reference selects a depth network by CLI flag (trainer.py:52-91):
default Monodepth2 ResNet, --ViT MonoViT, --SQL SQLdepth, --CA_depth CADepth,
--DIFFNet DIFFNet/HRNet; the pose pair is always ResNet-18 2-frame + pose
head (trainer.py:94-103). Same surface here, keyed by `zoo` string.

Every depth network obeys one contract:
    module(images [B, H, W, 3], train) -> tuple of disparity maps,
    finest first, disp_s at 1/2^s resolution, sigmoid in [0, 1]
    (SQLdepth returns metric depth instead -- flagged via DEPTH_IS_METRIC).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.models.resnet import ResnetEncoder, encoder_channels  # noqa: F401
from baseboostdepth_tpu.models.depth_decoder import DepthDecoder
from baseboostdepth_tpu.models.pose import PoseNet, PoseDecoder  # noqa: F401

#: zoos whose "disparity" output is already metric depth (SQLdepth;
#: reference special-cases trainer.py:303-306, 457-459).
DEPTH_IS_METRIC = frozenset({"sql", "sql_large"})


class MD2DepthNet(nn.Module):
    """Monodepth2: ResNet encoder + U-Net decoder (the default zoo)."""

    num_layers: int = 18
    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = ResnetEncoder(num_layers=self.num_layers, dtype=self.dtype, name="encoder")(
            x, train=train
        )
        return DepthDecoder(scales=tuple(self.scales), dtype=self.dtype, name="decoder")(feats)


def build_depth_net(
    zoo: str = "md2",
    num_layers: int = 18,
    scales: Sequence[int] = (0, 1, 2, 3),
    dtype: Any = jnp.float32,
) -> nn.Module:
    """Build a depth network by zoo name ('md2', 'monovit', 'sql', 'cadepth',
    'diffnet')."""
    zoo = zoo.lower()
    if zoo == "md2":
        return MD2DepthNet(num_layers=num_layers, scales=scales, dtype=dtype)
    if zoo == "monovit":
        from baseboostdepth_tpu.models.monovit import MonoViTDepthNet

        return MonoViTDepthNet(scales=tuple(scales), dtype=dtype)
    if zoo in ("sql", "sql_large"):
        from baseboostdepth_tpu.models.sql import SQLDepthNet

        return SQLDepthNet(large=(zoo == "sql_large"), dtype=dtype)
    if zoo == "cadepth":
        from baseboostdepth_tpu.models.cadepth import CADepthNet

        return CADepthNet(scales=tuple(scales), dtype=dtype)
    if zoo == "diffnet":
        from baseboostdepth_tpu.models.diffnet import DIFFNetDepthNet

        return DIFFNetDepthNet(scales=tuple(scales), dtype=dtype)
    raise ValueError(f"unknown zoo: {zoo}")


def build_pose_net(dtype: Any = jnp.float32) -> nn.Module:
    return PoseNet(dtype=dtype)
