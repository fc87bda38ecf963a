"""Pose network: 2-frame ResNet-18 encoder + pose regression head.

Functional equivalent of the reference's pose pair (trainer.py:94-103):
a ResNet-18 with 6-channel input (networks/resnet_encoder.py:12-53) feeding
PoseDecoder (networks/pose_decoder.py:9-48): 1x1 squeeze to 256, three convs,
global mean pool, 0.01-scaled (axisangle, translation) for 2 frames.

Every pose pair in a step is stacked onto the leading batch axis before the
single encoder call, so incremental/partial/direct pose estimation for all
frame offsets costs ONE big batched conv stack on the MXU instead of the
reference's many small per-subset launches (trainer.py:348-418).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.models.resnet import ResnetEncoder


class PoseDecoder(nn.Module):
    """Regress (axisangle, translation) from the last encoder feature map.

    Returns ([B, num_frames, 3], [B, num_frames, 3]); the training path uses
    frame index 0, mirroring the reference's axisangle[:, 0] / translation[:, 0]
    (trainer.py:358-360).
    """

    num_frames_to_predict_for: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, last_feature) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(last_feature)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="pose_0")(x)
        x = nn.relu(x)
        x = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="pose_1")(x)
        x = nn.relu(x)
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1), dtype=self.dtype, name="pose_2")(x)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global average pool
        x = 0.01 * x.reshape(x.shape[0], self.num_frames_to_predict_for, 6)
        return x[..., :3], x[..., 3:]


class PoseNet(nn.Module):
    """ResNet-18 two-image encoder + PoseDecoder, one module.

    __call__(pair [B, H, W, 6]) -> (axisangle [B, 3], translation [B, 3])
    for the first predicted frame.
    """

    num_layers: int = 18
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pair, train: bool = False):
        feats = ResnetEncoder(
            num_layers=self.num_layers,
            num_input_images=2,
            dtype=self.dtype,
            name="encoder",
        )(pair, train=train)
        aa, t = PoseDecoder(dtype=self.dtype, name="decoder")(feats[-1])
        return aa[:, 0], t[:, 0]
