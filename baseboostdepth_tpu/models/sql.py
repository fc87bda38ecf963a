"""SQLdepth: ResNet-50 encoder-decoder + Self-Query-Layer transformer head.

Functional equivalent of the reference networksSQL/ package as reached by
the trainer (trainer.py:60-67):
- ResnetEncoderDecoder (networksSQL/resnet_encoder.py:143-150): ResNet-50
  features + BN U-Net (DecoderBN, :113-140) -> dense model_dim=32 feature
  map at H/2 (bilinear align_corners=True upsampling between stages).
- Lite_Depth_Decoder_QueryTr (networksSQL/lite_depth_decoder_QTR.py:6-74):
  16x16 patch embedding + learned positional encodings (500 slots), a
  4-layer post-LN transformer encoder (d=32, 4 heads, ff=512, dropout 0.1),
  64 queries; FullQueryLayer (networksSQL/layers.py:4-21) computes softmax
  energy maps + query summaries; a bins regressor turns summaries into
  adaptive depth-bin widths (cumsum -> centers); softmax(prob) . centers is
  METRIC DEPTH directly (min 0.001, max 80) -- the zoo's "disp" output is
  depth, which the trainer/eval special-case via DEPTH_IS_METRIC.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from baseboostdepth_tpu.models.resnet import ResnetEncoder
from baseboostdepth_tpu.ops.resize import resize_bilinear_align_corners


class UpSampleBN(nn.Module):
    """Bilinear(align_corners=True) upsample to skip size + concat + 2x
    (conv3x3 + BN + LeakyReLU)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool):
        B, Hs, Ws, _ = skip.shape
        # align_corners=True bilinear, as in the torch UpSampleBN
        x = resize_bilinear_align_corners(x, Hs, Ws)
        x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=f"bn{i}")(x)
            x = nn.leaky_relu(x, 0.01)
        return x


class DecoderBN(nn.Module):
    num_features: int = 256
    model_dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool):
        f = self.num_features
        x = nn.Conv(f, (1, 1), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(feats[4])
        x = UpSampleBN(f // 2, dtype=self.dtype, name="up1")(x, feats[3], train)
        x = UpSampleBN(f // 4, dtype=self.dtype, name="up2")(x, feats[2], train)
        x = UpSampleBN(f // 8, dtype=self.dtype, name="up3")(x, feats[1], train)
        x = UpSampleBN(f // 16, dtype=self.dtype, name="up4")(x, feats[0], train)
        return nn.Conv(self.model_dim, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3")(x)


class TransformerLayer(nn.Module):
    """torch nn.TransformerEncoderLayer parity: post-LN, relu FF,
    dropout 0.1."""

    dim: int
    heads: int
    ff: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        # torch nn.TransformerEncoderLayer's MultiheadAttention drops the
        # attention *weights* (softmax output) at the same rate; flax's
        # dropout_rate has those semantics exactly
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="attn",
        )(x, x)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + att)
        y = nn.Dense(self.ff, dtype=self.dtype, name="ff1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ff2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + y)


class SQLHead(nn.Module):
    """Self Query Layer + adaptive bins head -> metric depth at input res."""

    in_channels: int = 32
    embedding_dim: int = 32
    patch_size: int = 16
    num_heads: int = 4
    query_nums: int = 64
    dim_out: int = 64
    ff_dim: int = 512
    min_val: float = 0.001
    max_val: float = 80.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x0, train: bool):
        B, H, W, C = x0.shape
        E = self.embedding_dim

        emb = nn.Conv(
            E, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="embedding_conv",
        )(x0)
        N = emb.shape[1] * emb.shape[2]
        assert N >= self.query_nums, (
            f"SQL head needs >= {self.query_nums} patch tokens, got {N}; "
            f"input resolution too small (reference runs 192x640 -> 120 tokens)"
        )
        tokens = emb.reshape(B, N, E)
        pos = self.param("positional_encodings", nn.initializers.uniform(1.0), (500, E))
        tokens = tokens + pos[None, :N, :]

        for i in range(4):
            tokens = TransformerLayer(
                E, self.num_heads, self.ff_dim, dtype=self.dtype, name=f"layer{i}"
            )(tokens, train)

        queries = tokens[:, : self.query_nums]  # [B, Q, E]

        feat = nn.Conv(E, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3x3")(x0)
        flat = feat.reshape(B, H * W, E)

        # FullQueryLayer (networksSQL/layers.py:4-21)
        energy = jnp.einsum("bne,bqe->bnq", flat, queries)  # [B, HW, Q]
        attn = nn.softmax(energy.astype(jnp.float32), axis=1).astype(energy.dtype)
        summary = jnp.einsum("bnq,bne->bqe", attn, flat)  # [B, Q, E]
        energy_maps = energy.reshape(B, H, W, self.query_nums)

        y = summary.reshape(B, self.query_nums * E)
        y = nn.Dense(16 * self.query_nums, dtype=self.dtype, name="bins1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Dense(16 * 16, dtype=self.dtype, name="bins2")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Dense(self.dim_out, dtype=self.dtype, name="bins3")(y)

        y = nn.relu(y.astype(jnp.float32)) + 0.1  # norm='linear' branch
        y = y / jnp.sum(y, axis=1, keepdims=True)

        prob = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="convert_to_prob")(energy_maps)
        prob = nn.softmax(prob.astype(jnp.float32), axis=-1)

        bin_widths = (self.max_val - self.min_val) * y
        bin_widths = jnp.pad(bin_widths, ((0, 0), (1, 0)), constant_values=self.min_val)
        bin_edges = jnp.cumsum(bin_widths, axis=1)
        centers = 0.5 * (bin_edges[:, :-1] + bin_edges[:, 1:])  # [B, dim_out]

        depth = jnp.sum(prob * centers[:, None, None, :], axis=-1, keepdims=True)
        return depth  # [B, H, W, 1] metric depth


class SQLDepthNet(nn.Module):
    """SQLdepth zoo: output tuple has ONE map (metric depth at H/2); the
    trainer runs SQL with scales=(0,) (trainer.py:209-212)."""

    large: bool = False
    num_layers: int = 50
    scales: Sequence[int] = (0,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        feats = ResnetEncoder(num_layers=self.num_layers, dtype=self.dtype, name="encoder")(
            x, train=train
        )
        dense = DecoderBN(num_features=256, model_dim=32, dtype=self.dtype, name="decoder_bn")(
            feats, train
        )
        if self.large:
            head = SQLHead(
                patch_size=20, dim_out=128, query_nums=128, dtype=self.dtype, name="head"
            )
        else:
            head = SQLHead(dtype=self.dtype, name="head")
        depth = head(dense, train)
        return (depth, depth, depth, depth)  # scales>0 unused for SQL
