"""MonoViT: MPViT (Multi-Path ViT) encoder + HRDepth-style nested decoder,
in Flax linen, NHWC.

Functional equivalent of the reference networksvit/ package:
- MPViT-small encoder (networksvit/mpvit.py:602-726, 794-821): stride-2+1
  conv stem (features at H/2 -- the vendored MonoViT stem, not upstream
  MPViT's H/4), then 4 stages of {sequential depthwise patch embeds (first
  stride 2) -> parallel MHCA transformer paths + conv ResBlock ->
  concat-aggregate}. paths [2,3,3,3], layers [1,3,6,3], dims
  [64,128,216,288], mlp ratio 4, 8 heads, drop-path 0.2.
- Factorized attention (mpvit.py:333-393): softmax(K, axis=tokens)^T V then
  Q @ (K^T V) -- two MXU einsums, linear in token count -- plus the
  convolutional relative position encoding (mpvit.py:262-330: depthwise
  convs over V with window splits {3:2, 5:3, 7:3} heads, gated by Q) and a
  shared depthwise conv positional encoding (mpvit.py:241-259).
- HR decoder (networksvit/hr_decoder.py:10-125): 4 channel-attention fusion
  heads, dense X_ij lattice with fSE attention at {31,22,13,04}, disp heads
  at scales 0-3.

The mmcv/mmseg/timm scaffolding of the reference is dropped: norm layers are
plain BatchNorm, drop-path is a broadcast Dropout on the residual branch
(timm-equivalent scaling), and the backbone registry is our zoo registry.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from baseboostdepth_tpu.models.depth_decoder import (
    ConvBlock,
    ReflectConv3x3,
    _phase_tail,
)
from baseboostdepth_tpu.ops.phase_tail import depth_to_space2
from baseboostdepth_tpu.ops.resize import upsample2x_nearest

_BN = dict(momentum=0.9, epsilon=1e-5)


class ConvBN(nn.Module):
    """conv (no bias) + BN + optional activation (mpvit.py Conv2d_BN)."""

    features: int
    kernel: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    act: str = "none"  # none | hardswish
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn", **_BN)(x)
        if self.act == "hardswish":
            x = nn.hard_swish(x)
        return x


class DWPatchEmbed(nn.Module):
    """Depthwise-separable 3x3 patch embed (mpvit.py DWConv2d_BN /
    DWCPatchEmbed): dw conv -> pw conv -> BN -> hardswish."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), feature_group_count=self.features,
            use_bias=False, dtype=self.dtype, name="dwconv",
        )(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pwconv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn", **_BN)(x)
        return nn.hard_swish(x)


class ConvPosEnc(nn.Module):
    """Shared depthwise 3x3 positional encoding with residual."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        p = nn.Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.dim, dtype=self.dtype, name="proj",
        )(x)
        return x + p


class ConvRelPosEnc(nn.Module):
    """Convolutional relative position encoding: depthwise convs over V with
    per-head-group windows, gated elementwise by Q (mpvit.py:262-330)."""

    head_dim: int
    num_heads: int
    windows: Tuple[Tuple[int, int], ...] = ((3, 2), (5, 3), (7, 3))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, v, H: int, W: int):
        # q, v: [B, h, N, Ch] -> spatial [B, H, W, h*Ch]
        B, h, N, Ch = q.shape
        v_img = jnp.moveaxis(v, 1, -2).reshape(B, H, W, h * Ch)
        outs = []
        c0 = 0
        for wi, (win, heads) in enumerate(self.windows):
            ch = heads * Ch
            sl = v_img[..., c0 : c0 + ch]
            pad = win // 2
            o = nn.Conv(
                ch, (win, win), padding=((pad, pad), (pad, pad)),
                feature_group_count=ch, dtype=self.dtype, name=f"conv_{wi}",
            )(sl)
            outs.append(o)
            c0 += ch
        conv_v = jnp.concatenate(outs, axis=-1).reshape(B, H, W, h, Ch)
        conv_v = jnp.moveaxis(conv_v.reshape(B, N, h, Ch), 2, 1)
        return q * conv_v


class FactorAttention(nn.Module):
    """Factorized attention: Q @ (softmax_N(K)^T V) + CRPE (mpvit.py:333-393).

    `crpe` is a module owned by the enclosing path encoder: the reference
    shares one ConvRelPosEnc across all blocks of a path
    (mpvit.py:453-465), and the checkpoint layout depends on that."""

    dim: int
    crpe: nn.Module
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int):
        B, N, C = x.shape
        h = self.num_heads
        Ch = C // h
        qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, h, Ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, Ch]
        q = jnp.moveaxis(q, 2, 1)  # [B, h, N, Ch]
        k = jnp.moveaxis(k, 2, 1)
        v = jnp.moveaxis(v, 2, 1)

        k_soft = nn.softmax(k.astype(jnp.float32), axis=2).astype(k.dtype)
        ktv = jnp.einsum("bhnk,bhnv->bhkv", k_soft, v)
        att = jnp.einsum("bhnk,bhkv->bhnv", q, ktv)

        crpe = self.crpe(q, v, H, W)
        scale = Ch**-0.5
        out = scale * att + crpe
        out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class MHCABlock(nn.Module):
    dim: int
    crpe: nn.Module
    num_heads: int = 8
    mlp_ratio: int = 4
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool):
        def dp(y):
            if self.drop_path == 0.0:
                return y
            return nn.Dropout(
                rate=self.drop_path, broadcast_dims=(1, 2), deterministic=not train
            )(y)

        cur = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + dp(FactorAttention(self.dim, crpe=self.crpe, num_heads=self.num_heads, dtype=self.dtype, name="attn")(cur, H, W))
        cur = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(cur)
        # exact (erf) GELU: torch nn.GELU default, reference mpvit.py:72
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y)


class MHCAEncoder(nn.Module):
    """One transformer path: shared CPE + stacked MHCA blocks."""

    dim: int
    num_layers: int
    num_heads: int = 8
    mlp_ratio: int = 4
    drop_path_list: Tuple[float, ...] = ()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):  # [B, H, W, C]
        B, H, W, C = x.shape
        cpe = ConvPosEnc(self.dim, dtype=self.dtype, name="cpe")
        crpe = ConvRelPosEnc(
            head_dim=self.dim // self.num_heads, num_heads=self.num_heads,
            dtype=self.dtype, name="crpe",
        )
        tokens = None
        for i in range(self.num_layers):
            x = cpe(x)  # shared module, applied per block (mpvit.py:429-430)
            tokens = x.reshape(B, H * W, C)
            tokens = MHCABlock(
                self.dim,
                crpe=crpe,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop_path=self.drop_path_list[i] if self.drop_path_list else 0.0,
                dtype=self.dtype,
                name=f"block_{i}",
            )(tokens, H, W, train)
            x = tokens.reshape(B, H, W, C)
        return x


class ResBlockMP(nn.Module):
    """Conv path of a stage (mpvit.py ResBlock): 1x1BN+hswish -> dw3x3+BN+
    hswish -> 1x1BN, residual."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvBN(self.dim, 1, act="hardswish", dtype=self.dtype, name="conv1")(x, train)
        y = nn.Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=self.dim,
            use_bias=False, dtype=self.dtype, name="dwconv",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="norm", **_BN)(y)
        y = nn.hard_swish(y)
        y = ConvBN(self.dim, 1, dtype=self.dtype, name="conv2")(y, train)
        return x + y


class MPViT(nn.Module):
    """Multi-Path ViT encoder. __call__ -> 5 feature maps at strides
    [2, 4, 8, 16, 32] with channels [64, 128, 216, 288, 288] (small)."""

    embed_dims: Tuple[int, ...] = (64, 128, 216, 288)
    num_path: Tuple[int, ...] = (2, 3, 3, 3)
    num_layers: Tuple[int, ...] = (1, 3, 6, 3)
    mlp_ratios: Tuple[int, ...] = (4, 4, 4, 4)
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        dims = self.embed_dims
        # linear-decay drop-path schedule over all blocks (mpvit.py:586-598)
        total = sum(self.num_layers)
        # python floats, not np.float64: a non-weak scalar rate makes flax
        # Dropout's inputs/keep_prob promote bf16 activations to f32 and its
        # lax.select then fails under model.dtype=bfloat16
        dpr_all = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]

        x = ConvBN(dims[0] // 2, 3, 2, 1, act="hardswish", dtype=self.dtype, name="stem_0")(x, train)
        x = ConvBN(dims[0], 3, 1, 1, act="hardswish", dtype=self.dtype, name="stem_1")(x, train)

        outs = [x]
        cur = 0
        num_stages = len(dims)
        for s in range(num_stages):
            dpr = tuple(dpr_all[cur : cur + self.num_layers[s]])
            cur += self.num_layers[s]

            # sequential patch embeds; the first downsamples (mpvit.py:212-238)
            att_inputs = []
            for p in range(self.num_path[s]):
                x = DWPatchEmbed(
                    dims[s], stride=2 if p == 0 else 1, dtype=self.dtype,
                    name=f"stage{s}_embed{p}",
                )(x, train)
                att_inputs.append(x)

            # parallel: conv ResBlock on the first embed + transformer paths
            outs_paths = [
                ResBlockMP(dims[s], dtype=self.dtype, name=f"stage{s}_invres")(att_inputs[0], train)
            ]
            for p in range(self.num_path[s]):
                outs_paths.append(
                    MHCAEncoder(
                        dims[s], self.num_layers[s], self.num_heads[s],
                        self.mlp_ratios[s], drop_path_list=dpr, dtype=self.dtype,
                        name=f"stage{s}_path{p}",
                    )(att_inputs[p], train)
                )
            cat = jnp.concatenate(outs_paths, axis=-1)
            out_dim = dims[s + 1] if s + 1 < num_stages else dims[s]
            x = ConvBN(out_dim, 1, act="hardswish", dtype=self.dtype, name=f"stage{s}_aggregate")(cat, train)
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# HR decoder
# ---------------------------------------------------------------------------
class ChannelAttention(nn.Module):
    """Avg-pool SE gate (networksvit/hr_layers.py ChannelAttention: the max
    branch is disabled in the reference)."""

    channels: int
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.Dense(self.channels // self.ratio, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return nn.sigmoid(y)[:, None, None, :] * x


class AttentionModule(nn.Module):
    """ChannelAttention + 3x3 conv + relu (hr_layers.py Attention_Module)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(x.shape[-1], dtype=self.dtype, name="ca")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_se")(x)
        return nn.relu(x)


class FSEModule(nn.Module):
    """Upsample-high + concat-low -> SE gate -> 1x1 conv -> relu
    (hr_layers.py fSEModule)."""

    out_channels: int
    ratio: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, high, lows: Sequence[jnp.ndarray]):
        feats = jnp.concatenate([upsample2x_nearest(high)] + list(lows), axis=-1)
        c = feats.shape[-1]
        y = jnp.mean(feats, axis=(1, 2))
        y = nn.Dense(c // self.ratio, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        feats = feats * nn.sigmoid(y)[:, None, None, :]
        feats = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_se")(feats)
        return nn.relu(feats)


class HRDecoder(nn.Module):
    """Nested X_ij lattice decoder (networksvit/hr_decoder.py:10-125).

    Channel bookkeeping uses the same 'virtual' encoder widths
    num_ch_enc = [64, 64, 128, 256, 512] the reference keeps for this
    decoder, with fusion heads mapping the real MPViT widths onto them.
    """

    ch_enc: Tuple[int, ...] = (64, 128, 216, 288, 288)
    num_output_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_features) -> Tuple[jnp.ndarray, ...]:
        nce = (64, 64, 128, 256, 512)
        ncd = (16, 32, 64, 128, 256)

        feat = {0: input_features[0]}
        for i in (1, 2, 3, 4):
            feat[i] = AttentionModule(nce[i], dtype=self.dtype, name=f"f{i}")(input_features[i])

        X = {f"{i}0": feat[i] for i in range(5)}
        attention_position = {"31", "22", "13", "04"}

        def conv0(i, j, x):
            cin = nce[i] if not (i == 0 and j != 0) else nce[0] // 2
            return ConvBlock(int(cin // 2), dtype=self.dtype, name=f"X_{i}{j}_conv0")(x)

        for index in ["01", "11", "21", "31", "02", "12", "22", "03", "13", "04"]:
            row, col = int(index[0]), int(index[1])
            lows = [X[f"{row}{i}"] for i in range(col)]
            high = conv0(row + 1, col - 1, X[f"{row + 1}{col - 1}"])
            if index in attention_position:
                X[index] = FSEModule(
                    nce[row + 1] // 2, dtype=self.dtype, name=f"X_{index}_att"
                )(high, lows)
            else:
                cat = jnp.concatenate([upsample2x_nearest(high)] + lows, axis=-1)
                if col != 1:
                    # reference Conv1x1 is bias-free (networksvit/hr_layers.py:173)
                    cat = nn.Conv(ncd[row + 1] * 2, (1, 1), use_bias=False, dtype=self.dtype, name=f"X_{index}_down")(cat)
                X[index] = ConvBlock(ncd[row + 1], dtype=self.dtype, name=f"X_{index}_conv1")(cat)

        x = conv0(0, 4, X["04"])

        def head(name, y):
            d = ReflectConv3x3(self.num_output_channels, dtype=self.dtype, name=name)(y)
            return nn.sigmoid(d.astype(jnp.float32))

        if _phase_tail():
            # exact phase-domain scale-0 tail (ops/phase_tail.py): same
            # X_04_conv1/dispconv0 params, both convs at half res
            z = ConvBlock(ncd[0], dtype=self.dtype, name="X_04_conv1")(x, phase="up")
            d = ReflectConv3x3(
                self.num_output_channels, dtype=self.dtype, name="dispconv0"
            )(z, phase="s2d")
            d0 = depth_to_space2(nn.sigmoid(d.astype(jnp.float32)))
        else:
            x = ConvBlock(ncd[0], dtype=self.dtype, name="X_04_conv1")(upsample2x_nearest(x))
            d0 = head("dispconv0", x)

        return (
            d0,
            head("dispconv1", X["04"]),
            head("dispconv2", X["13"]),
            head("dispconv3", X["22"]),
        )


class MonoViTDepthNet(nn.Module):
    """MPViT-small encoder + HR decoder; trainer contract: disp tuple
    finest-first. Note scale s here is 1/2^s of input resolution as usual --
    disp0 full res, disp1 H/2 (X_04), disp2 H/4 (X_13), disp3 H/8 (X_22)."""

    scales: Sequence[int] = (0, 1, 2, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MPViT(dtype=self.dtype, name="encoder")(x, train=train)
        return HRDecoder(dtype=self.dtype, name="decoder")(feats)
