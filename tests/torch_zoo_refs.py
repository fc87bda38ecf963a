"""Structure-faithful torch replicas of the reference SQL / CADepth /
DIFFNet model stacks, used to generate reference-layout state_dicts for
importer round-trip tests (the same approach as tests/torch_mpvit_ref.py).

Each replica reproduces the reference module ATTRIBUTE STRUCTURE (so
`state_dict()` emits exactly the key set a published checkpoint has); no
forward methods are needed -- forward parity of the constituent blocks is
covered by the per-module oracle tests (tests/test_zoos.py).

Layout sources:
- CADepth decoder: /root/reference/networksCA/depth_decoder.py:26-47,
  dem.py:9-18, spm.py (parameter-free).
- SQL encoder-decoder: /root/reference/networksSQL/resnet_encoder.py:96-150;
  head: lite_depth_decoder_QTR.py:10-31.
- DIFFNet HRNet-18: /root/reference/networksDIFF/test_hr_encoder.py:295-435,
  hrnet_config.py HRNET_18; decoder: HR_Depth_Decoder.py:10-42,
  hr_layers.py:352-372 (ChannelAttention), 443-455 (Attention_Module).
"""

import torch
import torch.nn as nn


# torchvision is not installed in this image; these are structure-only
# replicas of torchvision.models.resnet blocks (same attribute names ->
# same state_dict key layout as published checkpoints)
class BasicBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if downsample is not None:
            self.downsample = downsample


class Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if downsample is not None:
            self.downsample = downsample


def make_resnet50():
    """torchvision-resnet50-layout state dict source (conv1/bn1/layer{n}/fc)."""
    m = nn.Module()
    m.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    m.bn1 = nn.BatchNorm2d(64)
    inplanes = 64
    for li, (planes, blocks, stride) in enumerate(
        ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)), start=1
    ):
        ds = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4),
        )
        mods = [Bottleneck(inplanes, planes, stride, ds)]
        inplanes = planes * 4
        mods += [Bottleneck(inplanes, planes) for _ in range(blocks - 1)]
        setattr(m, f"layer{li}", nn.Sequential(*mods))
    m.fc = nn.Linear(2048, 1000)
    return m


# ---------------------------------------------------------------------------
# shared reference layers (layers.py:103-133)
# ---------------------------------------------------------------------------
class TConv3x3(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(cin, cout, 3)


class TConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = TConv3x3(cin, cout)


# ---------------------------------------------------------------------------
# CADepth decoder (networksCA/depth_decoder.py)
# ---------------------------------------------------------------------------
class TDEM(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.ReflectionPad2d(1), nn.Conv2d(c, c, 3), nn.BatchNorm2d(c), nn.ReLU(True)
        )
        self.global_path = nn.Sequential(
            nn.AdaptiveAvgPool2d(1), nn.Conv2d(c, c, 1), nn.ReLU(True),
            nn.Conv2d(c, c, 1), nn.Sigmoid(),
        )


def make_ca_decoder(num_ch_enc=(64, 256, 512, 1024, 2048)):
    dec = [16, 32, 64, 128, 256]
    mods = []
    for i in range(4, -1, -1):
        cin = num_ch_enc[-1] if i == 4 else dec[i + 1]
        mods.append(TConvBlock(cin, dec[i]))
        cin1 = dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
        mods.append(TConvBlock(cin1, dec[i]))
        mods.append(TDEM(cin1))
    for s in range(4):
        mods.append(TConv3x3(dec[s], 1))

    m = nn.Module()
    m.decoder = nn.ModuleList(mods)
    return m


# ---------------------------------------------------------------------------
# SQL encoder-decoder + head (networksSQL)
# ---------------------------------------------------------------------------
class TUpSampleBN(nn.Module):
    def __init__(self, skip_input, output_features):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(skip_input, output_features, 3, 1, 1),
            nn.BatchNorm2d(output_features), nn.LeakyReLU(),
            nn.Conv2d(output_features, output_features, 3, 1, 1),
            nn.BatchNorm2d(output_features), nn.LeakyReLU(),
        )


class TDecoderBN(nn.Module):
    def __init__(self, num_features=256, model_dim=32, bottleneck=2048):
        super().__init__()
        f = num_features
        self.conv2 = nn.Conv2d(bottleneck, f, 1, 1, 1)
        self.up1 = TUpSampleBN(f + 1024, f // 2)
        self.up2 = TUpSampleBN(f // 2 + 512, f // 4)
        self.up3 = TUpSampleBN(f // 4 + 256, f // 8)
        self.up4 = TUpSampleBN(f // 8 + 64, f // 16)
        self.conv3 = nn.Conv2d(f // 16, model_dim, 3, 1, 1)


def make_sql_encoder():
    enc = nn.Module()
    enc.encoder = make_resnet50()
    m = nn.Module()
    m.encoder = enc
    m.decoder = TDecoderBN()
    return m


def make_sql_head(in_channels=32, embedding_dim=32, patch_size=16, num_heads=4,
                  query_nums=64, dim_out=64):
    m = nn.Module()
    m.embedding_convPxP = nn.Conv2d(in_channels, embedding_dim, patch_size, patch_size, 0)
    m.positional_encodings = nn.Parameter(torch.rand(500, embedding_dim))
    layer = nn.TransformerEncoderLayer(embedding_dim, num_heads, dim_feedforward=512)
    m.transformer_encoder = nn.TransformerEncoder(layer, num_layers=4)
    m.conv3x3 = nn.Conv2d(in_channels, embedding_dim, 3, 1, 1)
    m.bins_regressor = nn.Sequential(
        nn.Linear(embedding_dim * query_nums, 16 * query_nums), nn.LeakyReLU(),
        nn.Linear(16 * query_nums, 16 * 16), nn.LeakyReLU(),
        nn.Linear(16 * 16, dim_out),
    )
    m.convert_to_prob = nn.Sequential(nn.Conv2d(query_nums, dim_out, 1, 1, 0), nn.Softmax(dim=1))
    return m


# ---------------------------------------------------------------------------
# DIFFNet HRNet-18 encoder + decoder (networksDIFF)
# ---------------------------------------------------------------------------
def _fuse_layers(channels):
    n = len(channels)
    layers = []
    for i in range(n):
        row = []
        for j in range(n):
            if j > i:
                row.append(nn.Sequential(
                    nn.Conv2d(channels[j], channels[i], 1, 1, 0, bias=False),
                    nn.BatchNorm2d(channels[i]),
                ))
            elif j == i:
                row.append(None)
            else:
                chain = []
                for k in range(i - j):
                    if k == i - j - 1:
                        chain.append(nn.Sequential(
                            nn.Conv2d(channels[j], channels[i], 3, 2, 1, bias=False),
                            nn.BatchNorm2d(channels[i]),
                        ))
                    else:
                        chain.append(nn.Sequential(
                            nn.Conv2d(channels[j], channels[j], 3, 2, 1, bias=False),
                            nn.BatchNorm2d(channels[j]), nn.ReLU(True),
                        ))
                row.append(nn.Sequential(*chain))
        layers.append(nn.ModuleList(row))
    return nn.ModuleList(layers)


class THRModule(nn.Module):
    def __init__(self, channels, num_blocks=4):
        super().__init__()
        self.branches = nn.ModuleList([
            nn.Sequential(*[BasicBlock(c, c) for _ in range(num_blocks)])
            for c in channels
        ])
        self.fuse_layers = _fuse_layers(channels)


def make_hrnet18():
    m = nn.Module()
    m.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
    m.bn1 = nn.BatchNorm2d(64)
    m.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
    m.bn2 = nn.BatchNorm2d(64)
    ds = nn.Sequential(nn.Conv2d(64, 256, 1, 1, bias=False), nn.BatchNorm2d(256))
    m.layer1 = nn.Sequential(
        Bottleneck(64, 64, downsample=ds),
        Bottleneck(256, 64), Bottleneck(256, 64), Bottleneck(256, 64),
    )
    m.transition1 = nn.ModuleList([
        nn.Sequential(nn.Conv2d(256, 18, 3, 1, 1, bias=False), nn.BatchNorm2d(18), nn.ReLU(True)),
        nn.Sequential(nn.Sequential(
            nn.Conv2d(256, 36, 3, 2, 1, bias=False), nn.BatchNorm2d(36), nn.ReLU(True))),
    ])
    m.stage2 = nn.Sequential(THRModule((18, 36)))
    m.transition2 = nn.ModuleList([None, None, nn.Sequential(nn.Sequential(
        nn.Conv2d(36, 72, 3, 2, 1, bias=False), nn.BatchNorm2d(72), nn.ReLU(True)))])
    m.stage3 = nn.Sequential(*[THRModule((18, 36, 72)) for _ in range(4)])
    m.transition3 = nn.ModuleList([None, None, None, nn.Sequential(nn.Sequential(
        nn.Conv2d(72, 144, 3, 2, 1, bias=False), nn.BatchNorm2d(144), nn.ReLU(True)))])
    m.stage4 = nn.Sequential(*[THRModule((18, 36, 72, 144)) for _ in range(3)])
    return m


class TChannelAttention(nn.Module):
    def __init__(self, c, ratio=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(c, c // ratio, bias=False), nn.ReLU(True),
            nn.Linear(c // ratio, c, bias=False),
        )


class TAttentionModule(nn.Module):
    def __init__(self, high, low, out):
        super().__init__()
        cin = high + low
        self.ca = TChannelAttention(cin)
        self.conv_se = nn.Conv2d(cin, out, 3, 1, 1)


def make_diffnet_decoder(num_ch_enc=(64, 18, 36, 72, 144)):
    dec = [16, 32, 64, 128, 256]
    m = nn.Module()
    convs = nn.ModuleDict()
    convs["up_x9_0"] = TConvBlock(dec[1], dec[0])
    convs["up_x9_1"] = TConvBlock(dec[0], dec[0])
    convs["72"] = TAttentionModule(num_ch_enc[4], num_ch_enc[3] * 2, 256)
    convs["36"] = TAttentionModule(256, num_ch_enc[2] * 3, 128)
    convs["18"] = TAttentionModule(128, num_ch_enc[1] * 3 + 64, 64)
    convs["9"] = TAttentionModule(64, 64, 32)
    for i in range(4):
        convs[f"dispConvScale{i}"] = TConv3x3(dec[i], 1)
    m.convs = convs
    m.decoder = nn.ModuleList(list(convs.values()))
    return m
