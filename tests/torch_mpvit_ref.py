"""Reference-faithful torch re-implementation of the MPViT backbone.

Module hierarchy, parameter names and forward math replicate
/root/reference/networksvit/mpvit.py line-for-line in structure (citations
inline) with the mmcv/timm scaffolding resolved to what it evaluates to:
build_norm_layer(dict(type='BN'), ch) -> nn.BatchNorm2d(ch) and DropPath ->
identity in eval mode. `state_dict()` of this model therefore has the SAME
key space as the released mpvit_small.pth the reference loads
(mpvit.py:809-815), which makes it a non-circular oracle for
models.torch_import.mpvit_torch_to_flax: layout AND forward outputs are
checked against real torch execution, not against our own flax tree.

Test-only code; the training framework never imports this.
"""

import torch
import torch.nn as nn


class Mlp(nn.Module):  # mpvit.py:57-82
    def __init__(self, in_features, hidden_features):
        super().__init__()
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden_features, in_features)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class Conv2d_BN(nn.Module):  # mpvit.py:85-123
    def __init__(self, in_ch, out_ch, kernel_size=1, stride=1, pad=0, act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, kernel_size, stride, pad, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self.act_layer = nn.Hardswish() if act else nn.Identity()

    def forward(self, x):
        return self.act_layer(self.bn(self.conv(x)))


class DWConv2d_BN(nn.Module):  # mpvit.py:125-176
    def __init__(self, in_ch, out_ch, kernel_size=1, stride=1):
        super().__init__()
        self.dwconv = nn.Conv2d(
            in_ch, out_ch, kernel_size, stride, (kernel_size - 1) // 2,
            groups=out_ch, bias=False,
        )
        self.pwconv = nn.Conv2d(out_ch, out_ch, 1, 1, 0, bias=False)
        self.bn = nn.BatchNorm2d(out_ch)
        self.act = nn.Hardswish()

    def forward(self, x):
        return self.act(self.bn(self.pwconv(self.dwconv(x))))


class DWCPatchEmbed(nn.Module):  # mpvit.py:178-209
    def __init__(self, in_chans, embed_dim, patch_size=3, stride=1):
        super().__init__()
        self.patch_conv = DWConv2d_BN(in_chans, embed_dim, patch_size, stride)

    def forward(self, x):
        return self.patch_conv(x)


class Patch_Embed_stage(nn.Module):  # mpvit.py:212-239
    def __init__(self, embed_dim, num_path=4, isPool=False):
        super().__init__()
        self.patch_embeds = nn.ModuleList(
            [
                DWCPatchEmbed(
                    embed_dim, embed_dim, patch_size=3,
                    stride=2 if isPool and idx == 0 else 1,
                )
                for idx in range(num_path)
            ]
        )

    def forward(self, x):
        att_inputs = []
        for pe in self.patch_embeds:
            x = pe(x)
            att_inputs.append(x)
        return att_inputs


class ConvPosEnc(nn.Module):  # mpvit.py:241-260
    def __init__(self, dim, k=3):
        super().__init__()
        self.proj = nn.Conv2d(dim, dim, k, 1, k // 2, groups=dim)

    def forward(self, x, size):
        B, N, C = x.shape
        H, W = size
        feat = x.transpose(1, 2).contiguous().view(B, C, H, W)
        x = self.proj(feat) + feat
        return x.flatten(2).transpose(1, 2).contiguous()


class ConvRelPosEnc(nn.Module):  # mpvit.py:262-331
    def __init__(self, Ch, h, window):
        super().__init__()
        self.window = window
        self.conv_list = nn.ModuleList()
        self.head_splits = []
        for cur_window, cur_head_split in window.items():
            padding_size = cur_window // 2
            self.conv_list.append(
                nn.Conv2d(
                    cur_head_split * Ch, cur_head_split * Ch,
                    kernel_size=cur_window, padding=padding_size,
                    groups=cur_head_split * Ch,
                )
            )
            self.head_splits.append(cur_head_split)
        self.channel_splits = [x * Ch for x in self.head_splits]

    def forward(self, q, v, size):
        B, h, N, Ch = q.shape
        H, W = size
        v_img = v.transpose(2, 3).reshape(B, h * Ch, H, W)
        v_img_list = torch.split(v_img, self.channel_splits, dim=1)
        conv_v_img = torch.cat(
            [conv(x) for conv, x in zip(self.conv_list, v_img_list)], dim=1
        )
        conv_v_img = conv_v_img.reshape(B, h, Ch, H * W).transpose(2, 3)
        return q * conv_v_img


class FactorAtt_ConvRelPosEnc(nn.Module):  # mpvit.py:333-394
    def __init__(self, dim, num_heads=8, qkv_bias=True, shared_crpe=None):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.crpe = shared_crpe

    def forward(self, x, size):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
            .contiguous()
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        k_softmax = k.softmax(dim=2)
        k_softmax_T_dot_v = torch.einsum("bhnk,bhnv->bhkv", k_softmax, v)
        factor_att = torch.einsum("bhnk,bhkv->bhnv", q, k_softmax_T_dot_v)
        crpe = self.crpe(q, v, size=size)
        x = self.scale * factor_att + crpe
        x = x.transpose(1, 2).reshape(B, N, C).contiguous()
        return self.proj(x)


class MHCABlock(nn.Module):  # mpvit.py:396-437
    def __init__(self, dim, num_heads, mlp_ratio=3, shared_cpe=None, shared_crpe=None):
        super().__init__()
        self.cpe = shared_cpe
        self.crpe = shared_crpe
        self.factoratt_crpe = FactorAtt_ConvRelPosEnc(
            dim, num_heads=num_heads, qkv_bias=True, shared_crpe=shared_crpe
        )
        self.mlp = Mlp(dim, dim * mlp_ratio)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, size):
        if self.cpe is not None:
            x = self.cpe(x, size)
        cur = self.norm1(x)
        x = x + self.factoratt_crpe(cur, size)  # DropPath == identity (eval)
        cur = self.norm2(x)
        return x + self.mlp(cur)


class MHCAEncoder(nn.Module):  # mpvit.py:439-480
    def __init__(self, dim, num_layers=1, num_heads=8, mlp_ratio=3,
                 crpe_window={3: 2, 5: 3, 7: 3}):
        super().__init__()
        self.cpe = ConvPosEnc(dim, k=3)
        self.crpe = ConvRelPosEnc(Ch=dim // num_heads, h=num_heads, window=crpe_window)
        self.MHCA_layers = nn.ModuleList(
            [
                MHCABlock(dim, num_heads, mlp_ratio,
                          shared_cpe=self.cpe, shared_crpe=self.crpe)
                for _ in range(num_layers)
            ]
        )

    def forward(self, x, size):
        H, W = size
        B = x.shape[0]
        for layer in self.MHCA_layers:
            x = layer(x, (H, W))
        return x.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()


class ResBlock(nn.Module):  # mpvit.py:482-532
    def __init__(self, in_features):
        super().__init__()
        self.conv1 = Conv2d_BN(in_features, in_features, act=True)
        self.dwconv = nn.Conv2d(
            in_features, in_features, 3, 1, 1, groups=in_features, bias=False
        )
        self.norm = nn.BatchNorm2d(in_features)
        self.act = nn.Hardswish()
        self.conv2 = Conv2d_BN(in_features, in_features, act=False)

    def forward(self, x):
        identity = x
        feat = self.conv1(x)
        feat = self.dwconv(feat)
        feat = self.norm(feat)
        feat = self.act(feat)
        feat = self.conv2(feat)
        return identity + feat


class MHCA_stage(nn.Module):  # mpvit.py:534-581
    def __init__(self, embed_dim, out_embed_dim, num_layers=1, num_heads=8,
                 mlp_ratio=3, num_path=4):
        super().__init__()
        self.mhca_blks = nn.ModuleList(
            [
                MHCAEncoder(embed_dim, num_layers, num_heads, mlp_ratio)
                for _ in range(num_path)
            ]
        )
        self.InvRes = ResBlock(embed_dim)
        self.aggregate = Conv2d_BN(embed_dim * (num_path + 1), out_embed_dim, act=True)

    def forward(self, inputs):
        att_outputs = [self.InvRes(inputs[0])]
        for x, encoder in zip(inputs, self.mhca_blks):
            _, _, H, W = x.shape
            x = x.flatten(2).transpose(1, 2).contiguous()
            att_outputs.append(encoder(x, size=(H, W)))
        out_concat = torch.cat(att_outputs, dim=1)
        return self.aggregate(out_concat), att_outputs


class MPViT(nn.Module):  # mpvit.py:602-726
    def __init__(self, num_stages=4, num_layers=(1, 1, 1, 1),
                 mlp_ratios=(8, 8, 4, 4), num_path=(4, 4, 4, 4),
                 embed_dims=(64, 128, 256, 512), num_heads=(8, 8, 8, 8)):
        super().__init__()
        self.num_stages = num_stages
        self.stem = nn.Sequential(
            Conv2d_BN(3, embed_dims[0] // 2, 3, 2, 1, act=True),
            Conv2d_BN(embed_dims[0] // 2, embed_dims[0], 3, 1, 1, act=True),
        )
        self.patch_embed_stages = nn.ModuleList(
            [
                Patch_Embed_stage(embed_dims[i], num_path=num_path[i], isPool=True)
                for i in range(num_stages)
            ]
        )
        self.mhca_stages = nn.ModuleList(
            [
                MHCA_stage(
                    embed_dims[i],
                    embed_dims[i + 1] if i + 1 != num_stages else embed_dims[i],
                    num_layers[i], num_heads[i], mlp_ratios[i], num_path[i],
                )
                for i in range(num_stages)
            ]
        )

    def forward(self, x):  # forward_features, mpvit.py:709-721
        outs = []
        x = self.stem(x)
        outs.append(x)
        for idx in range(self.num_stages):
            att_inputs = self.patch_embed_stages[idx](x)
            x, _ = self.mhca_stages[idx](att_inputs)
            outs.append(x)
        return outs


def mpvit_small():  # mpvit.py:794-821
    return MPViT(
        num_stages=4,
        num_path=(2, 3, 3, 3),
        num_layers=(1, 3, 6, 3),
        embed_dims=(64, 128, 216, 288),
        mlp_ratios=(4, 4, 4, 4),
        num_heads=(8, 8, 8, 8),
    )
