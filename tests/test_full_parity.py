"""Full-network parity: a torch re-creation of the reference Monodepth2
architecture (networks/resnet_encoder.py + depth_decoder.py +
pose_decoder.py semantics) with random weights, exported in torch layout,
imported through models.torch_import, must produce the same disparity maps
and pose outputs as our flax modules to float tolerance.

This is the end-to-end evidence that (architecture x weight-import x
numerics) all line up -- the same path published reference checkpoints
take.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from baseboostdepth_tpu.models import MD2DepthNet, build_pose_net
from baseboostdepth_tpu.models.torch_import import (
    depth_decoder_torch_to_flax,
    pose_decoder_torch_to_flax,
    resnet_torch_to_flax,
)


# ---------------------------------------------------------------- torch net
class TBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


class TResNet18(nn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        widths = [64, 128, 256, 512]
        cin = 64
        for li, w in enumerate(widths, start=1):
            blocks = nn.Sequential(
                TBasicBlock(cin, w, stride=1 if li == 1 else 2),
                TBasicBlock(w, w),
            )
            setattr(self, f"layer{li}", blocks)
            cin = w

    def forward(self, x):
        x = (x - 0.45) / 0.225
        f0 = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(f0, 3, 2, 1)
        feats = [f0]
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            feats.append(x)
        return feats


class TConvBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential()
        self.conv.conv = nn.Conv2d(cin, cout, 3)

    def forward(self, x):
        return F.elu(self.conv.conv(F.pad(x, (1, 1, 1, 1), mode="reflect")))


class TDepthDecoder(nn.Module):
    def __init__(self, enc_ch=(64, 64, 128, 256, 512)):
        super().__init__()
        dec = [16, 32, 64, 128, 256]
        mods = []
        for i in range(4, -1, -1):
            cin = enc_ch[-1] if i == 4 else dec[i + 1]
            mods.append(TConvBlock(cin, dec[i]))
            cin1 = dec[i] + (enc_ch[i - 1] if i > 0 else 0)
            mods.append(TConvBlock(cin1, dec[i]))
        for s in range(4):
            m = nn.Module()
            m.conv = nn.Conv2d(dec[s], 1, 3)
            mods.append(m)
        self.decoder = nn.ModuleList(mods)

    def forward(self, feats):
        outs = []
        x = feats[-1]
        idx = 0
        xs = {}
        for i in range(4, -1, -1):
            x = self.decoder[idx](x)
            idx += 1
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            if i > 0:
                x = torch.cat([x, feats[i - 1]], 1)
            x = self.decoder[idx](x)
            idx += 1
            xs[i] = x
        for s in range(4):
            head = self.decoder[10 + s]
            d = head.conv(F.pad(xs[s], (1, 1, 1, 1), mode="reflect"))
            outs.append(torch.sigmoid(d))
        return outs


class TPoseDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.net = nn.ModuleList([
            nn.Conv2d(512, 256, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 256, 3, 1, 1),
            nn.Conv2d(256, 12, 1),
        ])

    def forward(self, f):
        x = F.relu(self.net[0](f))
        x = F.relu(self.net[1](x))
        x = F.relu(self.net[2](x))
        x = self.net[3](x)
        x = x.mean(3).mean(2)
        x = 0.01 * x.view(-1, 2, 1, 6)
        return x[..., :3], x[..., 3:]


@pytest.fixture(scope="module")
def torch_md2():
    torch.manual_seed(0)
    enc = TResNet18().eval()
    dec = TDepthDecoder().eval()
    return enc, dec


class TestFullForwardParity:
    def test_depth_network(self, torch_md2):
        enc, dec = torch_md2
        H, W = 64, 128
        rng = np.random.default_rng(0)
        x = rng.random((2, H, W, 3)).astype(np.float32)

        with torch.no_grad():
            feats = enc(torch.from_numpy(x).permute(0, 3, 1, 2))
            t_disps = [d.permute(0, 2, 3, 1).numpy() for d in dec(feats)]

        # export torch state dicts in the reference layout and import
        enc_sd = {k: v.numpy() for k, v in enc.state_dict().items()}
        # torch Sequential downsample -> 'downsample.0', matches importer
        p_enc, s_enc = resnet_torch_to_flax(enc_sd)
        dec_sd = {k: v.numpy() for k, v in dec.state_dict().items()}
        p_dec = depth_decoder_torch_to_flax(dec_sd)

        net = MD2DepthNet(num_layers=18)
        variables = {
            "params": {"encoder": jax.tree.map(jnp.asarray, p_enc), "decoder": jax.tree.map(jnp.asarray, p_dec)},
            "batch_stats": {"encoder": jax.tree.map(jnp.asarray, s_enc)},
        }
        disps = net.apply(variables, jnp.asarray(x), train=False)
        for s in range(4):
            np.testing.assert_allclose(
                np.asarray(disps[s]), t_disps[s], atol=2e-4,
                err_msg=f"scale {s}",
            )

    def test_pose_network(self):
        torch.manual_seed(1)
        enc = TResNet18(in_ch=6).eval()
        head = TPoseDecoder().eval()
        H, W = 64, 128
        rng = np.random.default_rng(1)
        pair = rng.random((3, H, W, 6)).astype(np.float32)

        with torch.no_grad():
            feats = enc(torch.from_numpy(pair).permute(0, 3, 1, 2))
            taa, tt = head(feats[-1])
            # reference layout [B, 2, 1, 6]; training uses frame 0
            taa, tt = taa[:, 0, 0].numpy(), tt[:, 0, 0].numpy()

        p_enc, s_enc = resnet_torch_to_flax({k: v.numpy() for k, v in enc.state_dict().items()})
        p_dec = pose_decoder_torch_to_flax({k: v.numpy() for k, v in head.state_dict().items()})

        net = build_pose_net()
        variables = {
            "params": {"encoder": jax.tree.map(jnp.asarray, p_enc), "decoder": jax.tree.map(jnp.asarray, p_dec)},
            "batch_stats": {"encoder": jax.tree.map(jnp.asarray, s_enc)},
        }
        aa, t = net.apply(variables, jnp.asarray(pair), train=False)
        np.testing.assert_allclose(np.asarray(aa), taa, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), tt, atol=1e-5)


# ------------------------------------------------------------------ CADepth
class TSPM(nn.Module):
    def forward(self, x):
        b, c, h, w = x.size()
        q = x.view(b, c, -1)
        energy = torch.bmm(q, q.permute(0, 2, 1))
        energy_new = torch.max(energy, -1, keepdim=True)[0].expand_as(energy) - energy
        attn = torch.softmax(energy_new, dim=-1)
        out = torch.bmm(attn, q).view(b, c, h, w)
        return out + x


class TDEM(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3)
        self.bn = nn.BatchNorm2d(c)
        self.g1 = nn.Conv2d(c, c, 1)
        self.g2 = nn.Conv2d(c, c, 1)

    def forward(self, x):
        y = F.relu(self.bn(self.conv(F.pad(x, (1, 1, 1, 1), mode="reflect"))))
        g = torch.sigmoid(self.g2(F.relu(self.g1(F.adaptive_avg_pool2d(y, 1)))))
        return y + y * g


class TestCADepthModuleParity:
    def test_spm(self):
        from baseboostdepth_tpu.models.cadepth import SPM

        rng = np.random.default_rng(2)
        x = rng.random((2, 4, 6, 16)).astype(np.float32)
        ours = np.asarray(SPM().apply({}, jnp.asarray(x)))
        with torch.no_grad():
            ref = TSPM()(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_dem(self):
        from baseboostdepth_tpu.models.cadepth import DEM

        rng = np.random.default_rng(3)
        c = 8
        x = rng.random((2, 6, 10, c)).astype(np.float32)
        t = TDEM(c).eval()
        with torch.no_grad():
            ref = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

        sd = {k: v.numpy() for k, v in t.state_dict().items()}

        def cw(w):
            return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

        params = {
            "conv": {"kernel": cw(sd["conv.weight"]), "bias": jnp.asarray(sd["conv.bias"])},
            "bn": {"scale": jnp.asarray(sd["bn.weight"]), "bias": jnp.asarray(sd["bn.bias"])},
            "gate1": {"kernel": cw(sd["g1.weight"]), "bias": jnp.asarray(sd["g1.bias"])},
            "gate2": {"kernel": cw(sd["g2.weight"]), "bias": jnp.asarray(sd["g2.bias"])},
        }
        stats = {"bn": {"mean": jnp.asarray(sd["bn.running_mean"]), "var": jnp.asarray(sd["bn.running_var"])}}
        ours = np.asarray(
            DEM(c).apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)


# ------------------------------------------------------------------ SQL head
class TestSQLTransformerParity:
    def test_post_ln_layer_matches_torch(self):
        """Our TransformerLayer vs torch nn.TransformerEncoderLayer
        (post-LN, relu, the reference's SQL configuration) with transplanted
        weights."""
        from baseboostdepth_tpu.models.sql import TransformerLayer

        E, heads, ff = 32, 4, 512
        tl = nn.TransformerEncoderLayer(E, heads, dim_feedforward=ff, dropout=0.0,
                                        batch_first=True).eval()
        rng = np.random.default_rng(4)
        x = rng.random((2, 10, E)).astype(np.float32)
        with torch.no_grad():
            ref = tl(torch.from_numpy(x)).numpy()

        sd = {k: v.numpy() for k, v in tl.state_dict().items()}
        w_in = sd["self_attn.in_proj_weight"]  # [3E, E]
        b_in = sd["self_attn.in_proj_bias"]
        wq, wk, wv = w_in[:E], w_in[E:2*E], w_in[2*E:]
        bq, bk, bv = b_in[:E], b_in[E:2*E], b_in[2*E:]
        hd = E // heads

        def proj(w, b):  # torch [E_out, E_in] -> flax MHA kernel [E_in, heads, hd]
            return {
                "kernel": jnp.asarray(w.T.reshape(E, heads, hd)),
                "bias": jnp.asarray(b.reshape(heads, hd)),
            }

        params = {
            "attn": {
                "query": proj(wq, bq),
                "key": proj(wk, bk),
                "value": proj(wv, bv),
                "out": {
                    "kernel": jnp.asarray(sd["self_attn.out_proj.weight"].T.reshape(heads, hd, E)),
                    "bias": jnp.asarray(sd["self_attn.out_proj.bias"]),
                },
            },
            "norm1": {"scale": jnp.asarray(sd["norm1.weight"]), "bias": jnp.asarray(sd["norm1.bias"])},
            "norm2": {"scale": jnp.asarray(sd["norm2.weight"]), "bias": jnp.asarray(sd["norm2.bias"])},
            "ff1": {"kernel": jnp.asarray(sd["linear1.weight"].T), "bias": jnp.asarray(sd["linear1.bias"])},
            "ff2": {"kernel": jnp.asarray(sd["linear2.weight"].T), "bias": jnp.asarray(sd["linear2.bias"])},
        }
        ours = np.asarray(
            TransformerLayer(E, heads, ff).apply({"params": params}, jnp.asarray(x), False)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-4)


# ------------------------------------------------------------------ HRNet
class THRFuse2(nn.Module):
    """Two-branch HighResolutionModule (test_hr_encoder.py:139-286):
    4 BasicBlocks per branch + SUM fuse (1x1+BN+align_corners-bilinear up,
    3x3 stride-2 +BN down)."""

    def __init__(self, c0=8, c1=16):
        super().__init__()
        self.b0 = nn.Sequential(*[TBasicBlock(c0, c0) for _ in range(4)])
        self.b1 = nn.Sequential(*[TBasicBlock(c1, c1) for _ in range(4)])
        self.up = nn.Sequential(nn.Conv2d(c1, c0, 1, bias=False), nn.BatchNorm2d(c0))
        self.down = nn.Sequential(nn.Conv2d(c0, c1, 3, 2, 1, bias=False), nn.BatchNorm2d(c1))

    def forward(self, x0, x1):
        y0 = self.b0(x0)
        y1 = self.b1(x1)
        f0 = F.relu(y0 + F.interpolate(self.up(y1), size=y0.shape[-2:],
                                       mode="bilinear", align_corners=True))
        f1 = F.relu(y1 + self.down(y0))
        return f0, f1


class TestHRModuleParity:
    def test_two_branch_fuse(self):
        from baseboostdepth_tpu.models.diffnet import HRModule

        t = THRFuse2().eval()
        rng = np.random.default_rng(5)
        x0 = rng.random((1, 8, 16, 8)).astype(np.float32)
        x1 = rng.random((1, 4, 8, 16)).astype(np.float32)
        with torch.no_grad():
            r0, r1 = t(torch.from_numpy(x0).permute(0, 3, 1, 2),
                       torch.from_numpy(x1).permute(0, 3, 1, 2))
            r0 = r0.permute(0, 2, 3, 1).numpy()
            r1 = r1.permute(0, 2, 3, 1).numpy()

        sd = {k: v.numpy() for k, v in t.state_dict().items()}

        def cw(w):
            return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))

        def block(src):
            p = {
                "conv1": {"conv": {"kernel": cw(sd[src + ".conv1.weight"])}},
                "conv2": {"conv": {"kernel": cw(sd[src + ".conv2.weight"])}},
            }
            s = {}
            for bn in ("bn1", "bn2"):
                p[bn] = {"bn": {"scale": jnp.asarray(sd[f"{src}.{bn}.weight"]),
                                 "bias": jnp.asarray(sd[f"{src}.{bn}.bias"])}}
                s[bn] = {"bn": {"mean": jnp.asarray(sd[f"{src}.{bn}.running_mean"]),
                                 "var": jnp.asarray(sd[f"{src}.{bn}.running_var"])}}
            return p, s

        params, stats = {}, {}
        for bi, src in enumerate(["b0", "b1"]):
            for k in range(4):
                p, s = block(f"{src}.{k}")
                params[f"branch{bi}_block{k}"] = p
                stats[f"branch{bi}_block{k}"] = s
        params["fuse0_1_conv"] = {"conv": {"kernel": cw(sd["up.0.weight"])}}
        params["fuse0_1_bn"] = {"bn": {"scale": jnp.asarray(sd["up.1.weight"]),
                                        "bias": jnp.asarray(sd["up.1.bias"])}}
        stats["fuse0_1_bn"] = {"bn": {"mean": jnp.asarray(sd["up.1.running_mean"]),
                                       "var": jnp.asarray(sd["up.1.running_var"])}}
        params["fuse1_0_down0"] = {
            "conv": {"conv": {"kernel": cw(sd["down.0.weight"])}},
            "bn": {"bn": {"scale": jnp.asarray(sd["down.1.weight"]),
                           "bias": jnp.asarray(sd["down.1.bias"])}},
        }
        stats["fuse1_0_down0"] = {
            "bn": {"bn": {"mean": jnp.asarray(sd["down.1.running_mean"]),
                           "var": jnp.asarray(sd["down.1.running_var"])}},
        }

        mod = HRModule(channels=(8, 16))
        o0, o1 = mod.apply(
            {"params": params, "batch_stats": stats},
            [jnp.asarray(x0), jnp.asarray(x1)], False,
        )
        np.testing.assert_allclose(np.asarray(o0), r0, atol=2e-4)
        np.testing.assert_allclose(np.asarray(o1), r1, atol=2e-4)
