"""Torch-import tests: a synthetic torch-layout ResNet-18 + decoder + pose
checkpoint must convert into trees structurally identical to flax init, and
a converted conv+bn stem must reproduce torch functional output."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from baseboostdepth_tpu.models import MD2DepthNet, build_pose_net
from baseboostdepth_tpu.models.torch_import import (
    depth_decoder_torch_to_flax,
    pose_decoder_torch_to_flax,
    resnet_torch_to_flax,
)


def _make_torch_resnet18_sd(rng, in_ch=3):
    """Minimal torchvision-layout resnet18 state dict (conv+bn only)."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = rng.standard_normal(c).astype(np.float32) * 0.1 + 1
        sd[name + ".bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = np.abs(rng.standard_normal(c).astype(np.float32)) + 1

    conv("conv1", 64, in_ch, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    inp = 64
    for li, w in enumerate(widths, start=1):
        for bi in range(2):
            base = f"layer{li}.{bi}"
            stride_block = bi == 0 and li > 1
            conv(f"{base}.conv1", w, inp if bi == 0 else w, 3)
            bn(f"{base}.bn1", w)
            conv(f"{base}.conv2", w, w, 3)
            bn(f"{base}.bn2", w)
            if bi == 0 and (stride_block or inp != w):
                conv(f"{base}.downsample.0", w, inp, 1)
                bn(f"{base}.downsample.1", w)
        inp = w
    return sd


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(np.shape(x)), t)


class TestResnetImport:
    def test_structure_matches_flax_init(self):
        rng = np.random.default_rng(0)
        sd = _make_torch_resnet18_sd(rng)
        params, stats = resnet_torch_to_flax(sd)

        net = MD2DepthNet(num_layers=18)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        ref_p = v["params"]["encoder"]
        ref_s = v["batch_stats"]["encoder"]
        assert _tree_shapes(params) == _tree_shapes(ref_p)
        assert _tree_shapes(stats) == _tree_shapes(ref_s)

    def test_stem_forward_matches_torch(self):
        rng = np.random.default_rng(1)
        sd = _make_torch_resnet18_sd(rng)
        params, stats = resnet_torch_to_flax(sd)

        x = rng.random((2, 32, 48, 3)).astype(np.float32)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        ty = F.conv2d(tx, torch.from_numpy(sd["conv1.weight"]), stride=2, padding=3)
        ty = F.batch_norm(
            ty,
            torch.from_numpy(sd["bn1.running_mean"]),
            torch.from_numpy(sd["bn1.running_var"]),
            torch.from_numpy(sd["bn1.weight"]),
            torch.from_numpy(sd["bn1.bias"]),
            training=False, eps=1e-5,
        )
        ty = torch.relu(ty).permute(0, 2, 3, 1).numpy()

        k = jnp.asarray(params["conv1"]["conv"]["kernel"])
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x), k, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bnp = params["bn1"]["bn"]
        bns = stats["bn1"]["bn"]
        y = (y - bns["mean"]) / np.sqrt(bns["var"] + 1e-5) * bnp["scale"] + bnp["bias"]
        y = jax.nn.relu(y)
        np.testing.assert_allclose(np.asarray(y), ty, atol=1e-4)


class TestDecoderImport:
    def test_depth_decoder_structure(self):
        rng = np.random.default_rng(2)
        chans_in = {4: (512, 256), 3: (256, 128), 2: (128, 64), 1: (64, 32), 0: (32, 16)}
        skip = {4: 256, 3: 128, 2: 64, 1: 64, 0: 0}
        sd = {}
        idx = 0
        for i in range(4, -1, -1):
            cin, cout = chans_in[i]
            sd[f"decoder.{idx}.conv.conv.weight"] = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
            sd[f"decoder.{idx}.conv.conv.bias"] = rng.standard_normal(cout).astype(np.float32)
            idx += 1
            cin1 = cout + skip[i]
            sd[f"decoder.{idx}.conv.conv.weight"] = rng.standard_normal((cout, cin1, 3, 3)).astype(np.float32)
            sd[f"decoder.{idx}.conv.conv.bias"] = rng.standard_normal(cout).astype(np.float32)
            idx += 1
        dec_ch = [16, 32, 64, 128, 256]
        for s in range(4):
            sd[f"decoder.{10+s}.conv.weight"] = rng.standard_normal((1, dec_ch[s], 3, 3)).astype(np.float32)
            sd[f"decoder.{10+s}.conv.bias"] = rng.standard_normal(1).astype(np.float32)

        params = depth_decoder_torch_to_flax(sd)
        net = MD2DepthNet(num_layers=18)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        assert _tree_shapes(params) == _tree_shapes(v["params"]["decoder"])

    def test_pose_decoder_structure(self):
        rng = np.random.default_rng(3)
        sd = {}
        shapes = [(256, 512, 1), (256, 256, 3), (256, 256, 3), (12, 256, 1)]
        for idx, (o, i, k) in enumerate(shapes):
            sd[f"net.{idx}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
            sd[f"net.{idx}.bias"] = rng.standard_normal(o).astype(np.float32)
        params = pose_decoder_torch_to_flax(sd)
        net = build_pose_net()
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False)
        assert _tree_shapes(params) == _tree_shapes(v["params"]["decoder"])


class TestPretrainedEncoderInit:
    """load_pretrained_encoder: ImageNet start for a ResNet-50 zoo with a
    separate ResNet-18 pose file (reference fetches both implicitly via
    torchvision, networks/resnet_encoder.py:46-53)."""

    class _State:
        def __init__(self, params, stats):
            self.params, self.stats = params, stats

        def replace(self, **kw):
            return TestPretrainedEncoderInit._State(
                kw.get("params", self.params), kw.get("stats", self.stats)
            )

    def test_cadepth_rn50_depth_rn18_pose(self, tmp_path):
        import sys

        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from torch_zoo_refs import make_resnet50

        from baseboostdepth_tpu.models.cadepth import CADepthNet
        from baseboostdepth_tpu.models import build_pose_net
        from baseboostdepth_tpu.models.torch_import import load_pretrained_encoder

        rng = np.random.default_rng(7)
        rn50_sd = {k: v for k, v in make_resnet50().state_dict().items()}
        rn18_sd = {k: torch.from_numpy(v) for k, v in _make_torch_resnet18_sd(rng).items()}
        p50, p18 = str(tmp_path / "rn50.pth"), str(tmp_path / "rn18.pth")
        torch.save(rn50_sd, p50)
        torch.save(rn18_sd, p18)

        depth_v = CADepthNet().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
        )
        pose_v = build_pose_net().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False
        )
        state = self._State(
            params={"depth": dict(depth_v["params"]), "pose": dict(pose_v["params"])},
            stats={"depth": dict(depth_v["batch_stats"]), "pose": dict(pose_v["batch_stats"])},
        )
        out = load_pretrained_encoder(state, p50, "cadepth", pose_path=p18)

        # depth encoder conv1 took the rn50 weights (OIHW -> HWIO)
        got = out.params["depth"]["encoder"]["conv1"]["conv"]["kernel"]
        want = np.transpose(rn50_sd["conv1.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_array_equal(got, want)
        # pose conv1 is the rn18 conv1 tiled over 6 channels and halved
        # (networks/resnet_encoder.py:49-52)
        pg = out.params["pose"]["encoder"]["conv1"]["conv"]["kernel"]
        w18 = np.transpose(rn18_sd["conv1.weight"].numpy(), (2, 3, 1, 0))
        assert pg.shape == (7, 7, 6, 64)
        np.testing.assert_allclose(pg, np.concatenate([w18, w18], axis=2) / 2.0, rtol=1e-6)
        # untouched leaves (decoder) keep their init values
        np.testing.assert_array_equal(
            out.params["depth"]["decoder"]["dispconv_0"]["conv"]["kernel"],
            depth_v["params"]["decoder"]["dispconv_0"]["conv"]["kernel"],
        )


class TestMPViTImport:
    def test_structure_matches_flax_init(self):
        """Synthetic vendored-MPViT state dict converts onto our MPViT tree
        exactly (shapes + structure)."""
        from baseboostdepth_tpu.models.monovit import MPViT
        from baseboostdepth_tpu.models.torch_import import mpvit_torch_to_flax

        enc = MPViT()
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), train=False)
        ref_p, ref_s = v["params"], v["batch_stats"]

        # build a torch-layout dict with shapes inverted from the flax tree
        rng = np.random.default_rng(0)
        sd = {}

        def conv_t(k):  # flax [kh,kw,I,O] -> torch [O,I,kh,kw]
            return rng.standard_normal(
                (k.shape[3], k.shape[2], k.shape[0], k.shape[1])
            ).astype(np.float32)

        def fill_convbn(dst_flax, src):
            sd[src + ".conv.weight"] = conv_t(ref_p[dst_flax]["conv"]["kernel"])
            c = ref_p[dst_flax]["bn"]["scale"].shape[0]
            for nm, sh in (("weight", c), ("bias", c), ("running_mean", c), ("running_var", c)):
                sd[src + f".bn.{nm}"] = rng.standard_normal(sh).astype(np.float32)

        fill_convbn("stem_0", "stem.0")
        fill_convbn("stem_1", "stem.1")
        num_path, num_layers = (2, 3, 3, 3), (1, 3, 6, 3)
        for s in range(4):
            for p in range(num_path[s]):
                dst = f"stage{s}_embed{p}"
                src = f"patch_embed_stages.{s}.patch_embeds.{p}.patch_conv"
                sd[src + ".dwconv.weight"] = conv_t(ref_p[dst]["dwconv"]["kernel"])
                sd[src + ".pwconv.weight"] = conv_t(ref_p[dst]["pwconv"]["kernel"])
                c = ref_p[dst]["bn"]["scale"].shape[0]
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    sd[src + f".bn.{nm}"] = rng.standard_normal(c).astype(np.float32)
            dst = f"stage{s}_invres"
            src = f"mhca_stages.{s}.InvRes"
            sd[src + ".conv1.conv.weight"] = conv_t(ref_p[dst]["conv1"]["conv"]["kernel"])
            sd[src + ".dwconv.weight"] = conv_t(ref_p[dst]["dwconv"]["kernel"])
            sd[src + ".conv2.conv.weight"] = conv_t(ref_p[dst]["conv2"]["conv"]["kernel"])
            for bnname, c in (
                ("conv1.bn", ref_p[dst]["conv1"]["bn"]["scale"].shape[0]),
                ("norm", ref_p[dst]["norm"]["scale"].shape[0]),
                ("conv2.bn", ref_p[dst]["conv2"]["bn"]["scale"].shape[0]),
            ):
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    sd[src + f".{bnname}.{nm}"] = rng.standard_normal(c).astype(np.float32)
            for p in range(num_path[s]):
                dst = f"stage{s}_path{p}"
                src = f"mhca_stages.{s}.mhca_blks.{p}"
                sd[src + ".cpe.proj.weight"] = conv_t(ref_p[dst]["cpe"]["proj"]["kernel"])
                sd[src + ".cpe.proj.bias"] = rng.standard_normal(
                    ref_p[dst]["cpe"]["proj"]["bias"].shape[0]).astype(np.float32)
                for k in range(3):
                    kk = ref_p[dst]["crpe"][f"conv_{k}"]["kernel"]
                    sd[f"{src}.crpe.conv_list.{k}.weight"] = conv_t(kk)
                    sd[f"{src}.crpe.conv_list.{k}.bias"] = rng.standard_normal(kk.shape[3]).astype(np.float32)
                for i in range(num_layers[s]):
                    blk = f"{src}.MHCA_layers.{i}"
                    bp = ref_p[dst][f"block_{i}"]
                    for lnn in ("norm1", "norm2"):
                        c = bp[lnn]["scale"].shape[0]
                        sd[blk + f".{lnn}.weight"] = rng.standard_normal(c).astype(np.float32)
                        sd[blk + f".{lnn}.bias"] = rng.standard_normal(c).astype(np.float32)
                    for dn, tn in (
                        ("attn.qkv", ".factoratt_crpe.qkv"), ("attn.proj", ".factoratt_crpe.proj"),
                        ("mlp_fc1", ".mlp.fc1"), ("mlp_fc2", ".mlp.fc2"),
                    ):
                        node = bp["attn"][dn.split(".")[1]] if dn.startswith("attn") else bp[dn]
                        sd[blk + tn + ".weight"] = rng.standard_normal(node["kernel"].shape[::-1]).astype(np.float32)
                        sd[blk + tn + ".bias"] = rng.standard_normal(node["bias"].shape[0]).astype(np.float32)
            fill_convbn(f"stage{s}_aggregate", f"mhca_stages.{s}.aggregate")

        params, stats = mpvit_torch_to_flax(sd)
        assert _tree_shapes(params) == _tree_shapes(ref_p)
        assert _tree_shapes(stats) == _tree_shapes(ref_s)
