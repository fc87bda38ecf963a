"""Torch checkpoint importers: torchvision ResNets and the reference's
saved .pth files -> flax parameter trees.

The reference ships/loads torch state_dicts (ImageNet-pretrained encoders
networks/resnet_encoder.py:46-53; per-model .pth checkpoints
trainer.py:783-829). These importers map them mechanically onto our module
trees (conv OIHW -> HWIO, BN weight/bias/running_mean/running_var ->
scale/bias + batch_stats mean/var), enabling the "(pre)" configs and
metric-parity checks against published checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth into numpy arrays (drops the reference's smuggled
    height/width entries, trainer.py:798-800)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd and all(
        not hasattr(v, "numpy") for k, v in sd.items() if k != "model"
    ):
        sd = sd["model"]  # MPViT release checkpoints wrap under 'model'
    out = {}
    for k, v in sd.items():
        if k in ("height", "width"):
            continue
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch conv weight [O, I, kh, kw] -> flax kernel [kh, kw, I, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def _dw_conv_w(w: np.ndarray) -> np.ndarray:
    """torch depthwise conv [O, 1, kh, kw] -> flax [kh, kw, 1, O]."""
    return np.transpose(w, (2, 3, 1, 0))


def resnet_torch_to_flax(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision-style ResNet state_dict -> (params, batch_stats) for
    models.resnet.ResnetEncoder. `prefix` strips e.g. 'encoder.' from the
    reference's saved encoders."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(dst: str, src: str):
        params.setdefault(dst, {})["conv"] = {"kernel": _conv_w(sd[prefix + src + ".weight"])}

    def bn(dst: str, src: str):
        params.setdefault(dst, {})["bn"] = {
            "scale": sd[prefix + src + ".weight"],
            "bias": sd[prefix + src + ".bias"],
        }
        stats.setdefault(dst, {})["bn"] = {
            "mean": sd[prefix + src + ".running_mean"],
            "var": sd[prefix + src + ".running_var"],
        }

    conv("conv1", "conv1")
    bn("bn1", "bn1")

    layer_keys = [k[len(prefix):] for k in sd if k.startswith(prefix + "layer")]
    blocks = sorted({(int(k[5]), int(k.split(".")[1])) for k in layer_keys})
    for li, bi in blocks:
        base = f"layer{li}.{bi}"
        dst = f"layer{li}_{bi}"
        params[dst] = {}
        stats[dst] = {}

        def bconv(name):
            params[dst][name] = {"conv": {"kernel": _conv_w(sd[prefix + f"{base}.{name}.weight"])}}

        def bbn(name):
            params[dst][name] = {
                "bn": {
                    "scale": sd[prefix + f"{base}.{name}.weight"],
                    "bias": sd[prefix + f"{base}.{name}.bias"],
                }
            }
            stats[dst][name] = {
                "bn": {
                    "mean": sd[prefix + f"{base}.{name}.running_mean"],
                    "var": sd[prefix + f"{base}.{name}.running_var"],
                }
            }

        n_convs = 3 if prefix + f"{base}.conv3.weight" in sd else 2
        for c in range(1, n_convs + 1):
            bconv(f"conv{c}")
            bbn(f"bn{c}")
        if prefix + f"{base}.downsample.0.weight" in sd:
            params[dst]["downsample_conv"] = {
                "conv": {"kernel": _conv_w(sd[prefix + f"{base}.downsample.0.weight"])}
            }
            params[dst]["downsample_bn"] = {
                "bn": {
                    "scale": sd[prefix + f"{base}.downsample.1.weight"],
                    "bias": sd[prefix + f"{base}.downsample.1.bias"],
                }
            }
            stats[dst]["downsample_bn"] = {
                "bn": {
                    "mean": sd[prefix + f"{base}.downsample.1.running_mean"],
                    "var": sd[prefix + f"{base}.downsample.1.running_var"],
                }
            }
    return params, stats


def depth_decoder_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference depth.pth (networks/depth_decoder.py ModuleList layout:
    decoder.0..9 = upconv (4,0),(4,1),(3,0)...(0,1); decoder.10..13 =
    dispconv 0..3) -> our DepthDecoder params."""
    params: Dict[str, Any] = {}
    for idx in range(10):
        i = 4 - idx // 2
        j = idx % 2
        w = sd[f"decoder.{idx}.conv.conv.weight"]
        b = sd[f"decoder.{idx}.conv.conv.bias"]
        params[f"upconv_{i}_{j}"] = {
            "conv": {"conv": {"kernel": _conv_w(w), "bias": b}}
        }
    for s in range(4):
        w = sd[f"decoder.{10 + s}.conv.weight"]
        b = sd[f"decoder.{10 + s}.conv.bias"]
        params[f"dispconv_{s}"] = {"conv": {"kernel": _conv_w(w), "bias": b}}
    return params


def pose_decoder_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference pose.pth (networks/pose_decoder.py ModuleList: net.0 =
    squeeze, net.1/2 = pose convs, net.3 = head) -> PoseDecoder params."""
    names = ["squeeze", "pose_0", "pose_1", "pose_2"]
    params: Dict[str, Any] = {}
    for idx, name in enumerate(names):
        params[name] = {
            "kernel": _conv_w(sd[f"net.{idx}.weight"]),
            "bias": sd[f"net.{idx}.bias"],
        }
    return params


def import_reference_md2(folder: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference weights_* folder (encoder.pth/depth.pth/
    pose_encoder.pth/pose.pth) into our {'depth','pose'} params/stats."""
    import os

    enc_sd = load_torch_state_dict(os.path.join(folder, "encoder.pth"))
    enc_p, enc_s = resnet_torch_to_flax(enc_sd, prefix="encoder.")
    dec_p = depth_decoder_torch_to_flax(load_torch_state_dict(os.path.join(folder, "depth.pth")))

    pe_sd = load_torch_state_dict(os.path.join(folder, "pose_encoder.pth"))
    pe_p, pe_s = resnet_torch_to_flax(pe_sd, prefix="encoder.")
    pd_p = pose_decoder_torch_to_flax(load_torch_state_dict(os.path.join(folder, "pose.pth")))

    params = {
        "depth": {"encoder": enc_p, "decoder": dec_p},
        "pose": {"encoder": pe_p, "decoder": pd_p},
    }
    stats = {
        "depth": {"encoder": enc_s},
        "pose": {"encoder": pe_s},
    }
    return params, stats


def load_pretrained_encoder(state, path: str, zoo: str):
    """ImageNet init: replace the depth encoder (and 2-image pose encoder,
    conv1 tiled/averaged like networks/resnet_encoder.py:49-52) from a
    torchvision ResNet .pth."""
    sd = load_torch_state_dict(path)
    enc_p, enc_s = resnet_torch_to_flax(sd)

    params = dict(state.params)
    stats = dict(state.stats)

    if zoo == "md2":
        depth_p = dict(params["depth"])
        depth_p["encoder"] = _merge(params["depth"]["encoder"], enc_p)
        params["depth"] = depth_p
        depth_s = dict(stats["depth"])
        depth_s["encoder"] = _merge(stats["depth"]["encoder"], enc_s)
        stats["depth"] = depth_s

    # pose encoder: duplicate conv1 across the 2-frame input and halve
    pose_enc_p, pose_enc_s = resnet_torch_to_flax(sd)
    k = pose_enc_p["conv1"]["conv"]["kernel"]
    pose_enc_p["conv1"]["conv"]["kernel"] = np.concatenate([k, k], axis=2) / 2.0
    pose_p = dict(params["pose"])
    pose_p["encoder"] = _merge(params["pose"]["encoder"], pose_enc_p)
    params["pose"] = pose_p
    pose_s = dict(stats["pose"])
    pose_s["encoder"] = _merge(stats["pose"]["encoder"], pose_enc_s)
    stats["pose"] = pose_s

    return state.replace(params=params, stats=stats)


def _merge(dst, src):
    """Recursively overlay src onto dst, keeping dst entries src lacks and
    asserting shape agreement (the reference loads with dict-intersection
    filtering, trainer.py:817-821)."""
    import jax

    out = dict(dst)
    for k, v in src.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            if k in out and hasattr(out[k], "shape"):
                assert tuple(out[k].shape) == tuple(np.shape(v)), (k, out[k].shape, np.shape(v))
            out[k] = np.asarray(v, dtype=np.float32)
    return out


# ---------------------------------------------------------------------------
# MPViT (MonoViT encoder) importer
# ---------------------------------------------------------------------------
def mpvit_torch_to_flax(
    sd: Dict[str, np.ndarray],
    num_path=(2, 3, 3, 3),
    num_layers=(1, 3, 6, 3),
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Vendored-MPViT state dict (networksvit/mpvit.py module names; the
    released mpvit_small.pth the reference loads at mpvit.py:815) -> our
    models.monovit.MPViT params/batch_stats."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_bn(dst: str, src: str):
        params[dst] = {
            "conv": {"kernel": _conv_w(sd[src + ".conv.weight"])},
            "bn": {"scale": sd[src + ".bn.weight"], "bias": sd[src + ".bn.bias"]},
        }
        stats[dst] = {
            "bn": {"mean": sd[src + ".bn.running_mean"], "var": sd[src + ".bn.running_var"]}
        }

    def dense(src: str):
        return {"kernel": sd[src + ".weight"].T, "bias": sd[src + ".bias"]}

    def ln(src: str):
        return {"scale": sd[src + ".weight"], "bias": sd[src + ".bias"]}

    conv_bn("stem_0", "stem.0")
    conv_bn("stem_1", "stem.1")

    for s in range(4):
        for p in range(num_path[s]):
            src = f"patch_embed_stages.{s}.patch_embeds.{p}.patch_conv"
            dst = f"stage{s}_embed{p}"
            params[dst] = {
                "dwconv": {"kernel": _dw_conv_w(sd[src + ".dwconv.weight"])},
                "pwconv": {"kernel": _conv_w(sd[src + ".pwconv.weight"])},
                "bn": {"scale": sd[src + ".bn.weight"], "bias": sd[src + ".bn.bias"]},
            }
            stats[dst] = {
                "bn": {"mean": sd[src + ".bn.running_mean"], "var": sd[src + ".bn.running_var"]}
            }

        # conv path (InvRes / ResBlock)
        src = f"mhca_stages.{s}.InvRes"
        dst = f"stage{s}_invres"
        params[dst] = {
            "conv1": {
                "conv": {"kernel": _conv_w(sd[src + ".conv1.conv.weight"])},
                "bn": {"scale": sd[src + ".conv1.bn.weight"], "bias": sd[src + ".conv1.bn.bias"]},
            },
            "dwconv": {"kernel": _dw_conv_w(sd[src + ".dwconv.weight"])},
            "norm": {"scale": sd[src + ".norm.weight"], "bias": sd[src + ".norm.bias"]},
            "conv2": {
                "conv": {"kernel": _conv_w(sd[src + ".conv2.conv.weight"])},
                "bn": {"scale": sd[src + ".conv2.bn.weight"], "bias": sd[src + ".conv2.bn.bias"]},
            },
        }
        stats[dst] = {
            "conv1": {"bn": {"mean": sd[src + ".conv1.bn.running_mean"], "var": sd[src + ".conv1.bn.running_var"]}},
            "norm": {"mean": sd[src + ".norm.running_mean"], "var": sd[src + ".norm.running_var"]},
            "conv2": {"bn": {"mean": sd[src + ".conv2.bn.running_mean"], "var": sd[src + ".conv2.bn.running_var"]}},
        }

        # transformer paths
        for p in range(num_path[s]):
            src = f"mhca_stages.{s}.mhca_blks.{p}"
            dst = f"stage{s}_path{p}"
            pd: Dict[str, Any] = {
                "cpe": {"proj": {"kernel": _dw_conv_w(sd[src + ".cpe.proj.weight"]),
                                  "bias": sd[src + ".cpe.proj.bias"]}},
                "crpe": {},
            }
            for k in range(3):
                pd["crpe"][f"conv_{k}"] = {
                    "kernel": _dw_conv_w(sd[f"{src}.crpe.conv_list.{k}.weight"]),
                    "bias": sd[f"{src}.crpe.conv_list.{k}.bias"],
                }
            for i in range(num_layers[s]):
                blk = f"{src}.MHCA_layers.{i}"
                pd[f"block_{i}"] = {
                    "norm1": ln(blk + ".norm1"),
                    "norm2": ln(blk + ".norm2"),
                    "attn": {
                        "qkv": dense(blk + ".factoratt_crpe.qkv"),
                        "proj": dense(blk + ".factoratt_crpe.proj"),
                    },
                    "mlp_fc1": dense(blk + ".mlp.fc1"),
                    "mlp_fc2": dense(blk + ".mlp.fc2"),
                }
            params[dst] = pd

        conv_bn(f"stage{s}_aggregate", f"mhca_stages.{s}.aggregate")
    return params, stats


def monovit_decoder_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference MonoViT depth.pth (networksvit/hr_decoder.py ModuleDict
    'convs.*' keys) -> our models.monovit.HRDecoder params."""
    params: Dict[str, Any] = {}

    def conv(src):
        out = {"kernel": _conv_w(sd[src + ".weight"])}
        if src + ".bias" in sd:
            out["bias"] = sd[src + ".bias"]
        return out

    def se_fc(src):
        return {
            "fc1": {"kernel": sd[src + ".fc.0.weight"].T},
            "fc2": {"kernel": sd[src + ".fc.2.weight"].T},
        }

    for i in (1, 2, 3, 4):
        src = f"convs.f{i}"
        params[f"f{i}"] = {
            "ca": se_fc(src + ".ca"),
            "conv_se": conv(src + ".conv_se"),
        }

    # Conv_0 blocks (keyed by torch (i, j) source position)
    for key in list(sd):
        if ".conv.conv.weight" in key and "_Conv_0" in key:
            # convs.X_{i}{j}_Conv_0.conv.conv.weight
            tag = key.split(".")[1]  # X_{i}{j}_Conv_0
            i, j = tag[2], tag[3]
            params[f"X_{i}{j}_conv0"] = {"conv": {"conv": conv(f"convs.{tag}.conv.conv")}}

    # Conv_1 blocks: torch keys them by the SOURCE (row+1, col-1); our names
    # use the produced lattice index -- except X_04's own second conv.
    # torch X_{r}{c}_Conv_1 (r>=1) produced lattice node X_{r-1}{c+1}.
    for key in list(sd):
        if ".conv.conv.weight" in key and "_Conv_1" in key:
            tag = key.split(".")[1]
            r, c = int(tag[2]), int(tag[3])
            if (r, c) == (0, 4):
                dst = "X_04_conv1"
            else:
                dst = f"X_{r - 1}{c + 1}_conv1"
            params[dst] = {"conv": {"conv": conv(f"convs.{tag}.conv.conv")}}

    for index in ("31", "22", "13", "04"):
        src = f"convs.X_{index}_attention"
        params[f"X_{index}_att"] = {
            **se_fc(src),
            "conv_se": conv(src + ".conv_se"),
        }
    for index in ("02", "12", "03", "13", "04"):
        key = f"convs.X_{index}_downsample.conv.weight"
        if key in sd:
            params[f"X_{index}_down"] = {"kernel": _conv_w(sd[key])}

    for i in range(4):
        params[f"dispconv{i}"] = {"conv": conv(f"convs.dispconv{i}.conv")}
    return params


def import_reference_monovit(folder: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference MonoViT weights_* folder (encoder.pth = MPViT,
    depth.pth = HR decoder, pose_encoder.pth/pose.pth = ResNet-18 pose pair)
    into our {'depth','pose'} params/stats."""
    import os

    enc_p, enc_s = mpvit_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "encoder.pth"))
    )
    dec_p = monovit_decoder_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "depth.pth"))
    )
    pe_p, pe_s = resnet_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "pose_encoder.pth")), prefix="encoder."
    )
    pd_p = pose_decoder_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "pose.pth"))
    )
    params = {
        "depth": {"encoder": enc_p, "decoder": dec_p},
        "pose": {"encoder": pe_p, "decoder": pd_p},
    }
    stats = {"depth": {"encoder": enc_s}, "pose": {"encoder": pe_s}}
    return params, stats
