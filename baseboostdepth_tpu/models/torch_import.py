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


def load_pretrained_encoder(state, path: str, zoo: str, pose_path: str | None = None):
    """ImageNet init: replace the depth encoder (and 2-image pose encoder,
    conv1 tiled/averaged like networks/resnet_encoder.py:49-52) from
    torchvision ResNet .pth files.

    `path` initializes the depth encoder: a torchvision resnet .pth for the
    ResNet-backed zoos (md2: resnet{num_layers}; sql/cadepth: resnet50 --
    trainer.py:61-71), the released mpvit_small.pth for monovit (the
    reference loads it inside the encoder ctor, networksvit/mpvit.py:815),
    or an hrnetv2_w18 ImageNet .pth for diffnet (test_hr_encoder.py:500-547).
    The pose encoder is always a ResNet-18 (trainer.py:92-99), so when the
    depth encoder isn't one, pass the resnet18 .pth as `pose_path`.
    """
    sd = load_torch_state_dict(path)

    params = dict(state.params)
    stats = dict(state.stats)

    if zoo in ("md2", "sql", "sql_large", "cadepth", "monovit", "diffnet"):
        if zoo == "monovit":
            enc_p, enc_s = mpvit_torch_to_flax(sd)
        elif zoo == "diffnet":
            enc_p, enc_s = hrnet18_torch_to_flax(sd)
        else:
            enc_p, enc_s = resnet_torch_to_flax(sd)
        depth_p = dict(params["depth"])
        depth_p["encoder"] = _merge(params["depth"]["encoder"], enc_p)
        params["depth"] = depth_p
        depth_s = dict(stats["depth"])
        depth_s["encoder"] = _merge(stats["depth"]["encoder"], enc_s)
        stats["depth"] = depth_s

    # pose encoder: duplicate conv1 across the 2-frame input and halve.
    # For non-resnet depth encoders (monovit/diffnet) the file holds
    # mpvit/hrnet tensors that cannot seed a ResNet-18, so without an
    # explicit pose_path the pose encoder keeps its random init (the
    # reference equivalently leaves it at torchvision defaults when its
    # download is skipped).
    if pose_path is None and zoo in ("monovit", "diffnet"):
        return state.replace(params=params, stats=stats)
    pose_sd = load_torch_state_dict(pose_path) if pose_path else sd
    pose_enc_p, pose_enc_s = resnet_torch_to_flax(pose_sd)
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


# ---------------------------------------------------------------------------
# CADepth importer (networksCA checkpoints)
# ---------------------------------------------------------------------------
def cadepth_decoder_torch_to_flax(
    sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference CADepth depth.pth -> our CADecoder params/batch_stats.

    Torch layout (networksCA/depth_decoder.py:26-47): ModuleList `decoder`
    built from an OrderedDict inserted per i=4..0 as [upconv_i0, upconv_i1,
    dem_i], then dispconv 0..3; SPM is parameter-free. DEM
    (networksCA/dem.py): conv1 = Sequential(pad, conv, bn, relu) ->
    conv1.1/conv1.2; global_path = Sequential(pool, conv, relu, conv,
    sigmoid) -> global_path.1/global_path.3.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def convblock(dst, idx):
        params[dst] = {"conv": {"conv": {
            "kernel": _conv_w(sd[f"decoder.{idx}.conv.conv.weight"]),
            "bias": sd[f"decoder.{idx}.conv.conv.bias"],
        }}}

    for i in range(4, -1, -1):
        base = 3 * (4 - i)
        convblock(f"upconv_{i}_0", base)
        convblock(f"upconv_{i}_1", base + 1)
        d = f"decoder.{base + 2}"
        params[f"dem_{i}"] = {
            "conv": {"kernel": _conv_w(sd[d + ".conv1.1.weight"]),
                     "bias": sd[d + ".conv1.1.bias"]},
            "bn": {"scale": sd[d + ".conv1.2.weight"], "bias": sd[d + ".conv1.2.bias"]},
            "gate1": {"kernel": _conv_w(sd[d + ".global_path.1.weight"]),
                      "bias": sd[d + ".global_path.1.bias"]},
            "gate2": {"kernel": _conv_w(sd[d + ".global_path.3.weight"]),
                      "bias": sd[d + ".global_path.3.bias"]},
        }
        stats[f"dem_{i}"] = {
            "bn": {"mean": sd[d + ".conv1.2.running_mean"],
                   "var": sd[d + ".conv1.2.running_var"]}
        }
    for s in range(4):
        idx = 15 + s
        params[f"dispconv_{s}"] = {"conv": {
            "kernel": _conv_w(sd[f"decoder.{idx}.conv.weight"]),
            "bias": sd[f"decoder.{idx}.conv.bias"],
        }}
    return params, stats


def import_reference_cadepth(folder: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference CADepth weights_* folder (encoder.pth = ResNet-50,
    depth.pth = SPM/DEM decoder, + pose pair) into {'depth','pose'}
    params/stats (reference evaluate_depth.py:160-168 load path)."""
    import os

    enc_p, enc_s = resnet_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "encoder.pth")), prefix="encoder."
    )
    dec_p, dec_s = cadepth_decoder_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "depth.pth"))
    )
    pe_p, pe_s = resnet_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "pose_encoder.pth")), prefix="encoder."
    )
    pd_p = pose_decoder_torch_to_flax(load_torch_state_dict(os.path.join(folder, "pose.pth")))
    params = {
        "depth": {"encoder": enc_p, "decoder": dec_p},
        "pose": {"encoder": pe_p, "decoder": pd_p},
    }
    stats = {
        "depth": {"encoder": enc_s, "decoder": dec_s},
        "pose": {"encoder": pe_s},
    }
    return params, stats


# ---------------------------------------------------------------------------
# SQLdepth importer (networksSQL checkpoints)
# ---------------------------------------------------------------------------
def sql_encoder_torch_to_flax(
    sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference SQL encoder.pth (ResnetEncoderDecoder,
    networksSQL/resnet_encoder.py:143-150) -> params/stats for our
    SQLDepthNet encoder + decoder_bn. Torch layout: encoder.encoder.* =
    torchvision ResNet-50; decoder.conv2/up{1..4}._net.{0,1,3,4}/conv3 =
    DecoderBN (the _net Sequential is conv,bn,lrelu,conv,bn,lrelu)."""
    enc_p, enc_s = resnet_torch_to_flax(sd, prefix="encoder.encoder.")

    dec_p: Dict[str, Any] = {}
    dec_s: Dict[str, Any] = {}
    for name in ("conv2", "conv3"):
        dec_p[name] = {
            "kernel": _conv_w(sd[f"decoder.{name}.weight"]),
            "bias": sd[f"decoder.{name}.bias"],
        }
    for n in range(1, 5):
        up: Dict[str, Any] = {}
        ups: Dict[str, Any] = {}
        for k, tidx in ((0, 0), (1, 3)):
            up[f"conv{k}"] = {
                "kernel": _conv_w(sd[f"decoder.up{n}._net.{tidx}.weight"]),
                "bias": sd[f"decoder.up{n}._net.{tidx}.bias"],
            }
            b = f"decoder.up{n}._net.{tidx + 1}"
            up[f"bn{k}"] = {"scale": sd[b + ".weight"], "bias": sd[b + ".bias"]}
            ups[f"bn{k}"] = {"mean": sd[b + ".running_mean"], "var": sd[b + ".running_var"]}
        dec_p[f"up{n}"] = up
        dec_s[f"up{n}"] = ups
    return {"encoder": enc_p, "decoder_bn": dec_p}, {"encoder": enc_s, "decoder_bn": dec_s}


def sql_head_torch_to_flax(sd: Dict[str, np.ndarray], num_heads: int = 4) -> Dict[str, Any]:
    """Reference SQL depth.pth (Lite_Depth_Decoder_QueryTr,
    networksSQL/lite_depth_decoder_QTR.py:10-31) -> our SQLHead params.

    torch nn.MultiheadAttention packs q/k/v as in_proj_weight [3E, E]
    applied as x @ W.T; flax MultiHeadDotProductAttention wants per-head
    kernels [E, h, hd] (and out [h, hd, E])."""
    E = sd["embedding_convPxP.weight"].shape[0]
    hd = E // num_heads

    params: Dict[str, Any] = {
        "embedding_conv": {
            "kernel": _conv_w(sd["embedding_convPxP.weight"]),
            "bias": sd["embedding_convPxP.bias"],
        },
        "positional_encodings": sd["positional_encodings"],
        "conv3x3": {"kernel": _conv_w(sd["conv3x3.weight"]), "bias": sd["conv3x3.bias"]},
        "convert_to_prob": {
            "kernel": _conv_w(sd["convert_to_prob.0.weight"]),
            "bias": sd["convert_to_prob.0.bias"],
        },
    }
    for i, idx in enumerate((0, 2, 4)):
        params[f"bins{i + 1}"] = {
            "kernel": sd[f"bins_regressor.{idx}.weight"].T,
            "bias": sd[f"bins_regressor.{idx}.bias"],
        }
    for i in range(4):
        src = f"transformer_encoder.layers.{i}"
        w = sd[src + ".self_attn.in_proj_weight"]
        b = sd[src + ".self_attn.in_proj_bias"]
        attn: Dict[str, Any] = {}
        for j, name in enumerate(("query", "key", "value")):
            attn[name] = {
                "kernel": w[j * E:(j + 1) * E].T.reshape(E, num_heads, hd),
                "bias": b[j * E:(j + 1) * E].reshape(num_heads, hd),
            }
        attn["out"] = {
            "kernel": sd[src + ".self_attn.out_proj.weight"].T.reshape(num_heads, hd, E),
            "bias": sd[src + ".self_attn.out_proj.bias"],
        }
        params[f"layer{i}"] = {
            "attn": attn,
            "norm1": {"scale": sd[src + ".norm1.weight"], "bias": sd[src + ".norm1.bias"]},
            "norm2": {"scale": sd[src + ".norm2.weight"], "bias": sd[src + ".norm2.bias"]},
            "ff1": {"kernel": sd[src + ".linear1.weight"].T, "bias": sd[src + ".linear1.bias"]},
            "ff2": {"kernel": sd[src + ".linear2.weight"].T, "bias": sd[src + ".linear2.bias"]},
        }
    return params


def import_reference_sql(folder: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference SQLdepth weights_* folder (encoder.pth =
    ResnetEncoderDecoder, depth.pth = Lite QueryTr head, + pose pair) into
    {'depth','pose'} params/stats (reference evaluate_depth.py:146-158,
    trainer.py:60-67)."""
    import os

    encdec_p, encdec_s = sql_encoder_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "encoder.pth"))
    )
    head_p = sql_head_torch_to_flax(load_torch_state_dict(os.path.join(folder, "depth.pth")))
    pe_p, pe_s = resnet_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "pose_encoder.pth")), prefix="encoder."
    )
    pd_p = pose_decoder_torch_to_flax(load_torch_state_dict(os.path.join(folder, "pose.pth")))
    params = {
        "depth": {**encdec_p, "head": head_p},
        "pose": {"encoder": pe_p, "decoder": pd_p},
    }
    stats = {"depth": encdec_s, "pose": {"encoder": pe_s}}
    return params, stats


# ---------------------------------------------------------------------------
# DIFFNet importer (networksDIFF checkpoints)
# ---------------------------------------------------------------------------
def hrnet18_torch_to_flax(
    sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference DIFFNet encoder.pth (HRNet-18,
    networksDIFF/test_hr_encoder.py:295-497) -> our HRNetEncoder
    params/batch_stats. Torch layout: conv1/bn1/conv2/bn2 stem; layer1.{b}
    Bottlenecks; transition{n}.{i}[.{k}].{0,1} conv/bn chains;
    stage{s}.{m}.branches.{i}.{b} BasicBlocks and
    stage{s}.{m}.fuse_layers.{i}.{j}[.{k}].{0,1}."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv_at(tree, name, src):
        tree.setdefault(name, {})["conv"] = {"kernel": _conv_w(sd[src + ".weight"])}

    def bn_at(ptree, stree, name, src):
        ptree.setdefault(name, {})["bn"] = {
            "scale": sd[src + ".weight"], "bias": sd[src + ".bias"],
        }
        stree.setdefault(name, {})["bn"] = {
            "mean": sd[src + ".running_mean"], "var": sd[src + ".running_var"],
        }

    def convbnrelu(dst, conv_src, bn_src):
        params[dst] = {"conv": {"conv": {"kernel": _conv_w(sd[conv_src + ".weight"])}},
                       "bn": {"bn": {"scale": sd[bn_src + ".weight"],
                                     "bias": sd[bn_src + ".bias"]}}}
        stats[dst] = {"bn": {"bn": {"mean": sd[bn_src + ".running_mean"],
                                    "var": sd[bn_src + ".running_var"]}}}

    def resblock(dst, src):
        """BasicBlock/Bottleneck at torch prefix `src` -> our block dst."""
        p: Dict[str, Any] = {}
        s: Dict[str, Any] = {}
        n_convs = 3 if src + ".conv3.weight" in sd else 2
        for c in range(1, n_convs + 1):
            conv_at(p, f"conv{c}", f"{src}.conv{c}")
            bn_at(p, s, f"bn{c}", f"{src}.bn{c}")
        if src + ".downsample.0.weight" in sd:
            conv_at(p, "downsample_conv", f"{src}.downsample.0")
            bn_at(p, s, "downsample_bn", f"{src}.downsample.1")
        params[dst] = p
        stats[dst] = s

    convbnrelu("stem1", "conv1", "bn1")
    convbnrelu("stem2", "conv2", "bn2")
    for b in range(4):
        resblock(f"layer1_{b}", f"layer1.{b}")

    # transitions (networksDIFF/test_hr_encoder.py:357-390): same-branch
    # re-channel convs are plain Sequentials, new-branch stride-2 chains are
    # nested one level deeper
    convbnrelu("tr1_0", "transition1.0.0", "transition1.0.1")
    convbnrelu("tr1_1", "transition1.1.0.0", "transition1.1.0.1")
    convbnrelu("tr2_2", "transition2.2.0.0", "transition2.2.0.1")
    convbnrelu("tr3_3", "transition3.3.0.0", "transition3.3.0.1")

    for s_i, (stage, n_modules, n_branches) in enumerate(
        (("stage2", 1, 2), ("stage3", 4, 3), ("stage4", 3, 4))
    ):
        for m in range(n_modules):
            mod: Dict[str, Any] = {}
            mods: Dict[str, Any] = {}
            base = f"{stage}.{m}"
            for i in range(n_branches):
                for b in range(4):
                    src = f"{base}.branches.{i}.{b}"
                    p: Dict[str, Any] = {}
                    st: Dict[str, Any] = {}
                    for c in (1, 2):
                        conv_at(p, f"conv{c}", f"{src}.conv{c}")
                        bn_at(p, st, f"bn{c}", f"{src}.bn{c}")
                    if src + ".downsample.0.weight" in sd:
                        conv_at(p, "downsample_conv", f"{src}.downsample.0")
                        bn_at(p, st, "downsample_bn", f"{src}.downsample.1")
                    mod[f"branch{i}_block{b}"] = p
                    mods[f"branch{i}_block{b}"] = st
            for i in range(n_branches):
                for j in range(n_branches):
                    if j > i:
                        src = f"{base}.fuse_layers.{i}.{j}"
                        conv_at(mod, f"fuse{i}_{j}_conv", src + ".0")
                        bn_at(mod, mods, f"fuse{i}_{j}_bn", src + ".1")
                    elif j < i:
                        for k in range(i - j):
                            src = f"{base}.fuse_layers.{i}.{j}.{k}"
                            dstk = f"fuse{i}_{j}_down{k}"
                            mod[dstk] = {"conv": {"conv": {"kernel": _conv_w(sd[src + ".0.weight"])}},
                                         "bn": {"bn": {"scale": sd[src + ".1.weight"],
                                                       "bias": sd[src + ".1.bias"]}}}
                            mods[dstk] = {"bn": {"bn": {"mean": sd[src + ".1.running_mean"],
                                                        "var": sd[src + ".1.running_var"]}}}
            params[f"{stage}_m{m}"] = mod
            stats[f"{stage}_m{m}"] = mods
    return params, stats


def diffnet_decoder_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference DIFFNet depth.pth (HRDepthDecoder ModuleDict convs.*,
    networksDIFF/HR_Depth_Decoder.py:20-42; the duplicate decoder.{idx}.*
    ModuleList aliases are ignored) -> our DIFFNet decoder params."""
    params: Dict[str, Any] = {}

    def att(dst, src):
        params[dst] = {
            "ca": {
                "fc1": {"kernel": sd[f"convs.{src}.ca.fc.0.weight"].T},
                "fc2": {"kernel": sd[f"convs.{src}.ca.fc.2.weight"].T},
            },
            "conv_se": {
                "kernel": _conv_w(sd[f"convs.{src}.conv_se.weight"]),
                "bias": sd[f"convs.{src}.conv_se.bias"],
            },
        }

    att("att72", "72")
    att("att36", "36")
    att("att18", "18")
    att("att9", "9")
    for name in ("up_x9_0", "up_x9_1"):
        params[name] = {"conv": {"conv": {
            "kernel": _conv_w(sd[f"convs.{name}.conv.conv.weight"]),
            "bias": sd[f"convs.{name}.conv.conv.bias"],
        }}}
    for i in range(4):
        params[f"dispconv{i}"] = {"conv": {
            "kernel": _conv_w(sd[f"convs.dispConvScale{i}.conv.weight"]),
            "bias": sd[f"convs.dispConvScale{i}.conv.bias"],
        }}
    return params


def import_reference_diffnet(folder: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference DIFFNet weights_* folder (encoder.pth = HRNet-18,
    depth.pth = attention-fusion decoder, + pose pair) into
    {'depth','pose'} params/stats (reference evaluate_depth.py:170-185)."""
    import os

    enc_p, enc_s = hrnet18_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "encoder.pth"))
    )
    dec_p = diffnet_decoder_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "depth.pth"))
    )
    pe_p, pe_s = resnet_torch_to_flax(
        load_torch_state_dict(os.path.join(folder, "pose_encoder.pth")), prefix="encoder."
    )
    pd_p = pose_decoder_torch_to_flax(load_torch_state_dict(os.path.join(folder, "pose.pth")))
    params = {
        "depth": {"encoder": enc_p, **dec_p},
        "pose": {"encoder": pe_p, "decoder": pd_p},
    }
    stats = {"depth": {"encoder": enc_s}, "pose": {"encoder": pe_s}}
    return params, stats


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


# One folder-importer per zoo (reference checkpoint folders,
# evaluate_depth.py:141-199 / trainer.py:807-829 load paths).
IMPORTERS = {
    "md2": import_reference_md2,
    "monovit": import_reference_monovit,
    "sql": import_reference_sql,
    "sql_large": import_reference_sql,
    "cadepth": import_reference_cadepth,
    "diffnet": import_reference_diffnet,
}
