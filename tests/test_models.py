"""Model zoo tests: shapes, parameter counts vs the reference architectures,
and conv/pool/BN semantic parity against torch functional oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from flax import linen as nn

from baseboostdepth_tpu.models import MD2DepthNet, build_depth_net, build_pose_net
from baseboostdepth_tpu.models.resnet import ResnetEncoder, encoder_channels


H, W = 96, 160  # small but /32-clean


def _init(mod, *args, **kw):
    return mod.init(jax.random.PRNGKey(0), *args, **kw)


def _nparams(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


class TestResnetEncoder:
    @pytest.mark.parametrize("num_layers", [18, 50])
    def test_feature_shapes(self, num_layers):
        enc = ResnetEncoder(num_layers=num_layers)
        x = jnp.zeros((2, H, W, 3))
        vars_ = _init(enc, x)
        feats = enc.apply(vars_, x)
        chans = encoder_channels(num_layers)
        assert len(feats) == 5
        for i, f in enumerate(feats):
            s = 2 ** (i + 1)
            assert f.shape == (2, H // s, W // s, chans[i]), (i, f.shape)

    def test_param_count_matches_resnet18(self):
        """torchvision resnet18 has 11,176,512 conv+bn backbone params
        (11,689,512 minus the 513,000-param fc we do not carry)."""
        enc = ResnetEncoder(num_layers=18)
        vars_ = _init(enc, jnp.zeros((1, 64, 64, 3)))
        n = _nparams(vars_["params"]) + _nparams(
            jax.tree.map(lambda x: x, vars_["batch_stats"])
        )
        # params: conv kernels + bn scale/bias = the torch backbone count;
        # bn running mean/var (4800 each) live in batch_stats.
        assert _nparams(vars_["params"]) == 11176512
        assert n == 11176512 + 9600

    def test_two_image_input(self):
        enc = ResnetEncoder(num_layers=18, num_input_images=2)
        x = jnp.zeros((3, H, W, 6))
        feats = enc.apply(_init(enc, x), x)
        assert feats[-1].shape == (3, H // 32, W // 32, 512)


class TestTorchSemanticParity:
    def test_conv7x7_stride2(self):
        rng = np.random.RandomState(0)
        x = rng.randn(1, 17, 23, 3).astype(np.float32)
        w = rng.randn(7, 7, 3, 8).astype(np.float32)
        mine = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                       torch.from_numpy(w).permute(3, 2, 0, 1), stride=2, padding=3)
        np.testing.assert_allclose(np.asarray(mine), ref.permute(0, 2, 3, 1).numpy(), atol=1e-4)

    def test_maxpool_3x3_s2_p1(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 13, 19, 4).astype(np.float32)
        xp = jnp.pad(jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        mine = nn.max_pool(xp, (3, 3), strides=(2, 2), padding="VALID")
        ref = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
        np.testing.assert_allclose(np.asarray(mine), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)

    def test_batchnorm_train_and_eval(self):
        rng = np.random.RandomState(2)
        x = rng.randn(4, 6, 6, 5).astype(np.float32)
        bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        vars_ = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, updated = bn.apply(vars_, jnp.asarray(x), mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm2d(5, eps=1e-5, momentum=0.1)
        tbn.train()
        ty = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))
        np.testing.assert_allclose(np.asarray(y), ty.detach().permute(0, 2, 3, 1).numpy(), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-5
        )
        # torch tracks the *unbiased* batch variance in its running stats,
        # flax the biased one; they differ by n/(n-1) on the updated slice
        # (negligible at conv-BN n = B*H*W, here n = 144 so correct for it).
        n = 4 * 6 * 6
        flax_var = np.asarray(updated["batch_stats"]["var"])
        # running = 0.9 * init(1.0) + 0.1 * batch_var
        batch_var_biased = (flax_var - 0.9) / 0.1
        expected_torch = 0.9 + 0.1 * batch_var_biased * n / (n - 1)
        np.testing.assert_allclose(expected_torch, tbn.running_var.detach().numpy(), atol=1e-4)


class TestDepthDecoder:
    def test_disp_shapes_and_range(self):
        net = MD2DepthNet(num_layers=18)
        x = jnp.linspace(0, 1, 2 * H * W * 3).reshape(2, H, W, 3)
        vars_ = _init(net, x)
        disps = net.apply(vars_, x)
        assert len(disps) == 4
        for s, d in enumerate(disps):
            assert d.shape == (2, H // 2**s, W // 2**s, 1)
            assert float(d.min()) >= 0.0 and float(d.max()) <= 1.0

    def test_scales_subset(self):
        net = MD2DepthNet(num_layers=18, scales=(0,))
        x = jnp.zeros((1, H, W, 3))
        disps = net.apply(_init(net, x), x)
        assert len(disps) == 1 and disps[0].shape == (1, H, W, 1)


class TestPoseNet:
    def test_pose_output_shapes_and_scale(self):
        net = build_pose_net()
        pair = jnp.zeros((3, H, W, 6))
        vars_ = _init(net, pair)
        aa, t = net.apply(vars_, pair)
        assert aa.shape == (3, 3) and t.shape == (3, 3)
        # 0.01 scaling keeps initial outputs tiny
        assert float(jnp.abs(aa).max()) < 0.1 and float(jnp.abs(t).max()) < 0.1
