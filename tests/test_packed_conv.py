"""Column-packed 3x3 conv (ops/packed_conv.py) vs the direct conv.

The packed formulation is an exact reorganization of the same arithmetic
taps (reference Conv3x3 semantics, layers.py:118-133), so fwd and both
gradients must match the direct lax conv to fp32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baseboostdepth_tpu.ops.packed_conv import (
    fold_weights,
    packed_conv3x3,
    reflect_conv3x3_packed,
)


def _direct(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


CASES = [
    # (B, H, W, C, Co, G) — decoder-tail shapes plus edge cases
    (2, 12, 640, 16, 16, 8),
    (2, 12, 320, 32, 32, 4),
    (1, 8, 192, 3, 16, 8),    # input stage (C=3)
    (2, 6, 640, 16, 1, 8),    # disparity head (Co=1)
    (1, 4, 16, 8, 8, 2),      # tiny, G=2
]


@pytest.mark.parametrize("B,H,W,C,Co,G", CASES)
def test_forward_matches_direct(B, H, W, C, Co, G):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)).astype(np.float32) * 0.1)
    ref = _direct(x, w)
    got = reflect_conv3x3_packed(x, w, G=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("B,H,W,C,Co,G", CASES[:2])
def test_gradients_match_direct(B, H, W, C, Co, G):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, C, Co)).astype(np.float32) * 0.1)
    ct = jnp.asarray(rng.standard_normal((B, H, W, Co)).astype(np.float32))

    def loss_ref(x, w):
        return (_direct(x, w) * ct).sum()

    def loss_packed(x, w):
        return (reflect_conv3x3_packed(x, w, G=G) * ct).sum()

    gx1, gw1 = jax.grad(loss_ref, (0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_packed, (0, 1))(x, w)
    for a, b in ((gx1, gx2), (gw1, gw2)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 1e-5, rel


def test_fold_weight_density():
    # Each packed output column s_out sees exactly 3 logical taps per
    # (ci, co): the fold scatters 3*G*C*Co nonzeros into [3, 2, G*C, G*Co].
    w = jnp.ones((3, 3, 4, 5))
    for G in (2, 4, 8):
        wp = fold_weights(w, G)
        assert wp.shape == (3, 2, G * 4, G * 5)
        assert int((np.asarray(wp) != 0).sum()) == 3 * 3 * G * 4 * 5


def test_decoder_param_tree_unchanged():
    """ReflectConv3x3's packed refactor must keep the flax param tree
    (child scope 'conv' with kernel/bias) so existing checkpoints load."""
    from baseboostdepth_tpu.models.depth_decoder import ReflectConv3x3

    m = ReflectConv3x3(features=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32, 4)))
    p = v["params"]
    assert set(p.keys()) == {"conv"}
    assert set(p["conv"].keys()) == {"kernel", "bias"}
    assert p["conv"]["kernel"].shape == (3, 3, 4, 16)
    assert p["conv"]["bias"].shape == (16,)
