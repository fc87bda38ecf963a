"""Phase-domain scale-0 decoder tail (ops/phase_tail.py) vs the direct path.

The phase formulation re-bins the same arithmetic taps (reference
networks/depth_decoder.py:44-58 semantics: nearest up2 -> reflect Conv3x3
-> ELU -> reflect dispconv -> sigmoid), so forward AND gradients must match
the direct computation to fp32 rounding, including image boundaries where
edge-pad-in-phase-space must reproduce full-res reflect-pad.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from baseboostdepth_tpu.ops.phase_tail import (
    depth_to_space2,
    phase_s2dconv,
    phase_upconv,
)
from baseboostdepth_tpu.ops.resize import upsample2x_nearest


def _reflect_conv(x, k, b):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b


def _tail_direct(x, k1, b1, kd, bd):
    z = jax.nn.elu(_reflect_conv(upsample2x_nearest(x), k1, b1))
    return jax.nn.sigmoid(_reflect_conv(z, kd, bd))


def _tail_phase(x, k1, b1, kd, bd):
    z = jax.nn.elu(phase_upconv(x, k1, b1))
    return depth_to_space2(jax.nn.sigmoid(phase_s2dconv(z, kd, bd)))


def _case(seed, B, H, W, C, Co):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.2),
        jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.2),
        jnp.asarray(rng.standard_normal((3, 3, C, Co)).astype(np.float32) * 0.2),
        jnp.asarray(rng.standard_normal((Co,)).astype(np.float32) * 0.2),
    )


@pytest.mark.parametrize(
    "B,H,W,C,Co",
    [
        (2, 6, 10, 16, 1),   # production channel shape, small spatial
        (1, 3, 4, 8, 2),     # odd half-res height, multi-channel head
        (2, 96, 320, 4, 1),  # production spatial shape, thin channels
    ],
)
def test_forward_matches_direct(B, H, W, C, Co):
    args = _case(0, B, H, W, C, Co)
    d0 = _tail_direct(*args)
    d1 = _tail_phase(*args)
    assert d0.shape == d1.shape == (B, 2 * H, 2 * W, Co)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=2e-6)


def test_gradients_match_direct():
    args = _case(1, 2, 6, 10, 16, 1)
    cot = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 12, 20, 1)).astype(np.float32)
    )

    def loss(fn):
        return lambda *a: jnp.vdot(fn(*a), cot)

    g0 = jax.grad(loss(_tail_direct), argnums=(0, 1, 2, 3, 4))(*args)
    g1 = jax.grad(loss(_tail_phase), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_decoder_phase_gate_end_to_end(monkeypatch):
    """DepthDecoder with BBD_PHASE_TAIL=force produces the same params tree
    and the same disparities as the direct path."""
    from baseboostdepth_tpu.models.depth_decoder import DepthDecoder

    rng = np.random.default_rng(3)
    feats = [
        jnp.asarray(rng.standard_normal((2, 32 // 2**s, 80 // 2**s, c)).astype(np.float32))
        for s, c in enumerate((64, 64, 128, 256, 512))
    ]
    dec = DepthDecoder()
    monkeypatch.delenv("BBD_PHASE_TAIL", raising=False)
    variables = dec.init(jax.random.PRNGKey(0), feats)
    direct = dec.apply(variables, feats)

    monkeypatch.setenv("BBD_PHASE_TAIL", "force")
    variables_p = dec.init(jax.random.PRNGKey(0), feats)
    chex_tree_eq = jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(variables_p)
    assert chex_tree_eq, "phase gate changed the param tree"
    phase = dec.apply(variables, feats)

    assert len(direct) == len(phase) == 4
    for s, (a, b) in enumerate(zip(direct, phase)):
        assert a.shape == b.shape, s
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, err_msg=str(s))


@pytest.mark.slow
@pytest.mark.parametrize("zoo", ["diffnet", "monovit"])
def test_zoo_phase_gate_end_to_end(zoo, monkeypatch):
    """diffnet/monovit share the scale-0 pattern; the gated phase tail must
    reproduce the direct disparities with the same param tree."""
    from baseboostdepth_tpu.models import build_depth_net

    net = build_depth_net(zoo)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 64, 96, 3)).astype(np.float32))

    monkeypatch.delenv("BBD_PHASE_TAIL", raising=False)
    variables0 = net.init(jax.random.PRNGKey(0), x, train=False)
    # Random-init diffnet saturates the sigmoid heads (pre-activations are
    # huge), so the comparison would be dominated by fp32 cancellation, not
    # wiring. Scale params into a well-conditioned regime first.
    variables = dict(variables0)
    variables["params"] = jax.tree_util.tree_map(
        lambda a: a * 0.5, variables0["params"]
    )
    direct = net.apply(variables, x, train=False)

    monkeypatch.setenv("BBD_PHASE_TAIL", "force")
    variables_p = net.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(variables0) == jax.tree_util.tree_structure(
        variables_p
    ), "phase gate changed the param tree"
    phase = net.apply(variables, x, train=False)

    for s, (a, b) in enumerate(zip(direct, phase)):
        assert a.shape == b.shape, s
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, err_msg=str(s))
