"""Fused SSIM+L1 Pallas kernel vs the XLA formulation (which is itself
torch-oracle-tested in tests/test_ops.py): forward parity and hand-derived
backward vs autodiff, in interpret mode on CPU (testing convention,
CLAUDE.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from baseboostdepth_tpu.ops.ssim import reprojection_loss
from baseboostdepth_tpu.ops.ssim_pallas import reprojection_loss_fused

N, H, W = 2, 24, 40


def _data(seed=0, correlated=True):
    rng = np.random.default_rng(seed)
    tgt = rng.random((N, H, W, 3), dtype=np.float32)
    if correlated:
        # warped-image-like pred: target + noise (keeps SSIM off its clip
        # rails for a meaningful gradient check)
        pred = np.clip(tgt + 0.1 * rng.standard_normal(tgt.shape), 0, 1).astype(np.float32)
    else:
        pred = rng.random((N, H, W, 3), dtype=np.float32)
    return jnp.asarray(pred), jnp.asarray(tgt)


def test_forward_matches_xla():
    for corr in (True, False):
        pred, tgt = _data(1, corr)
        ref = reprojection_loss(pred, tgt)
        got = reprojection_loss_fused(pred, tgt, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_backward_matches_autodiff():
    pred, tgt = _data(2)
    rng = np.random.default_rng(3)
    cot = jnp.asarray(rng.random((N, H, W, 1), dtype=np.float32))

    def ref_loss(p):
        return jnp.sum(reprojection_loss(p, tgt) * cot)

    def fused_loss(p):
        return jnp.sum(reprojection_loss_fused(p, tgt, True) * cot)

    g_ref = jax.grad(ref_loss)(pred)
    g_fused = jax.grad(fused_loss)(pred)
    scale = float(jnp.abs(g_ref).max()) + 1e-12
    err = float(jnp.abs(g_ref - g_fused).max()) / scale
    assert err < 1e-4, err


def test_shard_map_fused_photometric_stays_sharded_and_exact():
    """Multi-device path: the training step shard_maps the fused kernel over
    the data axis (a bare pallas_call would be replicated by GSPMD). Values,
    sharding, and pred-gradients must match the XLA formulation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(np.array(jax.devices()), ("data",))

    pred, tgt = _data(7)
    big_pred = jnp.tile(pred, (8, 1, 1, 1))
    big_tgt = jnp.tile(tgt, (8, 1, 1, 1))
    pred_s = jax.device_put(big_pred, NamedSharding(mesh, P("data")))
    tgt_s = jax.device_put(big_tgt, NamedSharding(mesh, P("data")))

    fused = jax.shard_map(
        lambda p, t: reprojection_loss_fused(p, t, True),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    out = jax.jit(fused)(pred_s, tgt_s)
    assert out.sharding.spec == P("data")
    ref = reprojection_loss(big_pred, big_tgt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)

    g_f = jax.grad(lambda p: jnp.sum(jax.jit(fused)(p, tgt_s)))(pred_s)
    g_r = jax.grad(lambda p: jnp.sum(reprojection_loss(p, big_tgt)))(big_pred)
    scale = float(jnp.abs(g_r).max()) + 1e-12
    assert float(jnp.abs(g_f - g_r).max()) / scale < 1e-4


def test_backward_edge_rows_cols():
    """Border pixels exercise the reflect-fold adjoint; check them
    explicitly against autodiff."""
    pred, tgt = _data(4)

    def ref_loss(p):
        return jnp.sum(reprojection_loss(p, tgt))

    def fused_loss(p):
        return jnp.sum(reprojection_loss_fused(p, tgt, True))

    g_ref = np.asarray(jax.grad(ref_loss)(pred))
    g_fused = np.asarray(jax.grad(fused_loss)(pred))
    for sl in [np.s_[:, 0, :, :], np.s_[:, -1, :, :], np.s_[:, :, 0, :],
               np.s_[:, :, -1, :], np.s_[:, 1, 1, :]]:
        np.testing.assert_allclose(
            g_fused[sl], g_ref[sl],
            atol=2e-5 * float(np.abs(g_ref).max() + 1e-9),
            rtol=2e-4,
            err_msg=str(sl),
        )
