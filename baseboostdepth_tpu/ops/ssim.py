"""SSIM photometric dissimilarity, torch-parity with the reference.

Reference layers.py:219-249: reflect-pad(1), five 3x3 stride-1 average pools
for mu_x/mu_y/E[x^2]/E[y^2]/E[xy], C1 = 0.01^2, C2 = 0.03^2, output
clamp((1 - SSIM)/2, 0, 1).

On TPU the five pools collapse into three reduce_window sums over the
stacked (x, y, x*x, y*y, x*y) planes; XLA fuses the pad + window + the
rational SSIM expression into one VPU pass over the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01**2
_C2 = 0.03**2


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 mean over the (H, W) axes of an NHWC tensor (valid)."""
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return s / 9.0


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel, per-channel SSIM distance in [0, 1].

    Args:
      x, y: [B, H, W, C] images.
    Returns:
      [B, H, W, C] clamp((1 - SSIM)/2, 0, 1), same spatial size (reflect pad).
    """
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    yp = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3(xp)
    mu_y = _avg_pool3(yp)

    sigma_x = _avg_pool3(xp * xp) - mu_x * mu_x
    sigma_y = _avg_pool3(yp * yp) - mu_y * mu_y
    sigma_xy = _avg_pool3(xp * yp) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)

    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def reprojection_loss(
    pred: jax.Array, target: jax.Array, use_ssim: bool = True, impl: str = "xla"
) -> jax.Array:
    """0.85 * SSIM + 0.15 * L1, channel-averaged -> [B, H, W, 1].

    Parity: reference trainer.py:477-486 (compute_reprojection_loss).

    impl: "xla" (default) is differentiable in BOTH pred and target.
    "fused" opts into the Pallas kernel (one VMEM pass + hand-derived VJP;
    ~4x the reduce_window formulation standalone, but it loses XLA
    producer/consumer fusion in-step) whose VJP returns a ZERO cotangent
    for `target` -- exactly the training semantics (targets are raw camera
    data), but wrong for any caller differentiating through the target.
    "auto" picks fused on TPU and is kept only for benchmarking tools.
    """
    if use_ssim and impl != "xla" and pred.shape[-1] == 3:
        if impl == "fused" or (impl == "auto" and jax.default_backend() == "tpu"):
            from baseboostdepth_tpu.ops.ssim_pallas import reprojection_loss_fused

            return reprojection_loss_fused(
                pred.astype(jnp.float32), target.astype(jnp.float32), False
            )
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1
