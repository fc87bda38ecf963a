"""Loss assembly: min-reprojection with automasking, tri-min candidate slots,
edge-aware smoothness.

The key TPU-first design decision of the framework lives here. The reference
builds a *different-shaped* loss graph every batch: ragged sub-batches via
boolean masks and string-keyed candidate dictionaries (trainer.py:488-570,
888-981, 983-1100 / x_min_opt). On TPU that recompiles forever. Instead every
sample carries a fixed candidate-slot axis:

    slot 0: +f      slot 1: -f        (f = the sample's max frame offset)
    slot 2: +(f-1)  slot 3: -(f-1)
    slot 4: +(f-2)  slot 5: -(f-2)
    slot 6: stereo

with a [B, S] validity mask. This reproduces the reference's per-max-frame
candidate sets exactly (x_min_opt enumerates: f>=3 -> warps/identities of
+-f, +-(f-1), +-(f-2); f==2 -> +-2, +-1, s; f==1 -> +-1, s; stereo-only ->
s; trainer.py:983-1100), but as a masked min over a static tensor: the
curriculum changes mask contents, never shapes.

Candidate kinds per slot (trainer.py:548-555 for the plain path,
x_min_opt for tri-min; decomp adds error-pose warps trainer.py:996-1045):
  - warp:      photometric loss of the pose-warped source vs the target
  - identity:  photometric loss of the unwarped source vs the target,
               + tiny shared gaussian noise (automasking tie-break,
               trainer.py:518-523 -- NOTE the reference draws ONE noise map
               per sample group and adds the SAME map to every identity
               candidate, so noise breaks warp-vs-identity ties only; we
               reproduce that with one [B,1,H,W] map).
  - error:     photometric loss of the error-pose warp (decomp; temporal
               slots only, never stereo -- trainer.py:531-533).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from baseboostdepth_tpu.ops.ssim import reprojection_loss

# Masked-out candidates take this value; real losses are <= ~1.
_MASKED = 1e4


def slot_losses(
    target: jax.Array,
    images: jax.Array,
    slot_valid: jax.Array,
    use_ssim: bool = True,
    photo_fn=None,
    impl: str = "xla",
) -> jax.Array:
    """Photometric loss of each slot image against the shared target.

    Args:
      target: [B, H, W, 3] frame-0 color.
      images: [B, S, H, W, 3] per-slot images (warped or raw sources).
      slot_valid: [B, S] bool.
      photo_fn: optional (pred, target) -> [N, H, W, 1] override (the
        training step passes a shard_map-wrapped fused kernel under a
        multi-device mesh -- GSPMD would replicate a bare pallas_call).
    Returns:
      [B, S, H, W] losses, _MASKED where invalid.
    """
    B, S = images.shape[:2]
    tgt = jnp.broadcast_to(target[:, None], images.shape)
    flat_pred = images.reshape((B * S,) + images.shape[2:])
    flat_tgt = tgt.reshape((B * S,) + images.shape[2:])
    if photo_fn is not None:
        pe = photo_fn(flat_pred, flat_tgt)[..., 0]
    else:
        pe = reprojection_loss(flat_pred, flat_tgt, use_ssim=use_ssim, impl=impl)[..., 0]
    pe = pe.reshape(B, S, *pe.shape[1:])
    return jnp.where(slot_valid[:, :, None, None], pe, _MASKED)


def min_reprojection(
    warp_losses: jax.Array,
    ident_losses: jax.Array,
    noise: jax.Array,
    err_losses: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-pixel min over all candidates -> [B, H, W].

    Args:
      warp_losses:  [B, S, H, W], _MASKED at invalid slots.
      ident_losses: [B, S, H, W], _MASKED at invalid slots (computed once per
                    step, shared across scales -- the reference does the same,
                    trainer.py:505-508 outside the scale loop).
      noise: [B, 1, H, W] shared automasking noise (already scaled by 1e-5).
      err_losses: optional [B, S, H, W] error-pose warp losses (decomp);
                  stereo slot must already be masked by the caller.
    """
    cands = [warp_losses, ident_losses + noise]
    if err_losses is not None:
        cands.append(err_losses)
    all_c = jnp.concatenate(cands, axis=1)
    return jnp.min(all_c, axis=1)


def smooth_loss(disp: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware first-order disparity smoothness -> scalar.

    Parity: reference layers.py:203-216 (get_smooth_loss). `disp` should be
    mean-normalized by the caller (trainer.py:560-562).

    Args:
      disp: [B, h, w, 1], img: [B, h, w, 3].
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True)

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)

    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def normalized_disp(disp: jax.Array, eps: float = 1e-7) -> jax.Array:
    """disp / (spatial mean + eps); reference trainer.py:560-562."""
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    return disp / (mean_disp + eps)
