"""Differentiable camera geometry, as pure JAX functions.

Covers the math of the reference's layers.py (disp_to_depth layers.py:13-22,
transformation_from_parameters layers.py:25-42, rot_from_axisangle
layers.py:61-100, BackprojectDepth layers.py:136-167, Project3D
layers.py:170-195) re-designed functionally: no per-batch-size buffer modules,
the backproject->project chain is fused into a single `warp_grid` so XLA sees
one small-matrix contraction per image instead of two stateful modules.

Conventions
-----------
- Images are NHWC.
- Pixel coordinates: x = column index, y = row index (meshgrid 'xy').
- Poses are 4x4 homogeneous matrices `T` mapping target-camera (frame 0)
  points into source-camera points, exactly like the reference's
  ("cam_T_cam", 0, f) tensors.
- `grid` outputs are in torch.grid_sample normalized coordinates ([-1, 1],
  align_corners=True convention) so they can be fed straight into
  ops.sampling.bilinear_sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose/intrinsics algebra is tiny (4x4) but precision-critical: on TPU the
# default matmul precision is bf16-ish, which corrupts SE(3) chains at the
# 1e-3 level. Force full fp32 for all geometry contractions.
_HI = jax.lax.Precision.HIGHEST


def disp_to_depth(disp: jax.Array, min_depth: float, max_depth: float):
    """Convert sigmoid disparity output into (scaled_disp, depth).

    depth = 1 / (1/max_depth + (1/min_depth - 1/max_depth) * disp).
    Parity: reference layers.py:13-22.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def rot_from_axisangle(vec: jax.Array) -> jax.Array:
    """Rodrigues rotation: axis-angle [..., 3] -> rotation matrix [..., 3, 3].

    Parity: reference layers.py:61-100 (including the +1e-7 axis
    normalization guard, which matters at angle ~ 0).
    """
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # [..., 1]
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    rot = jnp.stack(
        [
            jnp.stack([x * xC + ca, xyC - zs, zxC + ys], axis=-1),
            jnp.stack([xyC + zs, y * yC + ca, yzC - xs], axis=-1),
            jnp.stack([zxC - ys, yzC + xs, z * zC + ca], axis=-1),
        ],
        axis=-2,
    )
    return rot


def transformation_from_parameters(
    axisangle: jax.Array, translation: jax.Array, invert: bool = False
) -> jax.Array:
    """(axis-angle [..., 3], translation [..., 3]) -> SE(3) matrix [..., 4, 4].

    With invert=True returns the inverse transform built the same way the
    reference does (R^T and -t composed as M = R_inv @ T_inv), used for
    negative frame offsets. Parity: reference layers.py:25-58.
    """
    R3 = rot_from_axisangle(axisangle)  # [..., 3, 3]
    t = translation
    if invert:
        R3 = jnp.swapaxes(R3, -1, -2)
        t = -t

    batch_shape = R3.shape[:-2]
    R = jnp.zeros(batch_shape + (4, 4), dtype=R3.dtype)
    R = R.at[..., :3, :3].set(R3)
    R = R.at[..., 3, 3].set(1.0)

    T = jnp.broadcast_to(jnp.eye(4, dtype=R3.dtype), batch_shape + (4, 4))
    T = T.at[..., :3, 3].set(t)

    if invert:
        return jnp.matmul(R, T, precision=_HI)
    return jnp.matmul(T, R, precision=_HI)


def compose_poses(steps: jax.Array) -> jax.Array:
    """Chain step poses into cumulative long-jump poses.

    steps: [..., N, 4, 4] where steps[..., g, :, :] = T(g -> g+1) (the pose
    mapping frame-(g) points into frame-(g+1) points, i.e. the reference's
    ("cam_T_cam_step", g, g+1)).

    Returns [..., N, 4, 4] with out[..., g] = T(0 -> g+1) composed as
    step_g @ step_{g-1} @ ... @ step_0, matching the reference's cumulative
    right-multiply loop (trainer.py:362-373: T_cum = T_cum @ step, iterating
    from the farthest step down to step 1).

    N is small (<= 7) and static, so an unrolled scan keeps this as a handful
    of fused 4x4 matmuls; no dynamic control flow.
    """

    def body(carry, step):
        new = jnp.matmul(step, carry, precision=_HI)
        return new, new

    n = steps.shape[-3]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=steps.dtype), steps.shape[:-3] + (4, 4))
    _, out = jax.lax.scan(body, eye, jnp.moveaxis(steps, -3, 0), length=n, unroll=True)
    return jnp.moveaxis(out, 0, -3)


def pixel_rays(height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Homogeneous pixel grid [H, W, 3] with entries (x, y, 1).

    The constant the reference bakes into BackprojectDepth buffers
    (layers.py:146-158); here it is a cheap device-side iota that XLA folds.
    """
    x = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    y = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def warp_grid(
    depth: jax.Array,
    K: jax.Array,
    inv_K: jax.Array,
    T: jax.Array,
    eps: float = 1e-7,
) -> jax.Array:
    """Fused backproject->transform->project: the reference's BackprojectDepth
    (layers.py:136-167) and Project3D (layers.py:170-195) as one function.

    Args:
      depth: [B, H, W] metric depth of the target frame.
      K: [B, 4, 4] intrinsics (at full image resolution).
      inv_K: [B, 4, 4] inverse intrinsics.
      T: [B, 4, 4] cam_T_cam pose (target -> source).
      eps: projection divide guard (reference Project3D eps=1e-7).

    Returns:
      grid: [B, H, W, 2] normalized sample coordinates in the source image,
      torch.grid_sample align_corners=True convention.

    Math: for ray v = K^-1 [x, y, 1]^T, the source-camera point is
    P[:, :3] @ (d * v) + P[:, 3] with P = (K @ T)[:3], so per pixel this is
    one fused multiply-add over precontracted [B, 3, 3] / [B, 3] terms --
    XLA keeps the whole thing in registers next to the depth load.
    """
    B, H, W = depth.shape
    rays = pixel_rays(H, W, dtype=depth.dtype)  # [H, W, 3]

    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]  # [B, 3, 4]
    # A = P[:, :3, :3] @ inv_K[:3, :3]  -> [B, 3, 3];  b = P[:, :3, 3]
    A = jnp.matmul(P[:, :, :3], inv_K[:, :3, :3], precision=_HI)
    b = P[:, :, 3]

    # cam = d * (A @ v) + b, evaluated as one einsum + fma.
    Av = jnp.einsum("bij,hwj->bhwi", A, rays, precision=_HI)  # [B, H, W, 3]
    cam = depth[..., None] * Av + b[:, None, None, :]

    pix_x = cam[..., 0] / (cam[..., 2] + eps)
    pix_y = cam[..., 1] / (cam[..., 2] + eps)

    gx = 2.0 * pix_x / (W - 1) - 1.0
    gy = 2.0 * pix_y / (H - 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)


def backproject_depth(depth: jax.Array, inv_K: jax.Array) -> jax.Array:
    """Depth image -> homogeneous camera-space point cloud [B, 4, H*W].

    Kept as a standalone op for the evaluation path (the reference's
    evaluate_depth.py:26-41 re-implements this shape for SYNS point clouds).
    """
    B, H, W = depth.shape
    rays = pixel_rays(H, W, dtype=depth.dtype).reshape(-1, 3)  # [HW, 3]
    cam = jnp.einsum("bij,nj->bin", inv_K[:, :3, :3], rays, precision=_HI)  # [B, 3, HW]
    cam = depth.reshape(B, 1, -1) * cam
    ones = jnp.ones((B, 1, cam.shape[-1]), dtype=depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points: jax.Array, K: jax.Array, T: jax.Array, height: int, width: int, eps: float = 1e-7) -> jax.Array:
    """Project homogeneous points [B, 4, H*W] -> normalized grid [B, H, W, 2].

    Parity: reference layers.py:170-195 (module form); prefer warp_grid for
    the fused training path.
    """
    P = jnp.matmul(K, T, precision=_HI)[:, :3, :]
    cam = jnp.matmul(P, points, precision=_HI)  # [B, 3, HW]
    pix = cam[:, :2] / (cam[:, 2:3] + eps)
    pix = pix.reshape(points.shape[0], 2, height, width)
    pix = jnp.moveaxis(pix, 1, -1)  # [B, H, W, 2]
    gx = 2.0 * pix[..., 0] / (width - 1) - 1.0
    gy = 2.0 * pix[..., 1] / (height - 1) - 1.0
    return jnp.stack([gx, gy], axis=-1)
