"""Pallas TPU kernel for bilinear image warping (grid_sample equivalent).

Why: XLA lowers the gather at the heart of the warp to ~17ns/element scalar
fetches -- 74ms per 12-image warp, which made the whole reference method
step warp-bound (see tools/warp_experiments*.py). Mosaic on v5e supports
arbitrary dynamic gathers only WITHIN an (8 sublane x 128 lane) tile
(tools/pallas_probe.py), so this kernel decomposes the global 2D gather
into a sweep over (8-row band) x (128-col block) source tiles:

  for each output tile [8, 128]:
    compute the bounding box of its source coordinates, then visit only the
    intersecting (band, block) pairs (fori over bands, pl.when over blocks;
    typically ~3 x 3 of the full 25 x 6 sweep). For each visited pair and
    each of its 8 rows: broadcast the row, lane-gather at the tile's
    x-offsets (two gathers: the x0 and x0+1 columns), and accumulate the
    four bilinear corners under their (band, row, block) masks into VMEM
    scratch.

All arithmetic is VPU-vectorized; no scalar gathers anywhere.

The source is edge-padded to tile multiples (+1 row/col) so x0+1 / y0+1
never leave the array and border-clamp semantics (torch grid_sample
padding_mode='border') fall out naturally. Inputs are *clamped pixel
coordinates*; the caller normalizes and clamps, so coordinate gradients
saturate outside the image exactly like torch.

Backward: source images are training data (never differentiated), so the
custom VJP returns only coordinate gradients, computed by a sibling kernel
from the same corner values:
  d out / d px = (1-wy) (v01 - v00) + wy (v11 - v10)
  d out / d py = (1-wx) (v10 - v00) + wx (v11 - v01)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
TILE_W = 128
# Each grid step processes BLOCK_H output rows across the full width; the
# kernel loops over (8 x 128) subtiles internally. Fewer, fatter grid steps
# amortize per-step pipeline overhead (4320 tiny steps measured ~2x slower
# than the XLA gather; 108 fat steps run the sweep at VPU speed). 64 won
# the sweep under both identity and KITTI-scale poses; BBD_WARP_BLOCK_H
# overrides for experiments.
import os as _os

BLOCK_H = int(_os.environ.get("BBD_WARP_BLOCK_H", "64"))
# Experimental: skip band rows with no bilinear hits inside each visited
# (band, block) pair. The bounding-box sweep charges 8 rows x 2 lane-gathers
# per visit regardless of hits; with realistic poses an output subtile's
# y-span covers ~9-10 consecutive source rows split over ~2 bands, so
# roughly half the row iterations gather nothing. Costs one vector
# any-reduce + branch per row and per-row scratch accumulation. A/B via
# env; exactness: tests/test_warp_pallas.py::TestRowSkipVariant (bit-
# identical, subprocess env). REJECTED on TPU v5e: full step 441.9 ms vs
# 192.6 control (docs/results/bench_worst_rowskip_r5h.json) — the
# per-row pl.when branch + scratch read-modify-write swamps the skipped
# gathers; Mosaic keeps the branchless 8-row unrolled sweep in registers.
# Kept selectable for other geometries.
ROW_SKIP = bool(int(_os.environ.get("BBD_WARP_ROW_SKIP", "0")))


def _tile_indices(px, py):
    x0f = jnp.floor(px)
    y0f = jnp.floor(py)
    wx = px - x0f
    wy = py - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    return x0, y0, wx, wy


def _sweep(src_ref, px, py, a00, a01, a10, a11):
    """Accumulate the 4 bilinear corner values into scratch refs."""
    Hp, Wp = src_ref.shape
    n_blocks = Wp // TILE_W

    x0, y0, wx, wy = _tile_indices(px, py)
    x1 = x0 + 1
    y1 = y0 + 1

    q0, r0 = y0 >> 3, y0 & 7
    q1, r1 = y1 >> 3, y1 & 7
    g0, xl0 = x0 >> 7, x0 & 127
    g1, xl1 = x1 >> 7, x1 & 127

    qmin = jnp.min(q0)
    qmax = jnp.max(q1)
    gmin = jnp.min(g0)
    gmax = jnp.max(g1)

    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    a00[:] = zero
    a01[:] = zero
    a10[:] = zero
    a11[:] = zero

    def band_body(q, carry):
        band = src_ref[pl.ds(q * TILE_H, TILE_H), :]  # [8, Wp]
        in_q0 = q0 == q
        in_q1 = q1 == q

        for g in range(n_blocks):

            def visit(g=g):
                blk = band[:, g * TILE_W : (g + 1) * TILE_W]
                m00 = in_q0 & (g0 == g)
                m01 = in_q0 & (g1 == g)
                m10 = in_q1 & (g0 == g)
                m11 = in_q1 & (g1 == g)
                acc00, acc01, acc10, acc11 = a00[:], a01[:], a10[:], a11[:]
                for rr in range(TILE_H):
                    row = jnp.broadcast_to(blk[rr][None, :], (TILE_H, TILE_W))
                    v_x0 = jnp.take_along_axis(row, xl0, axis=1)
                    v_x1 = jnp.take_along_axis(row, xl1, axis=1)
                    hit0 = r0 == rr
                    hit1 = r1 == rr
                    acc00 = acc00 + jnp.where(m00 & hit0, v_x0, 0.0)
                    acc01 = acc01 + jnp.where(m01 & hit0, v_x1, 0.0)
                    acc10 = acc10 + jnp.where(m10 & hit1, v_x0, 0.0)
                    acc11 = acc11 + jnp.where(m11 & hit1, v_x1, 0.0)
                a00[:] = acc00
                a01[:] = acc01
                a10[:] = acc10
                a11[:] = acc11

            pl.when((g >= gmin) & (g <= gmax))(visit)
        return carry

    jax.lax.fori_loop(qmin, qmax + 1, band_body, 0)
    return wx, wy


def _sweep_packed(src_ref, px, py, a00, a01, a10, a11):
    """Packed-uint32 variant: each lane holds R | G<<8 | B<<16 of one pixel,
    so ONE gather fetches all three channels. Masks are exclusive across
    visits, so the packed integer passes through the masked accumulation
    intact; channels unpack after the sweep."""
    Hp, Wp = src_ref.shape
    n_blocks = Wp // TILE_W

    x0, y0, wx, wy = _tile_indices(px, py)
    x1 = x0 + 1
    y1 = y0 + 1

    q0, r0 = y0 >> 3, y0 & 7
    q1, r1 = y1 >> 3, y1 & 7
    g0, xl0 = x0 >> 7, x0 & 127
    g1, xl1 = x1 >> 7, x1 & 127

    qmin = jnp.min(q0)
    qmax = jnp.max(q1)
    gmin = jnp.min(g0)
    gmax = jnp.max(g1)

    zero = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    a00[:] = zero
    a01[:] = zero
    a10[:] = zero
    a11[:] = zero

    def band_body(q, carry):
        band = src_ref[pl.ds(q * TILE_H, TILE_H), :]
        in_q0 = q0 == q
        in_q1 = q1 == q

        for g in range(n_blocks):

            def visit(g=g):
                blk = band[:, g * TILE_W : (g + 1) * TILE_W]
                m00 = in_q0 & (g0 == g)
                m01 = in_q0 & (g1 == g)
                m10 = in_q1 & (g0 == g)
                m11 = in_q1 & (g1 == g)
                if ROW_SKIP:
                    for rr in range(TILE_H):
                        act00 = m00 & (r0 == rr)
                        act01 = m01 & (r0 == rr)
                        act10 = m10 & (r1 == rr)
                        act11 = m11 & (r1 == rr)

                        def row_visit(rr=rr, act00=act00, act01=act01,
                                      act10=act10, act11=act11):
                            row = jnp.broadcast_to(
                                blk[rr][None, :], (TILE_H, TILE_W)
                            )
                            v_x0 = jnp.take_along_axis(row, xl0, axis=1)
                            v_x1 = jnp.take_along_axis(row, xl1, axis=1)
                            a00[:] = a00[:] + jnp.where(act00, v_x0, 0)
                            a01[:] = a01[:] + jnp.where(act01, v_x1, 0)
                            a10[:] = a10[:] + jnp.where(act10, v_x0, 0)
                            a11[:] = a11[:] + jnp.where(act11, v_x1, 0)

                        pl.when(jnp.any(act00 | act01 | act10 | act11))(
                            row_visit
                        )
                    return
                acc00, acc01, acc10, acc11 = a00[:], a01[:], a10[:], a11[:]
                for rr in range(TILE_H):
                    row = jnp.broadcast_to(blk[rr][None, :], (TILE_H, TILE_W))
                    v_x0 = jnp.take_along_axis(row, xl0, axis=1)
                    v_x1 = jnp.take_along_axis(row, xl1, axis=1)
                    hit0 = r0 == rr
                    hit1 = r1 == rr
                    acc00 = acc00 + jnp.where(m00 & hit0, v_x0, 0)
                    acc01 = acc01 + jnp.where(m01 & hit0, v_x1, 0)
                    acc10 = acc10 + jnp.where(m10 & hit1, v_x0, 0)
                    acc11 = acc11 + jnp.where(m11 & hit1, v_x1, 0)
                a00[:] = acc00
                a01[:] = acc01
                a10[:] = acc10
                a11[:] = acc11

            pl.when((g >= gmin) & (g <= gmax))(visit)
        return carry

    jax.lax.fori_loop(qmin, qmax + 1, band_body, 0)
    return wx, wy


def _unpack(v):
    """packed int32 -> (r, g, b) floats in [0, 1]."""
    r = (v & 0xFF).astype(jnp.float32)
    g = ((v >> 8) & 0xFF).astype(jnp.float32)
    b = ((v >> 16) & 0xFF).astype(jnp.float32)
    return r * (1.0 / 255.0), g * (1.0 / 255.0), b * (1.0 / 255.0)


def _fwd_kernel_packed(src_ref, px_ref, py_ref, out_ref, a00, a01, a10, a11):
    bh, bw = px_ref.shape
    for i0 in range(0, bh, TILE_H):
        for j0 in range(0, bw, TILE_W):
            px = px_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            py = py_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            wx, wy = _sweep_packed(src_ref, px, py, a00, a01, a10, a11)
            p00, p01, p10, p11 = a00[:], a01[:], a10[:], a11[:]
            for c in range(3):
                v00 = _unpack(p00)[c]
                v01 = _unpack(p01)[c]
                v10 = _unpack(p10)[c]
                v11 = _unpack(p11)[c]
                top = v00 + (v01 - v00) * wx
                bot = v10 + (v11 - v10) * wx
                out_ref[c, i0 : i0 + TILE_H, j0 : j0 + TILE_W] = top + (bot - top) * wy


def _bwd_kernel_packed(src_ref, px_ref, py_ref, g_ref, gpx_ref, gpy_ref, a00, a01, a10, a11):
    bh, bw = px_ref.shape
    for i0 in range(0, bh, TILE_H):
        for j0 in range(0, bw, TILE_W):
            px = px_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            py = py_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            wx, wy = _sweep_packed(src_ref, px, py, a00, a01, a10, a11)
            p00, p01, p10, p11 = a00[:], a01[:], a10[:], a11[:]
            gpx = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            gpy = jnp.zeros((TILE_H, TILE_W), jnp.float32)
            for c in range(3):
                v00 = _unpack(p00)[c]
                v01 = _unpack(p01)[c]
                v10 = _unpack(p10)[c]
                v11 = _unpack(p11)[c]
                g = g_ref[c, i0 : i0 + TILE_H, j0 : j0 + TILE_W]
                gpx = gpx + g * ((1.0 - wy) * (v01 - v00) + wy * (v11 - v10))
                gpy = gpy + g * ((1.0 - wx) * (v10 - v00) + wx * (v11 - v01))
            gpx_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W] = gpx
            gpy_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W] = gpy


def _fwd_kernel(src_ref, px_ref, py_ref, out_ref, a00, a01, a10, a11):
    bh, bw = px_ref.shape
    for i0 in range(0, bh, TILE_H):
        for j0 in range(0, bw, TILE_W):
            px = px_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            py = py_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            wx, wy = _sweep(src_ref, px, py, a00, a01, a10, a11)
            v00, v01, v10, v11 = a00[:], a01[:], a10[:], a11[:]
            top = v00 + (v01 - v00) * wx
            bot = v10 + (v11 - v10) * wx
            out_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W] = top + (bot - top) * wy


def _bwd_kernel(src_ref, px_ref, py_ref, g_ref, gpx_ref, gpy_ref, a00, a01, a10, a11):
    bh, bw = px_ref.shape
    for i0 in range(0, bh, TILE_H):
        for j0 in range(0, bw, TILE_W):
            px = px_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            py = py_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            wx, wy = _sweep(src_ref, px, py, a00, a01, a10, a11)
            v00, v01, v10, v11 = a00[:], a01[:], a10[:], a11[:]
            g = g_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            gpx_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W] = g * (
                (1.0 - wy) * (v01 - v00) + wy * (v11 - v10)
            )
            gpy_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W] = g * (
                (1.0 - wx) * (v10 - v00) + wx * (v11 - v01)
            )


def _pad_to(x, h, w):
    ph = h - x.shape[-2]
    pw = w - x.shape[-1]
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)], mode="edge")


def _round_up(v, m):
    return (v + m - 1) // m * m


_SCRATCH = [pltpu.VMEM((TILE_H, TILE_W), jnp.float32)] * 4


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _warp_planes(planes, px, py, channels, interpret):
    out, _ = _warp_planes_fwd(planes, px, py, channels, interpret)
    return out


def _warp_planes_fwd(planes, px, py, channels, interpret):
    """planes [B*C, Hp, Wp]; px/py [B, Ho, Wo] clamped pixel coords ->
    out [B*C, Ho, Wo]. Coordinates are shared across the C plane group via
    the index map (no host-side duplication)."""
    NC, Hp, Wp = planes.shape
    B, Ho, Wo = px.shape
    C = channels
    bh = min(BLOCK_H, Ho)
    grid = (NC, Ho // bh)
    coord_spec = pl.BlockSpec(
        (None, bh, Wo), lambda n, i: (n // C, i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((NC, Ho, Wo), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Hp, Wp), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
        ],
        out_specs=pl.BlockSpec(
            (None, bh, Wo), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=list(_SCRATCH),
        interpret=interpret,
    )(planes, px, py)
    return out, (planes, px, py)


def _warp_planes_bwd(channels, interpret, res, gout):
    planes, px, py = res
    NC, Hp, Wp = planes.shape
    B, Ho, Wo = px.shape
    C = channels
    bh = min(BLOCK_H, Ho)
    grid = (NC, Ho // bh)
    coord_spec = pl.BlockSpec(
        (None, bh, Wo), lambda n, i: (n // C, i, 0), memory_space=pltpu.VMEM
    )
    plane_tile = pl.BlockSpec(
        (None, bh, Wo), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM
    )
    gpx_nc, gpy_nc = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NC, Ho, Wo), jnp.float32),
            jax.ShapeDtypeStruct((NC, Ho, Wo), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Hp, Wp), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
            plane_tile,
        ],
        out_specs=(plane_tile, plane_tile),
        scratch_shapes=list(_SCRATCH),
        interpret=interpret,
    )(planes, px, py, gout)
    # sum the coordinate gradients over the channel group
    gpx = gpx_nc.reshape(B, C, Ho, Wo).sum(axis=1)
    gpy = gpy_nc.reshape(B, C, Ho, Wo).sum(axis=1)
    return None, gpx, gpy


_warp_planes.defvjp(_warp_planes_fwd, _warp_planes_bwd)


def bilinear_sample_pallas(img: jax.Array, grid: jax.Array, interpret: bool = False) -> jax.Array:
    """Drop-in equivalent of ops.sampling.bilinear_sample backed by the
    Pallas kernel.

    Args:
      img:  [..., H, W, C]
      grid: [..., Ho, Wo, 2] normalized coords ([-1, 1], align_corners=True).
    """
    H, W, C = img.shape[-3:]
    lead = img.shape[:-3]
    Ho, Wo = grid.shape[-3:-1]
    B = int(np.prod(lead)) if lead else 1

    x = (grid[..., 0].reshape(B, Ho, Wo) + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1].reshape(B, Ho, Wo) + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    Hp = _round_up(H + 1, TILE_H)
    Wp = _round_up(W + 1, TILE_W)
    planes = jnp.moveaxis(img.reshape(B, H, W, C), -1, 1).reshape(B * C, H, W)
    planes = _pad_to(planes.astype(jnp.float32), Hp, Wp)

    Hop = _round_up(Ho, BLOCK_H if Ho >= BLOCK_H else TILE_H)
    Wop = _round_up(Wo, TILE_W)
    if (Hop, Wop) != (Ho, Wo):
        x = _pad_to(x, Hop, Wop)
        y = _pad_to(y, Hop, Wop)

    out = _warp_planes(planes, x, y, C, interpret)
    out = out[:, :Ho, :Wo].reshape(B, C, Ho, Wo)
    out = jnp.moveaxis(out, 1, -1)
    return out.reshape(lead + (Ho, Wo, C)).astype(img.dtype)


# ---------------------------------------------------------------------------
# Packed-uint8 public API (the training path: sources are uint8 frames)
# ---------------------------------------------------------------------------
_SCRATCH_I32 = [pltpu.VMEM((TILE_H, TILE_W), jnp.int32)] * 4


def pack_rgb(frames_u8: jax.Array) -> jax.Array:
    """uint8 [..., H, W, 3] -> packed int32 [..., H, W] (R | G<<8 | B<<16)."""
    f = frames_u8.astype(jnp.int32)
    return f[..., 0] | (f[..., 1] << 8) | (f[..., 2] << 16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _warp_packed(packed, px, py, interpret):
    out, _ = _warp_packed_fwd(packed, px, py, interpret)
    return out


def _warp_packed_fwd(packed, px, py, interpret):
    """packed int32 [N, Hp, Wp]; px/py [N, Ho, Wo] clamped pixel coords ->
    out float32 [N, 3, Ho, Wo] in [0, 1]."""
    N, Hp, Wp = packed.shape
    _, Ho, Wo = px.shape
    bh = min(BLOCK_H, Ho)
    grid = (N, Ho // bh)
    coord_spec = pl.BlockSpec((None, bh, Wo), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _fwd_kernel_packed,
        out_shape=jax.ShapeDtypeStruct((N, 3, Ho, Wo), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Hp, Wp), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
        ],
        out_specs=pl.BlockSpec(
            (None, 3, bh, Wo), lambda n, i: (n, 0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=list(_SCRATCH_I32),
        interpret=interpret,
    )(packed, px, py)
    return out, (packed, px, py)


def _warp_packed_bwd(interpret, res, gout):
    packed, px, py = res
    N, Hp, Wp = packed.shape
    _, Ho, Wo = px.shape
    bh = min(BLOCK_H, Ho)
    grid = (N, Ho // bh)
    coord_spec = pl.BlockSpec((None, bh, Wo), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM)
    gpx, gpy = pl.pallas_call(
        _bwd_kernel_packed,
        out_shape=(
            jax.ShapeDtypeStruct((N, Ho, Wo), jnp.float32),
            jax.ShapeDtypeStruct((N, Ho, Wo), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Hp, Wp), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
            pl.BlockSpec((None, 3, bh, Wo), lambda n, i: (n, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(coord_spec, coord_spec),
        scratch_shapes=list(_SCRATCH_I32),
        interpret=interpret,
    )(packed, px, py, gout)
    return None, gpx, gpy


_warp_packed.defvjp(_warp_packed_fwd, _warp_packed_bwd)


# ---------------------------------------------------------------------------
# Corner-plane variant: sweep ONCE, let XLA blend and differentiate.
#
# The packed fwd/bwd pair above runs the gather sweep twice per training use
# (forward, then the VJP re-sweeps to rebuild the corners). Emitting the four
# packed corner planes instead of the blended image removes the second sweep
# entirely: the bilinear blend
#     out = v00 + (v01-v00)*wx + ... ,  wx = px - floor(px)
# happens in XLA, where autodiff through wx/wy reproduces exactly the
# hand-derived coordinate gradient (d out/d px = (1-wy)(v01-v00)+wy(v11-v10);
# floor contributes zero a.e., and the caller's coordinate clip saturates
# out-of-image gradients like torch border mode). Because the kernel's
# outputs are int32 (and its float inputs are wrapped in stop_gradient), no
# gradient ever crosses the pallas_call -- no custom VJP needed. As a bonus
# the unpack+blend is plain elementwise XLA that fuses straight into the
# photometric loss consuming the warp: the warp+photometric "megakernel" done
# by the compiler instead of by hand.
# ---------------------------------------------------------------------------


def _corner_kernel(src_ref, px_ref, py_ref, out_ref, a00, a01, a10, a11):
    bh, bw = px_ref.shape
    for i0 in range(0, bh, TILE_H):
        for j0 in range(0, bw, TILE_W):
            px = px_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            py = py_ref[i0 : i0 + TILE_H, j0 : j0 + TILE_W]
            _sweep_packed(src_ref, px, py, a00, a01, a10, a11)
            out_ref[0, i0 : i0 + TILE_H, j0 : j0 + TILE_W] = a00[:]
            out_ref[1, i0 : i0 + TILE_H, j0 : j0 + TILE_W] = a01[:]
            out_ref[2, i0 : i0 + TILE_H, j0 : j0 + TILE_W] = a10[:]
            out_ref[3, i0 : i0 + TILE_H, j0 : j0 + TILE_W] = a11[:]


def _corner_sweep(packed, px, py, interpret):
    """packed int32 [N, Hp, Wp]; px/py [N, Ho, Wo] clamped pixel coords ->
    corner planes int32 [N, 4, Ho, Wo] (v00, v01, v10, v11 packed RGB)."""
    N, Hp, Wp = packed.shape
    _, Ho, Wo = px.shape
    bh = min(BLOCK_H, Ho)
    grid = (N, Ho // bh)
    coord_spec = pl.BlockSpec((None, bh, Wo), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _corner_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 4, Ho, Wo), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, Hp, Wp), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM),
            coord_spec,
            coord_spec,
        ],
        out_specs=pl.BlockSpec(
            (None, 4, bh, Wo), lambda n, i: (n, 0, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=list(_SCRATCH_I32),
        interpret=interpret,
    )(packed, px, py)


def bilinear_sample_corner_u8(
    frames_u8: jax.Array, grid: jax.Array, interpret: bool = False
) -> jax.Array:
    """Bilinear warp of uint8 RGB sources via the corner-plane kernel.

    Numerically identical to bilinear_sample_pallas_u8 (same sweep, same
    blend) but with ONE gather sweep per training step instead of two: the
    backward pass is the XLA autodiff of the blend over the saved corner
    planes -- fused elementwise work, no kernel.

    Args:
      frames_u8: [..., H, W, 3] uint8.
      grid: [..., Ho, Wo, 2] normalized coords.
    Returns:
      [..., Ho, Wo, 3] float32.
    """
    H, W, C = frames_u8.shape[-3:]
    assert C == 3 and frames_u8.dtype == jnp.uint8
    lead = frames_u8.shape[:-3]
    Ho, Wo = grid.shape[-3:-1]
    B = int(np.prod(lead)) if lead else 1

    x = (grid[..., 0].reshape(B, Ho, Wo) + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1].reshape(B, Ho, Wo) + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    Hp = _round_up(H + 1, TILE_H)
    Wp = _round_up(W + 1, TILE_W)
    packed = pack_rgb(frames_u8.reshape(B, H, W, 3))
    packed = _pad_to(packed, Hp, Wp)

    Hop = _round_up(Ho, BLOCK_H if Ho >= BLOCK_H else TILE_H)
    Wop = _round_up(Wo, TILE_W)
    xp, yp = x, y
    if (Hop, Wop) != (Ho, Wo):
        xp = _pad_to(x, Hop, Wop)
        yp = _pad_to(y, Hop, Wop)

    corners = _corner_sweep(
        packed, jax.lax.stop_gradient(xp), jax.lax.stop_gradient(yp), interpret
    )
    corners = corners[:, :, :Ho, :Wo]

    # d wx/d x = 1 (jnp.floor's gradient is zero); the clip above saturates
    # gradients outside the image, matching torch border mode
    wx = x - jnp.floor(x)
    wy = y - jnp.floor(y)
    c00, c01, c10, c11 = corners[:, 0], corners[:, 1], corners[:, 2], corners[:, 3]

    def unpack_ch(v, c):
        return ((v >> (8 * c)) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)

    outs = []
    for c in range(3):
        v00 = unpack_ch(c00, c)
        v01 = unpack_ch(c01, c)
        v10 = unpack_ch(c10, c)
        v11 = unpack_ch(c11, c)
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        outs.append(top + (bot - top) * wy)
    out = jnp.stack(outs, axis=-1)
    return out.reshape(lead + (Ho, Wo, 3))


def bilinear_sample_pallas_u8(
    frames_u8: jax.Array, grid: jax.Array, interpret: bool = False
) -> jax.Array:
    """Bilinear warp of uint8 RGB sources -> float images in [0, 1].

    Exactly equivalent to bilinear_sample(frames/255, grid) but with all
    three channels fetched by a single packed gather per corner column
    (sources are uint8, so the packed round-trip is lossless).

    Args:
      frames_u8: [..., H, W, 3] uint8.
      grid: [..., Ho, Wo, 2] normalized coords.
    Returns:
      [..., Ho, Wo, 3] float32.
    """
    H, W, C = frames_u8.shape[-3:]
    assert C == 3 and frames_u8.dtype == jnp.uint8
    lead = frames_u8.shape[:-3]
    Ho, Wo = grid.shape[-3:-1]
    B = int(np.prod(lead)) if lead else 1

    x = (grid[..., 0].reshape(B, Ho, Wo) + 1.0) * 0.5 * (W - 1)
    y = (grid[..., 1].reshape(B, Ho, Wo) + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    Hp = _round_up(H + 1, TILE_H)
    Wp = _round_up(W + 1, TILE_W)
    packed = pack_rgb(frames_u8.reshape(B, H, W, 3))
    packed = _pad_to(packed, Hp, Wp)

    Hop = _round_up(Ho, BLOCK_H if Ho >= BLOCK_H else TILE_H)
    Wop = _round_up(Wo, TILE_W)
    if (Hop, Wop) != (Ho, Wo):
        x = _pad_to(x, Hop, Wop)
        y = _pad_to(y, Hop, Wop)

    out = _warp_packed(packed, x, y, interpret)  # [B, 3, Hop, Wop]
    out = out[:, :, :Ho, :Wo]
    out = jnp.moveaxis(out, 1, -1)
    return out.reshape(lead + (Ho, Wo, 3))
