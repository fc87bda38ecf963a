"""Phase-domain (space-to-depth) scale-0 decoder tail.

Why: the MD2 decoder's finest scale runs `nearest-2x upsample -> reflect
conv3x3 (16->16) -> ELU -> dispconv (16->1)` at FULL 192x640 resolution
(reference networks/depth_decoder.py:44-58) -- two lane-starved convs plus
a 4x-materialized upsample tensor, the slowest-per-FLOP stretch of the
depth net even after column packing (ops/packed_conv.py).

Because the upsample is nearest-neighbor, the full-res output at pixel
(2i+a, 2j+b) only ever reads source pixels in a 2x2 window of the
PRE-upsample map: the whole tail can be computed at half resolution in
space-to-depth ("phase") form,

    conv3x3(reflect_pad(up2(x)))  ==  conv3x3(edge_pad(x)) with a kernel
        whose rows/cols are re-binned per output phase   [16 -> 4*16 ch]
    conv3x3(reflect_pad(z_full))  ==  conv3x3(edge_pad(z_phase)) with the
        s2d convolution identity                          [64 -> 4 ch]

followed by a 1-channel depth-to-space. The transforms are EXACT (same
arithmetic taps re-binned; reflect-pad-1 of an even-sized full-res image
maps to edge-pad-1 in phase space -- full row -1 reflects to row 1 which
is phase 1 row 0 / source row 0). Both convs run at 96x320 with 64-channel
outputs instead of 192x640 with 16/1 channels: no 4x upsample tensor ever
exists (fwd or in the conv grads), no pack/unpack relayouts, 4x fewer
spatial positions at 4x the lanes. Standard convs throughout, so XLA
differentiates everything.

Phase channel layout everywhere: channel (a*2 + b)*C + c holds phase
(row parity a, col parity b) of original channel c.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# row-tap re-binning for a conv reading a nearest-UPSAMPLED map: output
# phase a at source row i reads full rows 2i+a-1 .. 2i+a+1, which collapse
# onto source rows {i-1, i} (a=0: taps K0 | K1+K2) or {i, i+1} (a=1:
# K0+K1 | K2). Expressed as 3x3->3x3 matrices over an edge-padded source
# (offset -1 -> kernel row 0, 0 -> row 1, +1 -> row 2).
_UP_BIN = np.array(
    [
        [[1, 0, 0], [0, 1, 1], [0, 0, 0]],  # a=0: rows (-1, 0), row +1 unused
        [[0, 0, 0], [1, 1, 0], [0, 0, 1]],  # a=1: rows (0, +1), row -1 unused
    ],
    np.float32,
)  # [a, new_row, old_tap]

# tap routing for a conv reading a genuinely-interleaved full-res map held
# in phase form: output phase a tap t reads (input phase p, row offset r).
#   a=0: full rows 2i-1, 2i, 2i+1 -> (p=1, -1), (p=0, 0), (p=1, 0)
#   a=1: full rows 2i, 2i+1, 2i+2 -> (p=0, 0), (p=1, 0), (p=0, +1)
_S2D_ROUTE = {
    0: [(1, 0), (0, 1), (1, 1)],  # (p, kernel_row) per original tap 0..2
    1: [(0, 1), (1, 1), (0, 2)],
}


def upconv_phase_kernel(k: jax.Array) -> jax.Array:
    """[3,3,C,Co] -> [3,3,C,4*Co] for conv3x3(reflect_pad(up2(x)))."""
    binj = jnp.asarray(_UP_BIN, k.dtype)
    # kp[a, b, r, c, ci, co] = BIN[a, r, t] BIN[b, c, u] k[t, u, ci, co]
    kp = jnp.einsum("art,bcu,tuio->rciabo", binj, binj, k)
    kh, kw, C, A, B_, Co = kp.shape
    return kp.reshape(kh, kw, C, A * B_ * Co)


def s2d_phase_kernel(k: jax.Array) -> jax.Array:
    """[3,3,C,Co] -> [3,3,4*C,4*Co] for conv3x3(reflect_pad(d2s(z)))."""
    sel = np.zeros((2, 3, 2, 3), np.float32)  # [a, tap, p, new_row]
    for a, route in _S2D_ROUTE.items():
        for t, (p, r) in enumerate(route):
            sel[a, t, p, r] = 1.0
    selj = jnp.asarray(sel, k.dtype)
    # kd[r, c, p, q, ci, a, b, co]
    kd = jnp.einsum("atpr,buqc,tuio->rcpqiabo", selj, selj, k)
    kh, kw, P, Q, C, A, B_, Co = kd.shape
    return kd.reshape(kh, kw, P * Q * C, A * B_ * Co)


def _edge_pad1(x: jax.Array) -> jax.Array:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def _conv(xp: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def depth_to_space2(d: jax.Array) -> jax.Array:
    """[B,H,W,4*Co] phase layout -> [B,2H,2W,Co]."""
    B, H, W, C4 = d.shape
    Co = C4 // 4
    d = d.reshape(B, H, W, 2, 2, Co)
    return d.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, Co)


def phase_upconv(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """conv3x3(reflect_pad(up2(x))) computed in phase form.

    x: [B,H,W,C] pre-upsample; returns [B,H,W,4*Co] (phase layout)."""
    y = _conv(_edge_pad1(x), upconv_phase_kernel(kernel))
    return y + jnp.tile(bias, 4).astype(y.dtype)


def phase_s2dconv(z: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """conv3x3(reflect_pad(·)) of the full-res map held as phases z.

    z: [B,H,W,4*C] phase layout; returns [B,H,W,4*Co] (phase layout)."""
    y = _conv(_edge_pad1(z), s2d_phase_kernel(kernel))
    return y + jnp.tile(bias, 4).astype(y.dtype)
