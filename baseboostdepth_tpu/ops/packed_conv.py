"""Column-packed 3x3 convolution for small-channel, high-resolution maps.

Why: on TPU, NHWC tensors tile the last dim onto the 128 vector lanes. The
MD2 decoder's fine scales run 3x3 convs with C=16 (even C_out=1 for the
disparity head) at 192x640 -- every tile is ~90% lane padding and the convs
run at 0.1-3% MFU (tools/layer_probe.py: upconv_0_1 1.26 ms for 6.8 GF,
dispconv 1.55 ms for 0.4 GF, while the same spatial size at C=128 runs at
74%).

Fix: pack G consecutive image COLUMNS into the channel dim and run ONE
conv with folded weights:

    y[b, i, g*G+s, co] = sum_{dy, dx, ci} w[dy, dx, ci, co] *
                         xp[b, i+dy, g*G+s+dx, ci]

Columns g*G .. g*G+G+1 live in packed cells {g, g+1}, so the packed conv
has kernel (3, 2) over G*C channels with weights scattered as

    Wp[dy, dxc, s_in*C+ci, s_out*Co+co] = w[dy, s_in + dxc*G - s_out, ci, co]
        where 0 <= s_in + dxc*G - s_out <= 2

(~1.5/G weight density -> G/1.5x the FLOPs, but delivered at full-lane MXU
efficiency: net ~5-10x faster for C<=32). The transform is EXACT -- same
arithmetic taps, just reorganized -- so this is a perf path, not a model
change. Reflect padding happens on the UNPACKED grid first, preserving
torch Conv3x3 semantics (reference layers.py:118-133).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fold_weights(w: jax.Array, G: int) -> jax.Array:
    """[3, 3, C, Co] -> packed [3, 2, G*C, G*Co] (see module docstring)."""
    kh, kw, C, Co = w.shape
    assert kw == 3, "column packing is specialized to kernel width 3"
    # scatter with a constant 0/1 selection tensor so the fold is a single
    # einsum (differentiable, jit-friendly; the constant folds at compile)
    sel = np.zeros((2, G, G, 3), np.float32)  # [dxc, s_in, s_out, dx]
    for dxc in range(2):
        for s_in in range(G):
            for s_out in range(G):
                dx = s_in + dxc * G - s_out
                if 0 <= dx <= 2:
                    sel[dxc, s_in, s_out, dx] = 1.0
    selj = jnp.asarray(sel, w.dtype)
    # Wp[dy, dxc, s_in, ci, s_out, co] = sel[dxc, s_in, s_out, dx] * w[dy, dx, ci, co]
    wp = jnp.einsum("abcd,ydio->yabico", selj, w)
    return wp.reshape(kh, 2, G * C, G * Co)


def packed_conv3x3(
    xp: jax.Array, w: jax.Array, G: int = 8, precision=None
) -> jax.Array:
    """VALID 3x3 conv of an already-padded map via column packing.

    Args:
      xp: [B, H+2, W+2, C] padded input (any padding mode, applied by the
          caller on the unpacked grid).
      w:  [3, 3, C, Co] logical conv weights.
      G:  columns per packed cell (G*C should be >= 128 for full lanes).
    Returns:
      [B, H, W, Co] -- identical (up to dtype rounding) to
      lax.conv_general_dilated(xp, w, VALID).
    """
    B, Hp, Wp, C = xp.shape
    W = Wp - 2
    assert W % G == 0, (W, G)
    ncells = W // G + 1  # cell g covers padded cols [g*G, g*G+G); last cell
    # holds the 2 trailing pad columns (+ zero fill)
    pad_to = ncells * G
    if pad_to != Wp:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, pad_to - Wp), (0, 0)))
    xpk = xp.reshape(B, Hp, ncells, G * C)
    wp = fold_weights(w, G)
    y = jax.lax.conv_general_dilated(
        xpk, wp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )  # [B, H, ncells-1, G*Co]
    Co = w.shape[-1]
    return y.reshape(B, Hp - 2, W, Co)


def reflect_conv3x3_packed(x: jax.Array, w: jax.Array, bias=None, G: int = 8) -> jax.Array:
    """Reflect-pad(1) + 3x3 conv, column-packed (drop-in for the decoder's
    ReflectConv3x3 math)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = packed_conv3x3(xp, w, G=G)
    if bias is not None:
        y = y + bias
    return y
