"""A/B rejected backward-lowering experiments vs XLA's native paths (TPU).

Two hand-lowered backward formulations that looked like wins on paper and
measured as losses on v5e (see CLAUDE.md round-3 rejected levers):

1. subpixel stride-2 dgrad: dL/dx of a stride-2 conv via 4 parity-phase
   stride-1 convs instead of XLA's lhs-dilated conv (which multiplies 3/4
   zeros into the MXU). Exact, but slower: the phase interleave relayout
   costs more than the zero work saves — XLA's native stride-2 dgrad is
   already well lowered here.
2. select_and_scatter-free maxpool 3x3s2 backward: first-match select
   chain over the 9 window taps + parity-phase scatter (exact torch tie
   semantics). Slower: Mosaic charges ~5 ms for the (2,2) parity
   transpose alone at 216x96x320x64.

Both are EXACT reformulations (asserted here against the native vjp), so
re-running this tool on a future compiler is cheap — if either A/B flips,
promote the implementation into ops/.

  python tools/bwd_lowering_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# --------------------------------------------------------------------------
# Experiment 1: subpixel-decomposed stride-2 backward-data
# --------------------------------------------------------------------------
def make_conv2d_s2_subpixel(jax, jnp):
    import functools

    def _phase_sizes(n):
        return -(-n // 2), n // 2

    def _conv(x, w, padding):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def _dgrad_subpixel(dy, w, x_shape, pad_h, pad_w):
        B, Ho, Wo, Cout = dy.shape
        kh, kw, Cin, _ = w.shape
        _, H, W, _ = x_shape
        Hp, Wp = H + 2 * pad_h, W + 2 * pad_w
        phases = []
        for a in (0, 1):
            row_taps = list(range(a, kh, 2))
            Mh = _phase_sizes(Hp)[a]
            for b in (0, 1):
                col_taps = list(range(b, kw, 2))
                Mw = _phase_sizes(Wp)[b]
                if not row_taps or not col_taps:
                    phases.append(((a, b), None, Mh, Mw))
                    continue
                sub = w[np.ix_(row_taps, col_taps)]
                sub = jnp.swapaxes(jnp.flip(sub, axis=(0, 1)), 2, 3)
                Ra, Rb = len(row_taps), len(col_taps)
                dyp = jnp.pad(
                    dy,
                    ((0, 0), (Ra - 1, max(0, Mh - Ho)), (Rb - 1, max(0, Mw - Wo)), (0, 0)),
                )
                out = _conv(dyp, sub, "VALID")[:, :Mh, :Mw]
                phases.append(((a, b), out, Mh, Mw))
        Mh0, Mw0 = _phase_sizes(Hp)[0], _phase_sizes(Wp)[0]
        grid = []
        for (a, b), out, Mh, Mw in phases:
            if out is None:
                out = jnp.zeros((B, Mh0, Mw0, Cin), dy.dtype)
            elif (Mh, Mw) != (Mh0, Mw0):
                out = jnp.pad(out, ((0, 0), (0, Mh0 - Mh), (0, Mw0 - Mw), (0, 0)))
            grid.append(out)
        st = jnp.stack(grid, axis=0).reshape(2, 2, B, Mh0, Mw0, Cin)
        dxpad = jnp.transpose(st, (2, 3, 0, 4, 1, 5)).reshape(B, 2 * Mh0, 2 * Mw0, Cin)[
            :, :Hp, :Wp
        ]
        return dxpad[:, pad_h : pad_h + H, pad_w : pad_w + W]

    @functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
    def conv2d_s2(x, w, pad_h, pad_w):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), ((pad_h, pad_h), (pad_w, pad_w)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def _fwd(x, w, pad_h, pad_w):
        return conv2d_s2(x, w, pad_h, pad_w), (x, w)

    def _bwd(pad_h, pad_w, res, dy):
        x, w = res
        dx = _dgrad_subpixel(dy, w, x.shape, pad_h, pad_w)
        _, dw_fn = jax.vjp(
            lambda w_: jax.lax.conv_general_dilated(
                x, w_, (2, 2), ((pad_h, pad_h), (pad_w, pad_w)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            w,
        )
        (dw,) = dw_fn(dy)
        return dx, dw

    conv2d_s2.defvjp(_fwd, _bwd)
    return conv2d_s2


# --------------------------------------------------------------------------
# Experiment 2: select_and_scatter-free maxpool backward
# --------------------------------------------------------------------------
def make_max_pool_3x3s2_custom(jax, jnp):
    @jax.custom_vjp
    def max_pool_3x3s2(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        return jax.lax.reduce_window(
            xp, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )

    def _fwd(x):
        y = max_pool_3x3s2(x)
        return y, (x, y)

    def _bwd(res, dy):
        x, y = res
        B, H, W, C = x.shape
        Ho, Wo = H // 2, W // 2
        neg = jnp.asarray(-jnp.inf, x.dtype)
        Mh, Mw = (H + 3) // 2, (W + 3) // 2
        xp = jnp.pad(
            x,
            ((0, 0), (1, 1 + (2 * Mh - H - 2)), (1, 1 + (2 * Mw - W - 2)), (0, 0)),
            constant_values=neg,
        )
        ph = jnp.transpose(
            xp.reshape(B, Mh, 2, Mw, 2, C), (0, 2, 4, 1, 3, 5)
        )

        def tap(dp, dq):
            return jax.lax.slice(
                ph,
                (0, dp % 2, dq % 2, dp // 2, dq // 2, 0),
                (B, dp % 2 + 1, dq % 2 + 1, dp // 2 + Ho, dq // 2 + Wo, C),
            ).reshape(B, Ho, Wo, C)

        views = [tap(dp, dq) for dp in range(3) for dq in range(3)]
        taken = jnp.zeros(y.shape, bool)
        grads = []
        for v in views:
            use = (v == y) & ~taken
            taken |= use
            grads.append(jnp.where(use, dy, jnp.zeros((), dy.dtype)))
        phases = []
        for a in (0, 1):
            for b in (0, 1):
                acc = jnp.zeros((B, Mh, Mw, C), dy.dtype)
                for dp in (a, a + 2):
                    if dp > 2:
                        continue
                    rs = (dp - a) // 2
                    for dq in (b, b + 2):
                        if dq > 2:
                            continue
                        cs = (dq - b) // 2
                        g = grads[dp * 3 + dq]
                        acc = acc + jnp.pad(
                            g, ((0, 0), (rs, Mh - Ho - rs), (cs, Mw - Wo - cs), (0, 0))
                        )
                phases.append(acc)
        st = jnp.stack(phases, axis=0).reshape(2, 2, B, Mh, Mw, C)
        dxp = jnp.transpose(st, (2, 3, 0, 4, 1, 5)).reshape(B, 2 * Mh, 2 * Mw, C)
        return (dxp[:, 1 : 1 + H, 1 : 1 + W],)

    max_pool_3x3s2.defvjp(_fwd, _bwd)
    return max_pool_3x3s2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def scan_time(fn, *xs):
        @jax.jit
        def run(*xs):
            return jax.lax.fori_loop(0, args.iters, lambda i, c: fn(i, c, *xs), jnp.float32(0))

        float(run(*xs))
        t0 = time.perf_counter()
        float(run(*xs))
        return (time.perf_counter() - t0) / args.iters - 1.0e-3

    def pert(i, c, x):
        return x + ((c + i.astype(jnp.float32)) * 1e-12).astype(x.dtype)

    conv2d_s2 = make_conv2d_s2_subpixel(jax, jnp)
    print("== stride-2 dgrad: native lhs-dilated vs subpixel phases ==")
    shapes = [
        ("l2.0 3x3s2 64->128 @48x160", 216, 48, 160, 64, 128, 3, 1),
        ("l3.0 3x3s2 128->256 @24x80", 216, 24, 80, 128, 256, 3, 1),
    ]
    for name, B, H, W, C, Co, k, p in shapes:
        x = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32)).astype(cdt)
        w = jnp.asarray((rng.random((k, k, C, Co)).astype(np.float32) - 0.5) * 0.1).astype(cdt)
        nat = lambda x, w: jax.lax.conv_general_dilated(
            x, w, (2, 2), ((p, p), (p, p)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        sub = lambda x, w: conv2d_s2(x, w, p, p)
        # correctness (live cotangent)
        gx_n = jax.grad(lambda xx: jnp.sum(nat(xx, w).astype(jnp.float32) ** 2))(x)
        gx_s = jax.grad(lambda xx: jnp.sum(sub(xx, w).astype(jnp.float32) ** 2))(x)
        err = float(jnp.max(jnp.abs(gx_n.astype(jnp.float32) - gx_s.astype(jnp.float32))))
        for tag, f in (("native", nat), ("subpix", sub)):
            loss = lambda xx, f=f: jnp.sum(f(xx, w).astype(jnp.float32) ** 2)
            t = scan_time(lambda i, c, x: jnp.sum(jax.grad(loss)(pert(i, c, x)).astype(jnp.float32)), x)
            print(f"{name:28s} {tag}: fwd+dgrad {t*1e3:7.2f} ms  (dgrad err {err:.1e})")

    print("== maxpool 3x3s2 backward: select_and_scatter vs select chain ==")
    mp_custom = make_max_pool_3x3s2_custom(jax, jnp)

    def mp_native(xx):
        xp = jnp.pad(xx, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        return nn.max_pool(xp, (3, 3), strides=(2, 2), padding="VALID")

    B = 216
    x = jnp.asarray(rng.random((B, 96, 320, 64)).astype(np.float32)).astype(cdt)
    g_n = jax.grad(lambda xx: jnp.sum(mp_native(xx).astype(jnp.float32) ** 2))(x)
    g_c = jax.grad(lambda xx: jnp.sum(mp_custom(xx).astype(jnp.float32) ** 2))(x)
    err = float(jnp.max(jnp.abs(g_n.astype(jnp.float32) - g_c.astype(jnp.float32))))
    for tag, f in (("native", mp_native), ("custom", mp_custom)):
        loss = lambda xx, f=f: jnp.sum(f(xx).astype(jnp.float32) ** 2)
        t = scan_time(lambda i, c, x: jnp.sum(jax.grad(loss)(pert(i, c, x)).astype(jnp.float32)), x)
        print(f"maxpool 216x96x320x64 {tag}: fwd+bwd {t*1e3:7.2f} ms  (grad err {err:.1e})")


if __name__ == "__main__":
    main()
