"""Marginal cost of single-conv input-gradients (dgrad) at pose/depth
shapes: stride-1 vs stride-2 (lhs-dilated bwd) and maxpool bwd.

The pose net's backward-data chain costs ~45 ms vs a 21.6 ms forward
(tools/pose_bwd_probe.py); if the stride-2 dgrads dominate, a custom-vjp
subpixel decomposition can replace the dilated conv.

  python tools/dgrad_probe.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--k_lo", type=int, default=1)
    ap.add_argument("--k_hi", type=int, default=4)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)

    def scan_time(fn, *xs):
        @jax.jit
        def run(*xs):
            return jax.lax.fori_loop(
                0, args.iters, lambda i, c: fn(i, c, *xs), jnp.float32(0)
            )

        float(run(*xs))
        t0 = time.perf_counter()
        float(run(*xs))
        return (time.perf_counter() - t0) / args.iters

    def dgrad_case(name, B, H, W, Cin, Cout, k, stride):
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)).astype(np.float32)).astype(cdt)
        pad = k // 2

        def make(j):
            w = jnp.asarray(
                rng.standard_normal((k, k, Cin, Cout)).astype(np.float32) * 0.05
            ).astype(cdt)

            def f(i, c):
                def conv_loss(xx):
                    y = jax.lax.conv_general_dilated(
                        xx, w, (stride, stride), ((pad, pad), (pad, pad)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return jnp.sum(y.astype(jnp.float32) ** 2)
                g = jax.grad(conv_loss)(x + ((c + i.astype(jnp.float32)) * 1e-12).astype(cdt))
                return jnp.mean(g.astype(jnp.float32))
            return f

        # marginal over k chained instances
        def body(kk):
            fns = [make(j) for j in range(kk)]

            def f(i, c):
                acc = jnp.float32(0)
                for fn in fns:
                    acc = acc + fn(i, c + acc * 0)
                return acc
            return f

        t_lo = scan_time(body(args.k_lo))
        t_hi = scan_time(body(args.k_hi))
        t = (t_hi - t_lo) / (args.k_hi - args.k_lo)
        Ho, Wo = H // stride, W // stride
        fwd_flops = 2 * B * Ho * Wo * Cin * Cout * k * k
        print(f"{name:30s} fwd+dgrad+wgrad marginal {t*1e3:7.3f} ms "
              f"(fwd-only flops {fwd_flops/1e9:6.1f} GF)")

    BP = 216
    print(f"== pose-shape convs, fwd+grad marginal (B*P={BP}, bf16) ==")
    dgrad_case("s1 layer1 64->64 @48x160", BP, 48, 160, 64, 64, 3, 1)
    dgrad_case("s2 layer2 64->128 @48x160", BP, 48, 160, 64, 128, 3, 2)
    dgrad_case("s2 1x1 ds 64->128 @48x160", BP, 48, 160, 64, 128, 1, 2)
    dgrad_case("s2 layer3 128->256 @24x80", BP, 24, 80, 128, 256, 3, 2)
    dgrad_case("s2 layer4 256->512 @12x40", BP, 12, 40, 256, 512, 3, 2)

    # maxpool fwd+bwd at the stem shape
    x = jnp.asarray(rng.standard_normal((BP, 96, 320, 64)).astype(np.float32)).astype(cdt)

    def pool_loss(xx):
        y = jax.lax.reduce_window(
            xx, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    def pool_fn(i, c):
        g = jax.grad(pool_loss)(x + ((c + i.astype(jnp.float32)) * 1e-12).astype(cdt))
        return jnp.mean(g.astype(jnp.float32))

    t = scan_time(pool_fn) - 1.0e-3
    print(f"{'maxpool3x3s2 fwd+bwd @96x320':30s} {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
