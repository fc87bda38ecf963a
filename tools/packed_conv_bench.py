"""TPU A/B of the column-packed conv vs the naive small-channel conv at the
decoder-tail shapes (fwd and fwd+bwd), plus the pack-relayout cost.

  python tools/packed_conv_bench.py [--iters 20]
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
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.ops.packed_conv import packed_conv3x3

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
        return (time.perf_counter() - t0) / args.iters - 1.0e-3

    def pert(i, c, x):
        return x + ((c + i.astype(jnp.float32)) * 1e-12).astype(x.dtype)

    def ab(name, B, H, W, C, Co, G):
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(cdt)
        w = jnp.asarray(rng.standard_normal((3, 3, C, Co)).astype(np.float32) * 0.05).astype(cdt)

        def naive(i, c, x, w):
            xp = jnp.pad(pert(i, c, x), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            y = jax.lax.conv_general_dilated(
                xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.mean(y.astype(jnp.float32))

        def packed(i, c, x, w):
            xp = jnp.pad(pert(i, c, x), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
            y = packed_conv3x3(xp, w, G=G)
            return jnp.mean(y.astype(jnp.float32))

        def naive_bwd(i, c, x, w):
            l, g = jax.value_and_grad(lambda ww: naive(i, c, x, ww))(w)
            return l + jnp.sum(g.astype(jnp.float32))

        def packed_bwd(i, c, x, w):
            l, g = jax.value_and_grad(lambda ww: packed(i, c, x, ww))(w)
            return l + jnp.sum(g.astype(jnp.float32))

        tn = scan_time(naive, x, w)
        tp = scan_time(packed, x, w)
        tnb = scan_time(naive_bwd, x, w)
        tpb = scan_time(packed_bwd, x, w)
        print(f"{name:24s} fwd {tn*1e3:7.3f} -> {tp*1e3:7.3f} ms ({tn/tp:4.1f}x)   "
              f"fwd+wgrad {tnb*1e3:7.3f} -> {tpb*1e3:7.3f} ms ({tnb/tpb:4.1f}x)")

    B = 12
    ab("upconv_0_1 16->16 @192x640", B, 192, 640, 16, 16, 8)
    ab("dispconv   16->1  @192x640", B, 192, 640, 16, 1, 8)
    ab("upconv_0_0 32->16 @96x320", B, 96, 320, 32, 16, 8)
    ab("upconv_1_1 96->32 @96x320", B, 96, 320, 96, 32, 4)
    ab("upconv_1_0 64->32 @48x160", B, 48, 160, 64, 32, 4)


if __name__ == "__main__":
    main()
