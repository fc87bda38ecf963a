"""Discriminate the ~1 ms/conv floor seen by layer_probe: per-CONV cost or
per-LOOP-ITERATION cost?

Times loop bodies with k chained convs (same shape). If iteration time grows
~k * 1 ms the floor is per-conv (op setup / serialization on device); if it
grows by a small marginal cost the floor is fori_loop overhead and the
layer_probe numbers overstate small-conv cost. Also times the full MD2-18
depth net fwd under one scan as ground truth.

  python tools/floor_probe.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16
    B, H, W, C = 12, 48, 160, 64
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)).astype(cdt)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.02).astype(cdt)

    def conv(z):
        return jax.lax.conv_general_dilated(
            z, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def timed(k):
        @jax.jit
        def run(x):
            def body(i, carry):
                z = x + ((carry + i.astype(jnp.float32)) * 1e-12).astype(cdt)
                for _ in range(k):
                    z = conv(z)
                return jnp.mean(z.astype(jnp.float32))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        return (time.perf_counter() - t0) / args.iters

    for k in (1, 2, 4, 8):
        t = timed(k)
        print(f"chained k={k}: {t*1e3:7.3f} ms/iter  ({t*1e3/k:6.3f} ms/conv)")

    # ground truth: the real depth net fwd, scanned
    from baseboostdepth_tpu.models import MD2DepthNet

    net = MD2DepthNet(num_layers=18, dtype=cdt)
    xi = jnp.asarray(rng.random((12, 192, 640, 3)).astype(np.float32))
    v = net.init(jax.random.PRNGKey(0), xi, train=False)

    @jax.jit
    def net_loop(params, stats, xi):
        def body(i, carry):
            d = net.apply({"params": params, "batch_stats": stats},
                          xi + (carry * 1e-12 + i * 1e-12).astype(xi.dtype), train=False)
            return jnp.mean(d[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

    float(net_loop(v["params"], v["batch_stats"], xi))
    t0 = time.perf_counter()
    float(net_loop(v["params"], v["batch_stats"], xi))
    t = (time.perf_counter() - t0) / args.iters
    print(f"full MD2-18 fwd (B=12, scanned): {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
