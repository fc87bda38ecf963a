"""Pose-net fwd+bwd time vs flattened pair-batch size.

Motivated by the bucket-class anomaly: the F=5 class (pose batch
B*P = 12*14 = 168) measures as slow as F=7 (216) despite 20% fewer
XLA-counted FLOPs (6.44e12 -> 5.14e12, tools/../docs). If pose fwd+bwd
does not scale with the batch here, the F=5 class's efficiency loss
lives in the pose stack's lowering, not in the step protocol.

  python tools/pose_batch_probe.py [--iters 20] [--bps 216,168,192,144]
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
    ap.add_argument("--bps", default="216,168,192,144")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    H, W = args.height, args.width

    from baseboostdepth_tpu.models import build_pose_net

    pose = build_pose_net(dtype=cdt)

    def time_bp(BP):
        px = jnp.asarray(rng.random((BP, H, W, 6)).astype(np.float32)).astype(cdt)
        pv = pose.init(jax.random.PRNGKey(0), px[:1], train=False)
        params, stats = pv["params"], pv["batch_stats"]

        def loss(p, x):
            (aa, t), _ = pose.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return (aa.astype(jnp.float32).sum() + t.astype(jnp.float32).sum())

        grad = jax.grad(loss)

        @jax.jit
        def run(p, x):
            def body(i, c):
                g = grad(p, x + c.astype(cdt))
                return jax.tree.reduce(
                    lambda a, b: a + b.astype(jnp.float32).sum(), g, jnp.float32(0)
                )

            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        float(run(params, px))  # compile
        t0 = time.perf_counter()
        float(run(params, px))
        dt = (time.perf_counter() - t0) / args.iters
        return dt

    base = None
    for bp in [int(s) for s in args.bps.split(",")]:
        dt = time_bp(bp)
        if base is None:
            base = (bp, dt)
        b_bp, b_dt = base
        print(
            f"BP={bp:4d}  fwd+bwd {dt * 1e3:7.2f} ms   "
            f"ms/img {dt * 1e3 / bp:6.4f}   "
            f"vs BP={b_bp}: time x{dt / b_dt:5.3f} for x{bp / b_bp:5.3f} batch",
            flush=True,
        )


if __name__ == "__main__":
    main()
