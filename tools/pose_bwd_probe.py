"""Split the pose net's backward cost: dgrad vs wgrad vs BN-stat backward.

pose fwd+bwd measured 75 ms vs ~26 ms expected from conv costs alone
(tools/net_bisect.py / layer_probe.py); this isolates where the extra goes.

  python tools/pose_bwd_probe.py [--iters 20]
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

    from baseboostdepth_tpu.models import build_pose_net

    BP = 216
    px = jnp.asarray(rng.random((BP, 192, 640, 6)).astype(np.float32))
    pose = build_pose_net(dtype=cdt)
    pv = pose.init(jax.random.PRNGKey(0), px[:1], train=False)
    params, stats = pv["params"], pv["batch_stats"]

    def apply_train(p, x):
        (aa, t), _ = pose.apply(
            {"params": p, "batch_stats": stats}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.mean(aa.astype(jnp.float32) ** 2) + jnp.mean(t.astype(jnp.float32) ** 2)

    def apply_eval(p, x):
        aa, t = pose.apply({"params": p, "batch_stats": stats}, x, train=False)
        return jnp.mean(aa.astype(jnp.float32) ** 2) + jnp.mean(t.astype(jnp.float32) ** 2)

    def pert(i, c, x):
        return x + ((c + i.astype(jnp.float32)) * 1e-12).astype(x.dtype)

    def g_sum(g):
        return jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda t_: jnp.sum(t_).astype(jnp.float32), g)
        )

    rows = [
        ("fwd only (train BN)", lambda i, c, x: apply_train(params, pert(i, c, x))),
        ("grad params (train BN)", lambda i, c, x: g_sum(
            jax.grad(apply_train)(params, pert(i, c, x)))),
        ("grad input only (train BN)", lambda i, c, x: g_sum(
            jax.grad(lambda xx: apply_train(params, xx))(pert(i, c, x)))),
        ("grad params (eval BN)", lambda i, c, x: g_sum(
            jax.grad(apply_eval)(params, pert(i, c, x)))),
        ("grad input only (eval BN)", lambda i, c, x: g_sum(
            jax.grad(lambda xx: apply_eval(params, xx))(pert(i, c, x)))),
    ]
    print(f"== pose net bwd split (B*P={BP}, bf16) ==")
    for name, fn in rows:
        t = scan_time(fn, px)
        print(f"{name:36s} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
