"""Bisect the in-step cost of the depth and pose nets: conv work vs BN /
padding / upsample / backward glue.

Times scanned (in-jit loop, overhead ~1 ms/iter measured by floor_probe)
variants of the REAL nets:
  fwd eval        train=False (running BN stats)
  fwd train       train=True (batch-stat reductions live)
  fwd+bwd train   value_and_grad (the step's actual depth/pose cost)

  python tools/net_bisect.py [--iters 20]
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
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)

    def scan_time(fn, *xs):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(i, carry, *xs)
                return out
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        float(run(*xs))
        t0 = time.perf_counter()
        out = float(run(*xs))
        assert np.isfinite(out), out
        return (time.perf_counter() - t0) / args.iters

    LOOP_OVERHEAD = 1.0e-3  # measured by floor_probe (0.97 ms/iter)

    def show(name, t):
        print(f"{name:44s} {1e3 * (t - LOOP_OVERHEAD):8.2f} ms")

    # ---------------- depth net ----------------
    from baseboostdepth_tpu.models import MD2DepthNet
    from baseboostdepth_tpu.models.resnet import ResnetEncoder

    B = 12
    x = jnp.asarray(rng.random((B, 192, 640, 3)).astype(np.float32))
    net = MD2DepthNet(num_layers=18, dtype=cdt)
    v = net.init(jax.random.PRNGKey(0), x, train=False)
    enc = ResnetEncoder(num_layers=18, dtype=cdt)
    ev = {"params": v["params"]["encoder"], "batch_stats": v["batch_stats"]["encoder"]}

    print(f"== depth net (B={B}, {args.dtype}) ==")
    show("encoder fwd eval", scan_time(
        lambda i, c, x: jnp.mean(
            enc.apply(ev, x + (c * 1e-12 + i * 1e-12).astype(x.dtype), train=False)[-1]
            .astype(jnp.float32)),
        x,
    ))
    show("full fwd eval", scan_time(
        lambda i, c, x: jnp.mean(
            net.apply({"params": v["params"], "batch_stats": v["batch_stats"]},
                      x + (c * 1e-12 + i * 1e-12).astype(x.dtype), train=False)[0]
            .astype(jnp.float32)),
        x,
    ))

    def fwd_train(i, c, x):
        d, _ = net.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            x + (c * 1e-12 + i * 1e-12).astype(x.dtype), train=True,
            mutable=["batch_stats"],
        )
        return sum(jnp.mean(di.astype(jnp.float32)) for di in d)

    show("full fwd train (batch BN)", scan_time(fwd_train, x))

    def fwd_bwd(i, c, x):
        def loss(p):
            d, _ = net.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                x + (c * 1e-12 + i * 1e-12).astype(x.dtype), train=True,
                mutable=["batch_stats"],
            )
            return sum(jnp.mean(di.astype(jnp.float32)) for di in d)
        l, g = jax.value_and_grad(loss)(v["params"])
        return l + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda t: jnp.sum(t).astype(jnp.float32), g)
        )

    show("full fwd+bwd train", scan_time(fwd_bwd, x))

    # ---------------- pose net ----------------
    from baseboostdepth_tpu.models import build_pose_net

    BP = 216
    px = jnp.asarray(rng.random((BP, 192, 640, 6)).astype(np.float32))
    pose = build_pose_net(dtype=cdt)
    pv = pose.init(jax.random.PRNGKey(0), px[:1], train=False)

    print(f"\n== pose net (B*P={BP}, {args.dtype}) ==")
    show("pose fwd eval", scan_time(
        lambda i, c, px: jnp.mean(
            pose.apply({"params": pv["params"], "batch_stats": pv["batch_stats"]},
                       px + (c * 1e-12 + i * 1e-12).astype(px.dtype), train=False)[0]
            .astype(jnp.float32)),
        px,
    ))

    def pose_fwd_train(i, c, px):
        (aa, t), _ = pose.apply(
            {"params": pv["params"], "batch_stats": pv["batch_stats"]},
            px + (c * 1e-12 + i * 1e-12).astype(px.dtype), train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(aa.astype(jnp.float32)) + jnp.mean(t.astype(jnp.float32))

    show("pose fwd train (batch BN)", scan_time(pose_fwd_train, px))

    def pose_fwd_bwd(i, c, px):
        def loss(p):
            (aa, t), _ = pose.apply(
                {"params": p, "batch_stats": pv["batch_stats"]},
                px + (c * 1e-12 + i * 1e-12).astype(px.dtype), train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(aa.astype(jnp.float32) ** 2) + jnp.mean(t.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(pv["params"])
        return l + jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda t_: jnp.sum(t_).astype(jnp.float32), g)
        )

    show("pose fwd+bwd train", scan_time(pose_fwd_bwd, px))


if __name__ == "__main__":
    main()
