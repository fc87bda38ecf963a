"""Localize the pose net's batch-independent cost per stage.

tools/pose_batch_probe.py measured pose fwd+bwd = ~49 ms fixed +
0.119 ms/img * BP (216 -> 144 images: -33% batch, only -11.5% time).
That fixed floor is ~25% of the full train step. This probe times
cumulative truncations of the pose ResNet-18 (conv1 | +layer1 | ... |
+layer4 | +decoder) at two batch sizes; per-stage deltas at BP=216 vs 144
split each stage's cost into fixed vs batch-linear.

  python tools/pose_stage_probe.py [--iters 20] [--bps 216,144]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STAGES = ["conv1+pool", "layer1", "layer2", "layer3", "layer4", "decoder"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bps", default="216,144")
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.models.pose import PoseDecoder
    from baseboostdepth_tpu.models.resnet import BasicBlock, _BN, _Conv

    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    H, W = args.height, args.width

    class TruncPose(nn.Module):
        """First `upto`+1 stages of the 2-frame pose ResNet-18 (+decoder
        at upto=5). Mirrors models/resnet.py ResnetEncoder stage for
        stage so per-stage deltas attribute the production net."""

        upto: int

        @nn.compact
        def __call__(self, x, train=True):
            x = (x - 0.45) / 0.225
            x = _Conv(64, 7, 2, 3, dtype=cdt, name="conv1")(x)
            x = _BN(dtype=cdt, name="bn1")(x, train)
            x = nn.relu(x)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            widths = (64, 128, 256, 512)
            for li, w in enumerate(widths, start=1):
                if self.upto < li:
                    return x
                for bi in range(2):
                    stride = 2 if (bi == 0 and li > 1) else 1
                    needs_ds = bi == 0 and (stride != 1 or x.shape[-1] != w)
                    x = BasicBlock(w, stride=stride, downsample=needs_ds,
                                   dtype=cdt, name=f"layer{li}_{bi}")(x, train)
            if self.upto >= 5:
                return PoseDecoder(dtype=cdt, name="decoder")(x)
            return x

    def time_stage(upto, BP):
        net = TruncPose(upto=upto)
        px = jnp.asarray(rng.random((BP, H, W, 6)).astype(np.float32)).astype(cdt)
        pv = net.init(jax.random.PRNGKey(0), px[:1], train=False)
        params, stats = pv["params"], pv.get("batch_stats", {})

        def loss(p, x):
            out = net.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )[0]
            return sum(
                o.astype(jnp.float32).sum() for o in jax.tree.leaves(out)
            )

        grad = jax.grad(loss)

        @jax.jit
        def run(p, x):
            def body(i, c):
                g = grad(p, x + c.astype(cdt))
                return jax.tree.reduce(
                    lambda a, b: a + b.astype(jnp.float32).sum(), g,
                    jnp.float32(0),
                )

            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        float(run(params, px))  # compile + sync
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(run(params, px))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    bps = [int(s) for s in args.bps.split(",")]
    cum = {bp: [] for bp in bps}
    for upto in range(6):
        row = [f"stage {upto} {STAGES[upto]:<11}"]
        for bp in bps:
            dt = time_stage(upto, bp)
            cum[bp].append(dt)
            delta = dt - (cum[bp][upto - 1] if upto else 0.0)
            row.append(f"BP={bp}: cum {dt*1e3:6.2f} delta {delta*1e3:6.2f} ms")
        print("   ".join(row), flush=True)

    if len(bps) == 2 and all(len(cum[bp]) == 6 for bp in bps):
        b0, b1 = bps
        print(f"\nper-stage fixed/linear split (fit from BP={b0} vs {b1}):")
        for upto in range(6):
            d0 = (cum[b0][upto] - (cum[b0][upto - 1] if upto else 0.0)) * 1e3
            d1 = (cum[b1][upto] - (cum[b1][upto - 1] if upto else 0.0)) * 1e3
            k = (d0 - d1) / (b0 - b1)
            fixed = d0 - k * b0
            print(f"  {STAGES[upto]:<11} fixed {fixed:6.2f} ms  "
                  f"linear {k*1000:6.3f} us/img", flush=True)


if __name__ == "__main__":
    main()
