"""Where do the 24 ms of in-step smoothness go?

Step accounting (tools/step_accounting.py level 6->7) charges 24.2 ms to
the smoothness term at stage 2 (scales=(0,), disp [12,192,640,1]) -- about
100x the HBM speed-of-light for ~3 MB of elementwise work. This probe times
the term standalone (fwd + grad-wrt-disp) with the marginal-cost method of
tools/layer_probe.py (k-loop delta removes the ~1 ms/iter dispatch floor),
across implementation variants:

  v0 current   losses.normalized_disp + losses.smooth_loss ([B,H,W,1] slices)
  v1 squeezed  same math on [B,H,W] (no trailing unit dim)
  v2 aligned   diffs via x - roll(x) with a validity mask (all arrays stay
               640-wide; no 639-wide slice results)
  v3 fp32      v0 in float32

If all variants are ~SOL, the in-step 24 ms is a fusion interaction (the
term's bwd forcing materialization in the decoder bwd), not the op itself.

  python tools/smooth_probe.py [--iters 30]
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
    ap.add_argument("--B", type=int, default=12)
    ap.add_argument("--H", type=int, default=192)
    ap.add_argument("--W", type=int, default=640)
    ap.add_argument("--k_lo", type=int, default=2)
    ap.add_argument("--k_hi", type=int, default=8)
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu import losses

    rng = np.random.default_rng(0)
    B, H, W = args.B, args.H, args.W
    disp_np = rng.uniform(0.05, 0.9, (B, H, W, 1)).astype(np.float32)
    img_np = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)

    def v0(disp, img):
        return losses.smooth_loss(losses.normalized_disp(disp), img)

    def v1(disp, img):
        d = losses.normalized_disp(disp)[..., 0]
        gx = jnp.abs(d[:, :, :-1] - d[:, :, 1:])
        gy = jnp.abs(d[:, :-1, :] - d[:, 1:, :])
        ix = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1)
        iy = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1)
        return jnp.mean(gx * jnp.exp(-ix)) + jnp.mean(gy * jnp.exp(-iy))

    def v2(disp, img):
        d = losses.normalized_disp(disp)[..., 0]
        im = jnp.mean(img, axis=-1)  # not identical math; timing proxy only
        dx = jnp.abs(d - jnp.roll(d, -1, axis=2))
        dy = jnp.abs(d - jnp.roll(d, -1, axis=1))
        ix = jnp.abs(im - jnp.roll(im, -1, axis=2))
        iy = jnp.abs(im - jnp.roll(im, -1, axis=1))
        mx = jnp.zeros((1, 1, W)).at[:, :, : W - 1].set(1.0)
        my = jnp.zeros((1, H, 1)).at[:, : H - 1, :].set(1.0)
        sx = jnp.sum(dx * jnp.exp(-ix) * mx) / (B * H * (W - 1))
        sy = jnp.sum(dy * jnp.exp(-iy) * my) / (B * (H - 1) * W)
        return sx + sy

    variants = {
        "v0_current_bf16": (v0, jnp.bfloat16),
        "v1_squeezed_bf16": (v1, jnp.bfloat16),
        "v2_aligned_bf16": (v2, jnp.bfloat16),
        "v3_current_fp32": (v0, jnp.float32),
    }

    def loop_time(fn, dt, k):
        disp = jnp.asarray(disp_np).astype(dt)
        img = jnp.asarray(img_np).astype(dt)
        g = jax.grad(lambda d, i: fn(d, i).astype(jnp.float32))

        @jax.jit
        def run(disp, img):
            def body(j, acc):
                pert = (j.astype(jnp.float32) * 1e-12).astype(dt)
                out = 0.0
                for m in range(k):
                    gd = g(disp + pert + jnp.asarray(m * 1e-9, dt), img)
                    out = out + jnp.sum(gd.astype(jnp.float32))
                return acc + out
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        r = run(disp, img)
        float(r)  # force readback (block_until_ready no-ops on the tunnel)
        t0 = time.perf_counter()
        r = run(disp, img)
        float(r)
        return (time.perf_counter() - t0) / args.iters

    print(f"shape disp [{B},{H},{W},1]  iters={args.iters}  "
          f"marginal between k={args.k_lo} and k={args.k_hi}")
    for name, (fn, dt) in variants.items():
        lo = loop_time(fn, dt, args.k_lo)
        hi = loop_time(fn, dt, args.k_hi)
        per = (hi - lo) / (args.k_hi - args.k_lo) * 1e3
        print(f"{name:20s} fwd+bwd {per:7.3f} ms/call  (k{args.k_lo} {lo*1e3:.2f} ms, k{args.k_hi} {hi*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
