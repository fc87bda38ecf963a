"""Serving benchmark: depth-inference latency/throughput per zoo.

The reference's inference surface is test_simple.py (one image at a time
through disp_to_depth; /root/reference/test_simple.py:100-140). This
measures the TPU serving envelope of the same computation, jitted:

  - latency: single-image (B=1) end-to-end device time
  - throughput: large-batch imgs/s (B=32 default) -- the offline/bulk mode
  - optional flip-averaged "post_process" mode used by evaluate_depth
    (reference evaluate_depth.py:207-214): doubles the batch, halves imgs/s

Usage:
  python tools/infer_bench.py [--zoo md2] [--batch 32] [--post-process]

Tunnel note: dispatch is ~25-30 ms/call here, so B=1 "latency" on this
machine is dominated by the tunnel, not the model; the JSON reports both
the raw wall number and the dispatch-corrected estimate from the B-scaling
line so real-host numbers can be projected.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ZOO_NUM_LAYERS = {"md2": 18, "monovit": 18, "sql": 50, "sql_large": 50,
                  "cadepth": 50, "diffnet": 18}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zoo", default="md2", choices=sorted(ZOO_NUM_LAYERS))
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--post-process", action="store_true",
                    help="flip-averaged eval mode (2x compute per image)")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import (
        StepStatic, init_state, make_eval_forward,
    )

    st = StepStatic(
        zoo=args.zoo, num_layers=ZOO_NUM_LAYERS[args.zoo],
        height=args.height, width=args.width, F=1, scales=(0,),
        dtype=args.dtype,
    )
    state = init_state(st, make_optimizer(steps_per_epoch=1), jax.random.PRNGKey(0))
    fwd = make_eval_forward(st)

    def run_mode(B):
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.random((B, args.height, args.width, 3), np.float32)
        )
        if args.post_process:
            imgs = jnp.concatenate([imgs, imgs[:, :, ::-1]], axis=0)

        depth = fwd(state.params, state.stats, imgs)
        float(jnp.sum(depth))  # compile + sync (tunnel: block_until_ready lies)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            depth = fwd(state.params, state.stats, imgs)
        float(jnp.sum(depth))
        return (time.perf_counter() - t0) / args.iters

    t1 = run_mode(1)
    tb = run_mode(args.batch)
    # two-point dispatch model: wall(B) = dispatch + B * per_img
    per_img = (tb - t1) / (args.batch - 1)
    dispatch = max(t1 - per_img, 0.0)

    out = {
        "metric": f"infer_{args.zoo}_{args.width}x{args.height}"
        + ("_pp" if args.post_process else ""),
        "latency_b1_ms": round(t1 * 1e3, 2),
        "throughput_imgs_per_sec": round(args.batch / tb, 1),
        "batch": args.batch,
        "est_dispatch_ms": round(dispatch * 1e3, 1),
        "est_per_img_ms": round(per_img * 1e3, 3),
        "dtype": args.dtype,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
