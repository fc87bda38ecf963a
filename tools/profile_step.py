"""Ablation profiler for the train step: times the step with pieces disabled
to locate the bottleneck on real hardware.

Usage: python tools/profile_step.py [--dtype bfloat16] [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Force completion: on the tunneled axon platform block_until_ready
    returns early, so read one scalar back to host."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--zoo", default="md2",
                    choices=["md2", "monovit", "sql", "sql_large", "cadepth", "diffnet"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.utils.jax_setup import setup_jax
    setup_jax()

    from baseboostdepth_tpu import geometry
    from baseboostdepth_tpu.models import build_depth_net, build_pose_net
    from baseboostdepth_tpu.ops import bilinear_sample
    from baseboostdepth_tpu.ops.ssim import reprojection_loss

    H, W, B = 192, 640, 12
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    print(f"devices: {jax.devices()}  dtype={args.dtype}  zoo={args.zoo}")

    # ---- 1. depth net fwd+bwd ----
    num_layers = {"md2": 18, "monovit": 18, "sql": 50, "sql_large": 50,
                  "cadepth": 50, "diffnet": 18}[args.zoo]
    net = build_depth_net(args.zoo, num_layers=num_layers, dtype=cdt)
    x = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32))
    v = net.init(key, x, train=False)

    @jax.jit
    def depth_train(params, stats, x):
        def loss(p):
            d, mut = net.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return sum(jnp.mean(di.astype(jnp.float32)) for di in d)
        return jax.grad(loss)(params)

    t = timeit(depth_train, v["params"], v.get("batch_stats", {}), x, iters=args.iters)
    print(f"depth fwd+bwd (B={B}):           {t*1e3:8.1f} ms")

    # ---- 2. pose net fwd+bwd at the full-pair batch (18 pairs since the
    # round-2 slot-pair compaction: 2F step + 4 slot-direct) ----
    P = 18
    pose = build_pose_net(dtype=cdt)
    px = jnp.asarray(rng.random((B * P, H, W, 6)).astype(np.float32))
    pv = pose.init(key, px[:1], train=False)

    @jax.jit
    def pose_train(params, stats, x):
        def loss(p):
            (aa, tt), mut = pose.apply({"params": p, "batch_stats": stats}, x, train=True, mutable=["batch_stats"])
            return jnp.mean(aa.astype(jnp.float32) ** 2) + jnp.mean(tt.astype(jnp.float32) ** 2)
        return jax.grad(loss)(params)

    t = timeit(pose_train, pv["params"], pv["batch_stats"], px, iters=args.iters)
    print(f"pose fwd+bwd (B*P={B*P}):        {t*1e3:8.1f} ms")

    # ---- 3. warps: 13 slots of grid + packed Pallas sample, fwd+bwd, with
    # KITTI-scale ego-motion (the band sweep is data-dependent; identity
    # poses flatter the kernel -- round-1 VERDICT weak item 6) ----
    from baseboostdepth_tpu.ops.warp_pallas import bilinear_sample_pallas_u8

    S = 13
    depth_map = jnp.asarray(rng.uniform(2, 60, (B, H, W)).astype(np.float32))
    K = np.broadcast_to(
        np.array([[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32),
        (B, 4, 4),
    ).copy()
    Kj = jnp.asarray(K)
    iKj = jnp.asarray(np.linalg.inv(K))
    Ts_np = np.broadcast_to(np.eye(4, dtype=np.float32), (B * S, 4, 4)).copy()
    # translations up to +-7 chained steps of ~0.1 fwd + lateral jitter
    Ts_np[:, 0, 3] = rng.uniform(-0.15, 0.15, B * S)
    Ts_np[:, 1, 3] = rng.uniform(-0.05, 0.05, B * S)
    Ts_np[:, 2, 3] = rng.uniform(-0.7, 0.7, B * S)
    Ts = jnp.asarray(Ts_np)
    src_u8 = jnp.asarray(rng.integers(0, 255, (B * S, H, W, 3), dtype=np.uint8))
    src = src_u8.astype(jnp.float32) / 255.0

    @jax.jit
    def warp_train(depth_map, Ts):
        def loss(d):
            dr = jnp.broadcast_to(d[:, None], (B, S, H, W)).reshape(B * S, H, W)
            grid = geometry.warp_grid(dr, jnp.repeat(Kj, S, 0), jnp.repeat(iKj, S, 0), Ts)
            w = bilinear_sample_pallas_u8(src_u8, grid).reshape(B, S, H, W, 3)
            return jnp.mean(w)
        return jax.grad(loss)(depth_map)

    t = timeit(warp_train, depth_map, Ts, iters=args.iters)
    print(f"warp grid+packed x{S} fwd+bwd:   {t*1e3:8.1f} ms (realistic T)")

    @jax.jit
    def warp_train_xla(depth_map, Ts):
        def loss(d):
            dr = jnp.broadcast_to(d[:, None], (B, S, H, W)).reshape(B * S, H, W)
            grid = geometry.warp_grid(dr, jnp.repeat(Kj, S, 0), jnp.repeat(iKj, S, 0), Ts)
            w = bilinear_sample(src, grid).reshape(B, S, H, W, 3)
            return jnp.mean(w)
        return jax.grad(loss)(depth_map)

    t = timeit(warp_train_xla, depth_map, Ts, iters=args.iters)
    print(f"warp grid+xla    x{S} fwd+bwd:   {t*1e3:8.1f} ms (realistic T)")

    # ---- 3b. device-side augmentation (flip + jitter + pyramid) ----
    from baseboostdepth_tpu.data.augment import apply_flip, color_jitter
    from baseboostdepth_tpu.ops.resize import lanczos_pyramid

    NF = 16
    frames_u8 = jnp.asarray(rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8))
    flip = jnp.asarray(rng.random(B) > 0.5)
    jit_p = jnp.asarray(rng.random((B, NF, 4)).astype(np.float32) * 0.2 + 0.9)

    @jax.jit
    def aug(frames_u8, flip, jit_p):
        fr = apply_flip(frames_u8, flip)
        color = fr.astype(jnp.float32) / 255.0
        a = color_jitter(color.astype(cdt), jit_p)
        pyr = lanczos_pyramid(color[:, NF // 2 - 1], num_scales=1)
        return a[:, 0].astype(jnp.float32).sum() + pyr[0].sum()

    t = timeit(aug, frames_u8, flip, jit_p, iters=args.iters)
    print(f"augmentation (NF={NF}, {args.dtype}): {t*1e3:8.1f} ms")

    # ---- 4. photometric (SSIM+L1) over 20 candidates fwd+bwd ----
    C = 20
    pred = jnp.asarray(rng.random((B * C, H, W, 3)).astype(np.float32))
    tgtc = jnp.asarray(rng.random((B * C, H, W, 3)).astype(np.float32))

    @jax.jit
    def pe_train(pred, tgtc):
        def loss(p):
            return jnp.mean(reprojection_loss(p, tgtc))
        return jax.grad(loss)(pred)

    t = timeit(pe_train, pred, tgtc, iters=args.iters)
    print(f"photometric x{C} fwd+bwd:        {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
