"""Benchmark + validate the Pallas warp on real TPU vs the XLA gather."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax, jax.numpy as jnp
    return float(jnp.sum(jax.tree.leaves(out)[0]))


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.utils.jax_setup import setup_jax
    setup_jax()

    from baseboostdepth_tpu.ops.sampling import bilinear_sample
    from baseboostdepth_tpu.ops.warp_pallas import (
        bilinear_sample_pallas,
        bilinear_sample_pallas_u8,
    )

    N, H, W, C = 12, 192, 640, 3
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32))
    # realistic-ish warp: modest shifts + noise, partially out of bounds
    base_y, base_x = np.meshgrid(
        np.linspace(-1, 1, H, dtype=np.float32), np.linspace(-1, 1, W, dtype=np.float32),
        indexing="ij",
    )
    gx = base_x[None] + rng.normal(0, 0.02, (N, H, W)).astype(np.float32) + 0.05
    gy = base_y[None] + rng.normal(0, 0.01, (N, H, W)).astype(np.float32) - 0.02
    grid = jnp.asarray(np.stack([gx, gy], axis=-1))

    # correctness on-device
    ref = np.asarray(jax.jit(bilinear_sample)(img, grid))
    out = np.asarray(jax.jit(bilinear_sample_pallas)(img, grid))
    print("fwd max err vs XLA:", float(np.abs(out - ref).max()))

    xla_fwd = jax.jit(bilinear_sample)
    pls_fwd = jax.jit(bilinear_sample_pallas)
    print(f"XLA fwd:     {timeit(xla_fwd, img, grid)*1e3:8.1f} ms")
    print(f"pallas fwd:  {timeit(pls_fwd, img, grid)*1e3:8.1f} ms")

    @jax.jit
    def xla_g(img, grid):
        return jax.grad(lambda g: jnp.sum(bilinear_sample(img, g) ** 2))(grid)

    @jax.jit
    def pls_g(img, grid):
        return jax.grad(lambda g: jnp.sum(bilinear_sample_pallas(img, g) ** 2))(grid)

    ga = np.asarray(xla_g(img, grid))
    gb = np.asarray(pls_g(img, grid))
    print("grad max err vs XLA:", float(np.abs(ga - gb).max()))
    print(f"XLA fwd+bwd:    {timeit(xla_g, img, grid)*1e3:8.1f} ms")
    print(f"pallas fwd+bwd: {timeit(pls_g, img, grid)*1e3:8.1f} ms")

    # packed-uint8 path (the training configuration)
    img_u8 = jnp.asarray((np.asarray(img) * 255).astype(np.uint8))
    pk_fwd = jax.jit(bilinear_sample_pallas_u8)
    out_pk = np.asarray(pk_fwd(img_u8, grid))
    ref_pk = np.asarray(jax.jit(bilinear_sample)(img_u8.astype(jnp.float32) / 255, grid))
    print("packed fwd max err:", float(np.abs(out_pk - ref_pk).max()))
    print(f"pallas packed fwd:  {timeit(pk_fwd, img_u8, grid)*1e3:8.1f} ms")

    @jax.jit
    def pk_g(img_u8, grid):
        return jax.grad(lambda g: jnp.sum(bilinear_sample_pallas_u8(img_u8, g) ** 2))(grid)

    print(f"pallas packed f+b:  {timeit(pk_g, img_u8, grid)*1e3:8.1f} ms")

    # 13-slot packed (the per-step warp volume at F=7)
    imgS_u8 = jnp.asarray((rng.random((13 * N, H, W, C)) * 255).astype(np.uint8))
    gxS = np.broadcast_to(base_x, (13 * N, H, W)) + rng.normal(0, 0.02, (13 * N, H, W)).astype(np.float32)
    gyS = np.broadcast_to(base_y, (13 * N, H, W)) + rng.normal(0, 0.01, (13 * N, H, W)).astype(np.float32)
    gridS = jnp.asarray(np.stack([gxS, gyS], axis=-1).astype(np.float32))

    @jax.jit
    def pk13_g(i, g):
        return jax.grad(lambda gg: jnp.sum(bilinear_sample_pallas_u8(i, gg) ** 2))(g)

    print(f"packed 13-slot f+b: {timeit(pk13_g, imgS_u8, gridS, iters=4)*1e3:8.1f} ms")

    # worst case: fully random global warp (no locality)
    grid_rand = jnp.asarray((rng.random((N, H, W, 2)) * 2 - 1).astype(np.float32))
    print(f"pallas fwd random-warp: {timeit(pls_fwd, img, grid_rand)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
