"""Round 2: trivial pallas probe, 2x2-patch gather, bf16 gather."""

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

    N, H, W, C = 12, 192, 640, 3
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32))
    grid = jnp.asarray((rng.random((N, H, W, 2)) * 2 - 1).astype(np.float32) * 1.05)

    # ---- 0: trivial pallas kernel probe ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def dbl(in_ref, out_ref):
            out_ref[:] = in_ref[:] * 2.0

        y = pl.pallas_call(
            dbl,
            out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(img[0, :256, :512, 0])
        print("0 trivial pallas:          ok", float(jnp.sum(y)) > 0)
    except Exception as e:
        print(f"0 trivial pallas:          FAILED {type(e).__name__}: {str(e)[:150]}")

    # ---- F: single gather of 2x2xC patches via lax.gather ----
    @jax.jit
    def f_patch(img, grid):
        x = jnp.clip((grid[..., 0] + 1) * 0.5 * (W - 1), 0, W - 1)
        y = jnp.clip((grid[..., 1] + 1) * 0.5 * (H - 1), 0, H - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        imgp = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")

        def one(im, yi, xi):
            idx = jnp.stack([yi.reshape(-1), xi.reshape(-1)], axis=-1)  # [P, 2]
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1),
            )
            out = jax.lax.gather(
                im, idx, dn, slice_sizes=(2, 2, C), mode="clip"
            )  # [P, 2, 2, C]
            return out

        patches = jax.vmap(one)(imgp, y0i, x0i).reshape(N, H, W, 2, 2, C)
        top = patches[..., 0, 0, :] + (patches[..., 0, 1, :] - patches[..., 0, 0, :]) * wx
        bot = patches[..., 1, 0, :] + (patches[..., 1, 1, :] - patches[..., 1, 0, :]) * wx
        return top + (bot - top) * wy

    try:
        t = timeit(f_patch, img, grid)
        print(f"F 2x2-patch gather fwd:    {t*1e3:8.1f} ms")
    except Exception as e:
        print(f"F 2x2-patch gather:        FAILED {type(e).__name__}: {str(e)[:150]}")

    # ---- G: row-pair gather: one gather of (2, W, C) rows + lane selects? too big; skip

    # ---- H: bf16 gather ----
    from baseboostdepth_tpu.ops.sampling import bilinear_sample

    imgh = img.astype(jnp.bfloat16)

    @jax.jit
    def h_fwd(imgh, grid):
        return bilinear_sample(imgh, grid)

    print(f"H bf16 gather fwd:         {timeit(h_fwd, imgh, grid)*1e3:8.1f} ms")

    # ---- I: int32 single-channel packed? skip. J: measure at 20 slots to see scaling
    imgS = jnp.asarray(rng.random((13 * N, H, W, C)).astype(np.float32))
    gridS = jnp.asarray((rng.random((13 * N, H, W, 2)) * 2 - 1).astype(np.float32) * 1.05)

    @jax.jit
    def j_fwd(i, g):
        return bilinear_sample(i, g)

    print(f"J 13-slot fwd (x13):       {timeit(j_fwd, imgS, gridS, iters=4)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
