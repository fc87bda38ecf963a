"""Experiments to find the fastest TPU bilinear-warp formulation.

Variants:
  A. current take_along_axis gather, full autodiff (scatter-add in bwd)
  B. custom-VJP: zero image-grad, analytic grid-grad (no scatter at all)
  C. forward only (lower bound for gather cost)
  D. per-channel gather layout [N*C, HW]
  E. pallas kernel feasibility probe (sublane/lane dynamic gather)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax, jax.numpy as jnp
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf))


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

    N, H, W, C = 12, 192, 640, 3  # one warp slot batch
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((N, H, W, C)).astype(np.float32))
    grid = jnp.asarray((rng.random((N, H, W, 2)) * 2 - 1).astype(np.float32) * 1.05)

    # ---- A: autodiff through gather ----
    @jax.jit
    def a_full(img, grid):
        def loss(g):
            return jnp.sum(bilinear_sample(img, g) ** 2)
        return jax.grad(loss)(grid)

    print(f"A autodiff grid-grad:      {timeit(a_full, img, grid)*1e3:8.1f} ms")

    # ---- C: forward only ----
    @jax.jit
    def c_fwd(img, grid):
        return bilinear_sample(img, grid)

    print(f"C forward only:            {timeit(c_fwd, img, grid)*1e3:8.1f} ms")

    # ---- B: custom vjp, no scatter ----
    @jax.custom_vjp
    def sample_nv(img, grid):
        return bilinear_sample(img, grid)

    def fwd_rule(img, grid):
        return bilinear_sample(img, grid), (img, grid)

    def bwd_rule(res, gout):
        img, grid = res
        Hh, Ww = img.shape[-3], img.shape[-2]
        x = jnp.clip((grid[..., 0] + 1) * 0.5 * (Ww - 1), 0, Ww - 1)
        y = jnp.clip((grid[..., 1] + 1) * 0.5 * (Hh - 1), 0, Hh - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, Ww - 1); y1i = jnp.minimum(y0i + 1, Hh - 1)
        imgf = img.reshape(img.shape[0], Hh * Ww, img.shape[-1])
        def gat(yi, xi):
            return jnp.take_along_axis(imgf, (yi * Ww + xi).reshape(img.shape[0], -1, 1), axis=1).reshape(img.shape[:-3] + (Hh, Ww, img.shape[-1]))
        v00, v01, v10, v11 = gat(y0i, x0i), gat(y0i, x1i), gat(y1i, x0i), gat(y1i, x1i)
        # d out / d x = (1-wy)(v01-v00) + wy (v11-v10), in pixel units
        dx = (1 - wy) * (v01 - v00) + wy * (v11 - v10)
        dy = (1 - wx) * (v10 - v00) + wx * (v11 - v01)
        # chain: pixel coords -> normalized grid; clamp saturation
        in_x = ((x > 0) & (x < Ww - 1)).astype(jnp.float32)[..., None]
        in_y = ((y > 0) & (y < Hh - 1)).astype(jnp.float32)[..., None]
        gx = jnp.sum(gout * dx * in_x, axis=-1) * (0.5 * (Ww - 1))
        gy = jnp.sum(gout * dy * in_y, axis=-1) * (0.5 * (Hh - 1))
        return None, jnp.stack([gx, gy], axis=-1)

    sample_nv.defvjp(fwd_rule, bwd_rule)

    @jax.jit
    def b_nv(img, grid):
        def loss(g):
            return jnp.sum(sample_nv(img, g) ** 2)
        return jax.grad(loss)(grid)

    print(f"B custom-vjp (no scatter): {timeit(b_nv, img, grid)*1e3:8.1f} ms")

    # ---- D: gather with channel-major flattened layout ----
    @jax.jit
    def d_fwd(img, grid):
        x = jnp.clip((grid[..., 0] + 1) * 0.5 * (W - 1), 0, W - 1)
        y = jnp.clip((grid[..., 1] + 1) * 0.5 * (H - 1), 0, H - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = x - x0; wy = y - y0
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, W - 1); y1i = jnp.minimum(y0i + 1, H - 1)
        imgc = jnp.moveaxis(img, -1, 1).reshape(N * C, H * W)  # [NC, HW]
        def gat(yi, xi):
            idx = (yi * W + xi).reshape(N, 1, H * W)
            idx = jnp.broadcast_to(idx, (N, C, H * W)).reshape(N * C, H * W)
            return jnp.take_along_axis(imgc, idx, axis=1)
        v00, v01, v10, v11 = [gat(a, b) for a, b in ((y0i, x0i), (y0i, x1i), (y1i, x0i), (y1i, x1i))]
        wxf = jnp.broadcast_to(wx.reshape(N, 1, H * W), (N, C, H * W)).reshape(N * C, H * W)
        wyf = jnp.broadcast_to(wy.reshape(N, 1, H * W), (N, C, H * W)).reshape(N * C, H * W)
        top = v00 + (v01 - v00) * wxf
        bot = v10 + (v11 - v10) * wxf
        return top + (bot - top) * wyf

    print(f"D fwd channel-major:       {timeit(d_fwd, img, grid)*1e3:8.1f} ms")

    # ---- E: pallas dynamic-gather probe ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern(src_ref, idx_ref, out_ref):
            # gather along sublanes: out[i, j] = src[idx[i, j], j]
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)

        src = jnp.asarray(rng.random((256, 512)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 256, (256, 512)).astype(np.int32))
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
        ok = np.allclose(np.asarray(out), ref)
        print(f"E pallas sublane gather:   compiles, correct={ok}")
    except Exception as e:
        print(f"E pallas sublane gather:   FAILED: {type(e).__name__}: {str(e)[:200]}")

    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def kern2(src_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)

        src = jnp.asarray(rng.random((256, 512)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 512, (256, 512)).astype(np.int32))
        out = pl.pallas_call(
            kern2,
            out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        ok = np.allclose(np.asarray(out), ref)
        print(f"E pallas lane gather:      compiles, correct={ok}")
    except Exception as e:
        print(f"E pallas lane gather:      FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
