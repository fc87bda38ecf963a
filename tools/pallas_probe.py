"""Probe Mosaic capabilities over the axon tunnel: trivial kernel, sublane
gather, lane gather, dynamic-slice band loads."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(name, fn):
    try:
        ok = fn()
        print(f"{name:34s} OK  {ok}")
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"{name:34s} FAIL {type(e).__name__}: {msg}")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from baseboostdepth_tpu.utils.jax_setup import setup_jax
    setup_jax()

    rng = np.random.default_rng(0)

    def trivial():
        def k(i_ref, o_ref):
            o_ref[:] = i_ref[:] * 2.0
        x = jnp.asarray(rng.random((256, 512)).astype(np.float32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((256, 512), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        return bool(np.allclose(np.asarray(y), np.asarray(x) * 2))

    probe("trivial", trivial)

    def sublane_gather():
        def k(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)
        src = jnp.asarray(rng.random((64, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 64, (8, 128)).astype(np.int32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx)[:8], axis=0)
        return bool(np.allclose(np.asarray(y), ref))

    probe("sublane take_along_axis (64->8)", sublane_gather)

    def sublane_gather_same():
        def k(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=0)
        src = jnp.asarray(rng.random((8, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 8, (8, 128)).astype(np.int32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=0)
        return bool(np.allclose(np.asarray(y), ref))

    probe("sublane gather 8x128 (in-tile)", sublane_gather_same)

    def lane_gather():
        def k(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)
        src = jnp.asarray(rng.random((8, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        return bool(np.allclose(np.asarray(y), ref))

    probe("lane take_along_axis (128 wide)", lane_gather)

    def lane_gather_wide():
        def k(s_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(s_ref[:], i_ref[:], axis=1)
        src = jnp.asarray(rng.random((8, 640)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 640, (8, 640)).astype(np.int32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 640), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx), axis=1)
        return bool(np.allclose(np.asarray(y), ref))

    probe("lane gather 640 wide", lane_gather_wide)

    def gather_2d_flat():
        # flattened 1D gather emulating 2D: src [H, W] viewed [1, H*W]?
        def k(s_ref, i_ref, o_ref):
            flat = s_ref[:].reshape(1, 64 * 128)
            o_ref[:] = jnp.take_along_axis(
                jnp.broadcast_to(flat, (8, 64 * 128)), i_ref[:], axis=1
            )
        src = jnp.asarray(rng.random((64, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 64 * 128, (8, 128)).astype(np.int32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(
            np.broadcast_to(np.asarray(src).reshape(1, -1), (8, 64 * 128)),
            np.asarray(idx), axis=1,
        )
        return bool(np.allclose(np.asarray(y), ref))

    probe("flattened wide lane gather", gather_2d_flat)

    def dyn_slice():
        def k(s_ref, start_ref, o_ref):
            st = start_ref[0]
            o_ref[:] = s_ref[pl.ds(st, 8), :]
        src = jnp.asarray(rng.random((64, 128)).astype(np.float32))
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, jnp.array([17], jnp.int32))
        return bool(np.allclose(np.asarray(y), np.asarray(src)[17:25]))

    probe("dynamic row slice", dyn_slice)


if __name__ == "__main__":
    main()
