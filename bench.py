"""Benchmark: steady-state training throughput of the full BaseBoostDepth
method (late curriculum stage: F=7, tri-min + incremental + partial + decomp,
scale [0]) on the flagship Monodepth2 ResNet-18 config at 640x192, batch 12.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md #6);
its trainer prints examples/s at runtime only. We normalize against 30
imgs/s -- a representative single-GPU Monodepth2-family training throughput
at 640x192 on the 2080Ti-class hardware of the paper's era -- so the ratio
is meaningful across rounds even though the exact reference rate is unknown.
"""

import json
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 30.0


def main():
    import jax

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state, make_train_step

    H, W, F, B = 192, 640, 7, 12

    st = StepStatic(
        zoo="md2",
        num_layers=18,
        height=H,
        width=W,
        F=F,
        scales=(0,),
        trimin=True,
        incremental=True,
        partial=True,
        decomp=True,
        pose_error=5.5,
        dtype="bfloat16",  # the default training config (fp32 params/losses)
    )
    opt = make_optimizer(steps_per_epoch=3317)
    state = init_state(st, opt, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    NF = num_frames(F)
    frames = rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8)
    f_max = np.full(B, F)  # worst-case: every sample at the max baseline
    K = np.broadcast_to(
        np.array(
            [[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32,
        ),
        (B, 4, 4),
    ).copy()
    stereo_T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    stereo_T[:, 0, 3] = 0.1
    jitter = np.ones((B, NF, 4), np.float32)
    jitter[..., 3] = 0.0
    batch = make_batch(frames, f_max, K, stereo_T, np.zeros(B, bool), jitter, F, True, True)
    batch = jax.tree.map(jax.numpy.asarray, batch)

    step_fn = make_train_step(st, opt)

    # warmup / compile
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    imgs_per_sec = B / dt
    n_chips = 1  # bench runs on one chip; metric is per-chip
    print(
        json.dumps(
            {
                "metric": "train_imgs_per_sec_per_chip_full_method_640x192",
                "value": round(imgs_per_sec / n_chips, 2),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(imgs_per_sec / n_chips / REFERENCE_IMGS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
