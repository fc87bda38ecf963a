"""Scan-timed full train step + flag ablations.

Times the COMPLETE train step with the loop inside one jit (fori_loop over
steps, state threaded), eliminating the ~25-30 ms/call tunnel dispatch that
inflates per-dispatch timing, then re-times under StepStatic ablations to
attribute the cost: ssim off, decomp off, xla warp, pose scale.

  python tools/step_bisect.py [--iters 10]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ablations", default="1", help="0 = baseline only")
    args = ap.parse_args()

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state, loss_forward
    import optax

    from bench import inject_realistic_pose_bias

    H, W, F, B = 192, 640, 7, 12
    base = StepStatic(
        zoo="md2", num_layers=18, height=H, width=W, F=F, scales=(0,),
        trimin=True, incremental=True, partial=True, decomp=True,
        pose_error=5.5, dtype="bfloat16",
    )
    opt = make_optimizer(steps_per_epoch=3317)

    rng = np.random.default_rng(0)
    NF = num_frames(F)
    frames = rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8)
    K = np.broadcast_to(
        np.array([[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 4, 4)).copy()
    sT = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    sT[:, 0, 3] = 0.1
    jit = np.ones((B, NF, 4), np.float32)
    jit[..., 3] = 0.0
    batch = make_batch(frames, np.full(B, F), K, sT, np.zeros(B, bool), jit, F, True, True)
    batch = jax.tree.map(jnp.asarray, batch)

    def scan_step_time(st):
        state = init_state(st, opt, jax.random.PRNGKey(0))
        state = state.replace(params=inject_realistic_pose_bias(state.params))
        key0 = jax.random.PRNGKey(7)

        @jax.jit
        def run(state, batch):
            def body(i, s):
                grad_fn = jax.value_and_grad(loss_forward, has_aux=True)
                (loss, (metrics, new_stats)), grads = grad_fn(
                    s.params, s.stats, batch, jax.random.fold_in(key0, i), st, True, None
                )
                updates, new_opt = opt.update(grads, s.opt_state, s.params)
                new_params = optax.apply_updates(s.params, updates)
                return s.replace(step=s.step + 1, params=new_params,
                                 stats=new_stats, opt_state=new_opt)
            return jax.lax.fori_loop(0, args.iters, body, state)

        out = run(state, batch)
        float(jnp.sum(out.step))  # compile+run sync
        t0 = time.perf_counter()
        out = run(out, batch)
        float(jnp.sum(out.step))
        return (time.perf_counter() - t0) / args.iters

    t_base = scan_step_time(base)
    print(f"{'full step (scanned)':36s} {t_base*1e3:8.1f} ms   "
          f"{B/t_base:6.1f} imgs/s")

    if args.ablations != "1":
        return
    for name, st in [
        ("no ssim (l1 only)", dataclasses.replace(base, use_ssim=False)),
        ("no decomp (no err warps)", dataclasses.replace(base, decomp=False)),
        ("xla warp", dataclasses.replace(base, warp_impl="xla")),
        ("pose_input_scale 0.5", dataclasses.replace(base, pose_input_scale=0.5)),
        ("no smoothness", dataclasses.replace(base, smooth_weight=0.0)),
        ("packed warp (custom VJP)", dataclasses.replace(base, warp_impl="pallas")),
    ]:
        t = scan_step_time(st)
        print(f"{name:36s} {t*1e3:8.1f} ms   delta {1e3*(t - t_base):+7.1f} ms")


if __name__ == "__main__":
    main()
