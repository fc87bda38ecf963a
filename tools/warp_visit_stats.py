"""CPU analysis of the Pallas warp kernel's band/block visit counts.

The kernel (ops/warp_pallas.py _sweep*) visits, per [8,128] output subtile,
every (8-row band) x (128-col block) source tile in the bounding box of the
subtile's source coordinates: cost ~ (qmax-qmin+1) * (gmax-gmin+1). This
tool rebuilds the exact bench/accounting batch (untrained nets +
bench.inject_realistic_pose_bias, same make_batch) at several stage budgets
F and prints the visit statistics per slot, to explain why the F=5/F=2
bucket classes measure far slower warp levels than F=7 despite identical
slot counts (logs/round5/step_accounting_F5.log: 62.9 ms of warps vs ~42
at F=7).

Pure CPU: the coordinate math is the production geometry.warp_grid; no
Pallas, no TPU.

  env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/warp_visit_stats.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def visit_counts(px, py, W_src, H_src):
    """px/py [B, H, W] clamped pixel coords -> per-subtile visit counts."""
    B, H, W = px.shape
    x0 = np.floor(px).astype(np.int32)
    y0 = np.floor(py).astype(np.int32)
    q0, q1 = y0 >> 3, (y0 + 1) >> 3
    g0, g1 = x0 >> 7, (x0 + 1) >> 7
    th, tw = H // 8, W // 128
    q0 = q0[:, : th * 8, : tw * 128].reshape(B, th, 8, tw, 128)
    q1 = q1[:, : th * 8, : tw * 128].reshape(B, th, 8, tw, 128)
    g0 = g0[:, : th * 8, : tw * 128].reshape(B, th, 8, tw, 128)
    g1 = g1[:, : th * 8, : tw * 128].reshape(B, th, 8, tw, 128)
    qmin = q0.min(axis=(2, 4))
    qmax = q1.max(axis=(2, 4))
    gmin = g0.min(axis=(2, 4))
    gmax = g1.max(axis=(2, 4))
    return (qmax - qmin + 1) * (gmax - gmin + 1)  # [B, th, tw]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--Fs", default="2,5,7")
    ap.add_argument("--batch_size", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from baseboostdepth_tpu import geometry
    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import (
        StepStatic, build_networks, init_state, predict_poses,
    )
    from bench import inject_realistic_pose_bias

    H, W, B = 192, 640, args.batch_size
    rng = np.random.default_rng(0)

    for F in [int(s) for s in args.Fs.split(",")]:
        st = StepStatic(
            zoo="md2", height=H, width=W, F=F, scales=(0,), trimin=True,
            incremental=True, partial=True, decomp=True, pose_error=5.5,
            dtype="float32", warp_impl="xla",
        )
        opt = make_optimizer(steps_per_epoch=3317)
        state = init_state(st, opt, jax.random.PRNGKey(0))
        state = state.replace(params=inject_realistic_pose_bias(state.params))
        depth_net, pose_net = build_networks(st)

        NF = num_frames(F)
        frames = rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8)
        K = np.broadcast_to(
            np.array([[0.58 * W, 0, 0.5 * W, 0], [0, 1.92 * H, 0.5 * H, 0],
                      [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 4, 4)).copy()
        stereo_T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
        stereo_T[:, 0, 3] = 0.1
        jitter = np.ones((B, NF, 4), np.float32)
        jitter[..., 3] = 0.0
        batch = make_batch(frames, np.full(B, F), K, stereo_T, np.zeros(B, bool),
                           jitter, F, True, True)
        batch = jax.tree.map(jnp.asarray, batch)

        color = batch["frames"].astype(jnp.float32) / 255.0
        disps = depth_net.apply(
            {"params": state.params["depth"], "batch_stats": state.stats["depth"]},
            color[:, F], train=False,
        )
        _, depth = geometry.disp_to_depth(disps[0][..., 0], st.min_depth, st.max_depth)

        T_slot, T_err, _ = predict_poses(
            st, pose_net, state.params["pose"], state.stats["pose"], color,
            batch["slot_offset"], batch["slot_partial"], False,
        )
        T_slots = jnp.concatenate([T_slot, batch["stereo_T"][:, None]], axis=1)
        Ts = jnp.concatenate([T_slots, T_err], axis=1)
        S = Ts.shape[1]

        depth_r = jnp.broadcast_to(depth[:, None], (B, S, H, W)).reshape(B * S, H, W)
        grid = geometry.warp_grid(
            depth_r, jnp.repeat(batch["K"], S, axis=0),
            jnp.repeat(batch["inv_K"], S, axis=0), Ts.reshape(B * S, 4, 4),
        )
        # the kernel wrapper clamps coords to the image (warp_pallas.py:551)
        gx = np.clip(np.asarray(grid[..., 0]), 0.0, W - 1).reshape(B, S, H, W)
        gy = np.clip(np.asarray(grid[..., 1]), 0.0, H - 1).reshape(B, S, H, W)
        print(f"\nF={F}: slots={S} (main {T_slots.shape[1]} + err {T_err.shape[1]})"
              f"  offsets[0]={np.asarray(batch['slot_offset'][0])}")
        total = 0.0
        for s in range(S):
            v = visit_counts(gx[:, s], gy[:, s], W, H)
            oob = float(np.mean((gx[:, s] <= 0) | (gx[:, s] >= W - 1)
                                | (gy[:, s] <= 0) | (gy[:, s] >= H - 1)))
            total += float(v.mean())
            print(f"  slot {s:2d}: visits/subtile mean {v.mean():6.2f} "
                  f"max {v.max():3d}  clamped-frac {oob:.2f}")
        print(f"  TOTAL mean visits/subtile over {S} slots: {total:.1f}")


if __name__ == "__main__":
    main()
