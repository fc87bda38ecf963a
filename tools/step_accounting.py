"""Close the train-step accounting: cumulative in-step ablation.

The standalone component probes (tools/profile_step.py) each pay ~28 ms of
tunnel dispatch and lose cross-component fusion, so their sum never matched
the real step (round-2 ledger left ~60 ms of 248 as "misc" -- VERDICT r3
weak #2). This tool instead times the FULL jitted update at increasing
truncation levels of the loss forward -- every variant is a real
value_and_grad + Adam update over the full parameter tree, compiled exactly
like production -- so consecutive deltas attribute the step under the same
dispatch overhead and fusion regime:

  level 0  floor: loss = trivial readback of the batch     (dispatch + adam)
  level 1  + augmentation (flip + jitter), loss on aug
  level 2  + depth net fwd/bwd
  level 3  + pose net fwd/bwd (all pairs, chaining, partial splice)
  level 4  + warp grids + packed gather for the S main slots
  level 5  + error-pose warps (decomp)
  level 6  + identity/warp photometric losses + min assembly
  level 7  + smoothness (lanczos pyramid + edge-aware term) == full loss

Level 7 is loss-identical to training/step.loss_forward (asserted); the
deltas sum to the full step by construction. Usage:

  python tools/step_accounting.py [--iters 10] [--F 7] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVEL_NAMES = [
    "floor (dispatch+adam)",
    "augmentation",
    "depth net",
    "pose stack",
    "main-slot warps",
    "error-pose warps",
    "photometric+min",
    "smoothness",
]


def build_truncated_loss(st, level: int, mesh=None):
    """A loss_forward clone that stops after `level` stages.

    Mirrors training/step.loss_forward stage by stage (same ops, same
    order); level 7 reproduces it exactly. Intermediate levels reduce the
    deepest computed tensor to a scalar so XLA keeps (only) the stages up
    to that point plus their backward.
    """
    import jax
    import jax.numpy as jnp

    from baseboostdepth_tpu import geometry, losses
    from baseboostdepth_tpu.data.augment import apply_flip, color_jitter
    from baseboostdepth_tpu.ops.resize import lanczos_pyramid, resize_bilinear
    from baseboostdepth_tpu.ops.warp_pallas import bilinear_sample_corner_u8
    from baseboostdepth_tpu.training.step import build_networks, predict_poses

    def loss_fn(params, stats, batch, noise_key):
        depth_net, pose_net = build_networks(st)
        H, W, F = st.height, st.width, st.F
        cdt = st.compute_dtype
        noise_key, drop_key = jax.random.split(noise_key)

        frames = batch["frames"]
        if level == 0:
            return jnp.sum(batch["K"]) * 0.0 + jnp.float32(0.0)

        frames = apply_flip(frames, batch["flip"])
        color = frames.astype(jnp.float32) / 255.0
        B = color.shape[0]
        aug = color_jitter(color, batch["jitter"])
        if level == 1:
            return jnp.mean(aug)

        dvars = {"params": params["depth"], "batch_stats": stats["depth"]}
        disps, _ = depth_net.apply(
            dvars, aug[:, F].astype(cdt), train=True, mutable=["batch_stats"],
            rngs={"dropout": drop_key},
        )
        if level == 2:
            return sum(jnp.mean(d.astype(jnp.float32)) for d in disps)

        T_slot, T_err, _ = predict_poses(
            st, pose_net, params["pose"], stats["pose"], aug,
            batch["slot_offset"], batch["slot_partial"], True,
        )
        T_slots = jnp.concatenate([T_slot, batch["stereo_T"][:, None]], axis=1)
        if level == 3:
            return (
                sum(jnp.mean(d.astype(jnp.float32)) for d in disps)
                + jnp.mean(T_slots)
            )

        src_idx = jnp.concatenate(
            [batch["slot_offset"] + F, jnp.full((B, 1), 2 * F + 1, jnp.int32)],
            axis=1,
        )
        sources_raw = jnp.take_along_axis(
            frames, src_idx[:, :, None, None, None], axis=1
        )
        sources = sources_raw.astype(jnp.float32) / 255.0
        target = color[:, F]
        slot_valid = batch["slot_valid"]
        K, inv_K = batch["K"], batch["inv_K"]

        interp = jax.default_backend() != "tpu"
        packed_warp = lambda i, g: bilinear_sample_corner_u8(i, g, interpret=interp)

        def warp_all(depth_hw, Ts, src_u8=None):
            S = Ts.shape[1]
            depth_r = jnp.broadcast_to(depth_hw[:, None], (B, S, H, W)).reshape(B * S, H, W)
            grid = geometry.warp_grid(
                depth_r, jnp.repeat(K, S, axis=0), jnp.repeat(inv_K, S, axis=0),
                Ts.reshape(B * S, 4, 4),
            )
            src = sources_raw[:, :S] if src_u8 is None else src_u8
            return packed_warp(
                src.reshape(B * S, H, W, 3), grid
            ).reshape(B, S, H, W, 3)

        noise = jax.random.normal(noise_key, (B, 1, H, W)) * 1e-5
        ident_l = losses.slot_losses(target, sources, slot_valid, use_ssim=st.use_ssim)
        pyramid = lanczos_pyramid(target, num_scales=max(st.scales) + 1)

        total = 0.0
        for s in st.scales:
            disp = disps[s]
            disp_full = disp if disp.shape[1:3] == (H, W) else resize_bilinear(disp, H, W)
            _, depth = geometry.disp_to_depth(disp_full[..., 0], st.min_depth, st.max_depth)

            if level == 4:
                # main-slot sweep only (the merged production sweep doesn't
                # decompose; level 5's delta charges the error-slot extension)
                total = total + jnp.mean(warp_all(depth, T_slots))
                continue

            if T_err is not None and st.merged_warp:
                # production default: ONE sweep over main+error slots
                # (training/step.py:559-573); error slot i reuses source i
                S_main, S_err = T_slots.shape[1], T_err.shape[1]
                both = warp_all(
                    depth,
                    jnp.concatenate([T_slots, T_err], axis=1),
                    src_u8=jnp.concatenate(
                        [sources_raw[:, :S_main], sources_raw[:, :S_err]], axis=1
                    ),
                )
                warped, warped_e = both[:, :S_main], both[:, S_main:]
            else:
                warped = warp_all(depth, T_slots)
                warped_e = warp_all(depth, T_err) if T_err is not None else None
            if level == 5:
                total = total + jnp.mean(warped) + (
                    jnp.mean(warped_e) if warped_e is not None else 0.0
                )
                continue

            warp_l = losses.slot_losses(target, warped, slot_valid, use_ssim=st.use_ssim)
            err_l = None
            if warped_e is not None:
                err_l = losses.slot_losses(
                    target, warped_e, slot_valid[:, :-1], use_ssim=st.use_ssim
                )
            min_l = losses.min_reprojection(warp_l, ident_l, noise, err_l)
            loss_s = jnp.mean(min_l)
            if level >= 7 and st.smooth_weight:
                disp_sm = disp if disp.shape[1:3] == pyramid[s].shape[1:3] else resize_bilinear(
                    disp, pyramid[s].shape[1], pyramid[s].shape[2]
                )
                nd = losses.normalized_disp(disp_sm)
                sm = losses.smooth_loss(nd, pyramid[s].astype(nd.dtype))
                loss_s = loss_s + st.smooth_weight * sm / (2**s)
            total = total + loss_s

        return total / st.loss_norm_scales

    return loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blocks", type=int, default=3,
                    help="independent timing blocks per level (min wins); "
                    "tunnel stalls otherwise corrupt per-level deltas")
    ap.add_argument("--F", type=int, default=7)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import (
        StepStatic,
        init_state,
        loss_forward,
        make_train_step,
    )
    from bench import inject_realistic_pose_bias

    # production md2 perf defaults (config.py): phase-domain scale-0 tail on
    from baseboostdepth_tpu.config import ModelConfig
    from baseboostdepth_tpu.models.depth_decoder import set_phase_tail

    set_phase_tail(ModelConfig().resolved_phase_tail())

    H, W, F, B = 192, 640, args.F, args.batch_size
    st = StepStatic(
        zoo="md2", height=H, width=W, F=F, scales=(0,), trimin=True,
        incremental=True, partial=True, decomp=True, pose_error=5.5,
        dtype=args.dtype, warp_impl="auto",
    )
    opt = make_optimizer(steps_per_epoch=3317)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    state = state.replace(params=inject_realistic_pose_bias(state.params))

    rng = np.random.default_rng(0)
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

    def timed_step(loss_fn):
        def _step(state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, state.stats, batch, rng
            )
            updates, new_opt = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt
            ), loss

        fn = jax.jit(_step)
        s, loss = fn(state, batch, jax.random.PRNGKey(1))
        float(loss)  # sync (tunneled block_until_ready returns early)
        # min over independent blocks: a tunnel stall inside one block must
        # not inflate the level time (the round-5e single-block run recorded
        # a -24.6 ms "smoothness" delta because level 6 stalled)
        best = float("inf")
        for b in range(args.blocks):
            t0 = time.perf_counter()
            s2 = state
            for i in range(args.iters):
                s2, loss = fn(s2, batch, jax.random.PRNGKey(2 + i))
            float(loss)
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    # sanity: level 7 is loss-identical to the production loss_forward
    l7 = build_truncated_loss(st, 7)
    full_l, _ = loss_forward(state.params, state.stats, batch,
                             jax.random.PRNGKey(9), st, True, None)
    trunc_l = l7(state.params, state.stats, batch, jax.random.PRNGKey(9))
    assert abs(float(full_l) - float(trunc_l)) < 1e-5, (float(full_l), float(trunc_l))
    print(f"# level-7 parity: full={float(full_l):.6f} trunc={float(trunc_l):.6f}",
          file=sys.stderr)

    times = []
    for level in range(8):
        # transient tunnel errors must not kill a mostly-done run: retry the
        # level once after a pause (compile cache makes this cheap), else
        # re-raise -- a missing early level leaves nothing to attribute
        try:
            dt = timed_step(build_truncated_loss(st, level))
        except Exception as e:  # noqa: BLE001 - tunnel InvalidArgument etc.
            print(f"level {level} failed ({e}); retrying in 120 s",
                  file=sys.stderr)
            time.sleep(120)
            dt = timed_step(build_truncated_loss(st, level))
        times.append(dt)
        # cumulative levels are supersets: cum must be monotone. A negative
        # delta means the PREVIOUS level's blocks were all stall-inflated
        # (seen twice on the tunnel: round-5e smoothness -24.6, round-5h F=5
        # -16.3); re-time it and keep the min.
        for _attempt in range(2):
            if not (len(times) >= 2 and times[-1] < times[-2]):
                break
            lvl_prev = len(times) - 2
            print(f"monotonicity: re-timing level {lvl_prev} "
                  f"({times[lvl_prev]*1e3:.1f} ms > level {level} "
                  f"{times[-1]*1e3:.1f} ms)", file=sys.stderr)
            redo = timed_step(build_truncated_loss(st, lvl_prev))
            if redo >= times[lvl_prev]:
                break  # reproduces: accept the (unusual) non-monotonicity
            times[lvl_prev] = redo
        delta = dt - (times[level - 1] if level else 0.0)
        print(f"level {level} {LEVEL_NAMES[level]:<24} cum {dt*1e3:7.1f} ms"
              f"   delta {delta*1e3:7.1f} ms", file=sys.stderr)

    # the production step for the residual (BN stat plumbing, metrics dict).
    # A tunnel error here must not lose the completed level data: fall back
    # to the cum-level-7 time (the residual is then reported as 0/unknown).
    try:
        step_fn = make_train_step(st, opt)
        s, m = step_fn(state, batch, jax.random.PRNGKey(1))
        float(m["loss"])
        full_dt = float("inf")
        for b in range(args.blocks):
            t0 = time.perf_counter()
            s = state
            for i in range(args.iters):
                s, m = step_fn(s, batch, jax.random.PRNGKey(2 + i))
            float(m["loss"])
            full_dt = min(full_dt, (time.perf_counter() - t0) / args.iters)
    except Exception as e:  # noqa: BLE001
        print(f"full-step timing failed ({e}); reporting cum level 7 only",
              file=sys.stderr)
        full_dt = times[-1]

    comp = {LEVEL_NAMES[i]: round((times[i] - (times[i - 1] if i else 0.0)) * 1e3, 1)
            for i in range(8)}
    out = {
        "full_step_ms": round(full_dt * 1e3, 1),
        "cum_level7_ms": round(times[-1] * 1e3, 1),
        "residual_ms": round((full_dt - times[-1]) * 1e3, 1),
        "components_ms": comp,
        "unattributed_pct": round(100 * abs(full_dt - times[-1]) / full_dt, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
