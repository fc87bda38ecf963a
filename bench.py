"""Benchmark: steady-state training throughput of the full BaseBoostDepth
method (late curriculum stage: tri-min + incremental + partial + decomp,
scale [0]) on the flagship Monodepth2 ResNet-18 config at 640x192, batch 12.

Default mode times every bucket class of the default bucketed loader
(--data.bucket_fs 2,5,7) and reports the mix-weighted realistic-epoch
throughput -- what the default training config actually achieves -- plus the
worst-case (F=7) rate and its roofline numbers in the same JSON. `--worst`
reports just the single worst-case class (the pre-round-4 headline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md #6);
its trainer prints examples/s at runtime only. We normalize against 30
imgs/s -- a representative single-GPU Monodepth2-family training throughput
at 640x192 on the 2080Ti-class hardware of the paper's era. The extras make
progress measurable against the REAL target (BASELINE.json "TPU roofline"):
  flops_per_step   XLA-counted FLOPs of the compiled train step
  mfu              flops_per_step / (step_time * peak_flops)
  pct_roofline     mfu * 100
Counted flops exclude the Pallas warp custom call (XLA cannot see inside
it), so mfu is slightly conservative.

Pose realism: an untrained pose net emits ~0.001-scale poses, so warp grids
hug the identity and the packed warp kernel's band sweep sees its best case
(CLAUDE.md ledger). The benchmark injects KITTI-scale ego-motion via the
pose head bias (~0.08 fwd translation + ~0.006 rad rotation per step frame,
chained over +-7) so the sampled displacements match mid-training reality.
"""

import json
import time

import numpy as np

REFERENCE_IMGS_PER_SEC = 30.0
# TPU v5e (the bench target): 197 bf16 TFLOP/s per chip, 819 GB/s HBM.
# Both keyed by platform so other generations don't get mislabeled
# speed-of-light numbers (ADVICE r3).
PEAK_FLOPS_BY_PLATFORM = {"tpu": 197e12, "axon": 197e12}
HBM_BW_BY_PLATFORM = {"tpu": 819e9, "axon": 819e9}


def inject_realistic_pose_bias(params):
    """Bias the pose head so step poses have KITTI-scale magnitude.

    PoseDecoder output is 0.01 * meanpool(conv); frame-0 components are bias
    elements 0..5 ([aa, t] -- models/pose.py:44-47). Translation ~0.08/frame
    forward (the split baseline column spans 0.0013-0.48,
    splits/eigen_zhou/train_files_baselines.txt), rotation ~0.006 rad/frame.
    """
    import jax.numpy as jnp

    bias = params["pose"]["decoder"]["pose_2"]["bias"]
    new = jnp.asarray(bias).at[:6].set(jnp.array([0.3, 0.6, 0.3, 1.0, 1.0, -8.0]))
    params["pose"]["decoder"]["pose_2"]["bias"] = new.astype(bias.dtype)
    return params


def compiled_costs(step_fn, state, batch, key):
    """(flops, bytes_accessed) XLA-counted for the jitted train step.

    bytes_accessed is XLA's operand+output byte count over all HLOs -- an
    upper bound on HBM traffic (fusion makes some of it register/VMEM
    traffic), so the derived memory-bound floor is conservative but honest
    for a workload whose convs are too small-channel to be MXU-bound.
    """
    try:
        cost = step_fn.lower(state, batch, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        f = cost.get("flops")
        b = cost.get("bytes accessed")
        return (float(f) if f and f > 0 else None,
                float(b) if b and b > 0 else None)
    except Exception:
        return None, None


ZOO_NUM_LAYERS = {"md2": 18, "monovit": 18, "sql": 50, "sql_large": 50,
                  "cadepth": 50, "diffnet": 18}


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--zoo", default="md2", choices=sorted(ZOO_NUM_LAYERS))
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blocks", type=int, default=3,
                    help="independent timing blocks per class; the reported "
                    "time is the BEST block, so a tunnel stall inside one "
                    "block cannot inflate the class time (BENCH_r04 recorded "
                    "F=5 at 370 ms vs F=7's 221 -- one stalled block)")
    ap.add_argument("--warp", default="auto", choices=["auto", "corner", "pallas", "xla"])
    ap.add_argument("--F", type=int, default=7,
                    help="stage max temporal offset (bucket-class timing: 2/5/7)")
    ap.add_argument("--pose_input_scale", type=float, default=1.0,
                    help="opt-in perf mode (model.pose_input_scale)")
    ap.add_argument("--merged_warp", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="main-slot + error-pose warps in one grid matmul "
                    "batch + one packed-kernel sweep (2S-1 slots) instead of "
                    "two calls; loss-exact. Default: the production per-zoo "
                    "auto (True except cadepth, where the two-call schedule "
                    "measured faster -- config.py resolved_merged_warp). "
                    "--[no-]merged_warp forces either for the A/B")
    ap.add_argument("--phase_tail", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="phase-domain scale-0 decoder tail (exact; "
                    "ops/phase_tail.py). Default: the production per-zoo "
                    "auto (config.py resolved_phase_tail). Forcing either "
                    "way tags the metric for the A/B")
    ap.add_argument("--remat", default="none",
                    choices=["none", "pose", "depth", "both"],
                    help="A/B: jax.checkpoint the pose/depth nets (recompute "
                    "fwd in bwd; trades FLOPs for HBM traffic)")
    ap.add_argument("--mix", action="store_true", default=None,
                    help="time every bucket class (F=2/5/7, the default "
                    "--data.bucket_fs) in one process and emit the "
                    "mix-weighted realistic-epoch throughput. This is the "
                    "DEFAULT mode (it is what the default bucketed training "
                    "config runs); --worst for the single-F metric")
    ap.add_argument("--worst", action="store_true",
                    help="single worst-case class metric (--F, default 7) "
                    "instead of the realistic mix")
    ap.add_argument("--mix_weights", default="2=0.35,5=0.20,7=0.45",
                    help="late-epoch window distribution from the curriculum "
                    "cutoff filter + 30%% mini shrink over the eigen_zhou "
                    "baseline column (CLAUDE.md ledger)")
    args = ap.parse_args(argv)

    # the tunneled TPU backend HANGS (not errors) when the relay is down;
    # probe it in a killable subprocess so the bench fails loudly instead.
    # The relay also has transient outages (VERDICT r3: a whole round of perf
    # evidence was lost to one), so retry with backoff before giving up:
    # 5 attempts spread over ~10 minutes.
    import subprocess
    import sys

    last_err = None
    for attempt in range(5):
        if attempt:
            delay = min(60 * attempt, 180)
            print(f"# tunnel probe failed ({last_err}); retry {attempt}/4 "
                  f"in {delay}s", file=sys.stderr)
            time.sleep(delay)
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; float(jnp.sum(jnp.ones((8, 128))))"],
                timeout=180, check=True, capture_output=True,
            )
            last_err = None
            break
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
            last_err = type(e).__name__
    if last_err is not None:
        print(json.dumps({
            "metric": "train_imgs_per_sec_per_chip_full_method_640x192",
            "value": 0.0, "unit": "imgs/sec/chip", "vs_baseline": 0.0,
            "error": f"device unreachable: {last_err}",
        }))
        raise SystemExit(1)

    import jax

    from baseboostdepth_tpu.utils.jax_setup import setup_jax

    setup_jax()

    from baseboostdepth_tpu.config import ModelConfig
    from baseboostdepth_tpu.models.depth_decoder import set_phase_tail
    from baseboostdepth_tpu.training.batch import make_batch, num_frames
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state, make_train_step

    H, W, B = 192, 640, args.batch_size

    # resolve the production per-zoo perf defaults (config.py); explicit
    # --[no-]merged_warp/--[no-]phase_tail force either side for A/Bs
    _mc = ModelConfig(zoo=args.zoo, merged_warp=args.merged_warp,
                      phase_tail=args.phase_tail)
    merged_warp = _mc.resolved_merged_warp()
    set_phase_tail(_mc.resolved_phase_tail())

    def time_class(F):
        """Build + time one bucket class's compiled step; returns
        (sec/step, flops, hbm_bytes, per_block_ms)."""
        st = StepStatic(
            zoo=args.zoo,
            num_layers=ZOO_NUM_LAYERS[args.zoo],
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
            warp_impl=args.warp,
            pose_input_scale=args.pose_input_scale,
            remat_pose=args.remat in ("pose", "both"),
            remat_depth=args.remat in ("depth", "both"),
            merged_warp=merged_warp,
        )
        opt = make_optimizer(steps_per_epoch=3317, vit=(args.zoo == "monovit"))
        state = init_state(st, opt, jax.random.PRNGKey(0))
        state = state.replace(params=inject_realistic_pose_bias(state.params))

        rng = np.random.default_rng(0)
        NF = num_frames(F)
        frames = rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8)
        f_max = np.full(B, F)  # worst-case: every sample at the class budget
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
        flops, hbm_bytes = compiled_costs(step_fn, state, batch, jax.random.PRNGKey(1))

        # warmup / compile
        state2, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["loss"])
        # the tunneled platform's block_until_ready does not block; force a
        # scalar readback for timing (CLAUDE.md)
        float(metrics["loss"])

        # Multiple independent timing blocks, report the BEST one. Per-iter
        # sync would be the textbook fix but is wrong here: tunnel dispatch
        # is ~25-30 ms per python->device readback and block_until_ready is
        # a no-op on this platform, so syncing every iteration serializes
        # the pipeline and times dispatch latency, not the step. A stall
        # hits one block; min-of-blocks rejects it. Steady-state step time
        # is a floor, so min is the right statistic for one-sided noise.
        block_ms = []
        for b in range(args.blocks):
            t0 = time.perf_counter()
            for i in range(args.iters):
                state2, metrics = step_fn(
                    state2, batch, jax.random.PRNGKey(2 + b * args.iters + i)
                )
            float(metrics["loss"])
            block_ms.append((time.perf_counter() - t0) / args.iters * 1e3)
        return min(block_ms) / 1e3, flops, hbm_bytes, block_ms

    platform = jax.devices()[0].platform
    peak = PEAK_FLOPS_BY_PLATFORM.get(platform)
    hbm_bw = HBM_BW_BY_PLATFORM.get(platform)

    def roofline_fields(dt, flops, hbm_bytes):
        out = {"step_ms": round(dt * 1e3, 1)}
        if flops:
            out["flops_per_step"] = round(flops)
        if flops and peak:
            mfu = flops / (dt * peak)
            out["mfu"] = round(mfu, 4)
            out["pct_roofline"] = round(100 * mfu, 2)
        if hbm_bytes:
            out["hbm_bytes_per_step"] = round(hbm_bytes)
        if flops and peak and hbm_bytes and hbm_bw:
            # combined speed-of-light: max(compute floor, memory floor);
            # pct_sol = fraction of that roofline this step achieves
            sol_ms = max(flops / peak, hbm_bytes / hbm_bw) * 1e3
            out["sol_ms"] = round(sol_ms, 1)
            out["pct_sol"] = round(100 * sol_ms / (dt * 1e3), 2)
        return out

    if args.mix or not args.worst:
        # measured (not extrapolated) realistic-epoch throughput of the
        # default bucketed loader (--data.bucket_fs 2,5,7): each class runs
        # its own compiled shape; blended rate = 1 / sum(mix_c * t_c / B)
        weights = {}
        for part in args.mix_weights.split(","):
            k, v = part.split("=")
            weights[int(k)] = float(v)
        assert abs(sum(weights.values()) - 1.0) < 1e-6, "mix must sum to 1"
        times_ms = {}
        blocks_ms = {}
        costs = {}
        for F in sorted(weights):
            dt_c, flops_c, hbm_c, blk = time_class(F)
            times_ms[F] = round(dt_c * 1e3, 1)
            blocks_ms[F] = [round(x, 1) for x in blk]
            costs[F] = (dt_c, flops_c, hbm_c)
            print(f"# class F={F}: {dt_c * 1e3:.1f} ms "
                  f"({B / dt_c:.1f} imgs/s; blocks "
                  f"{[round(x, 1) for x in blk]})", file=sys.stderr)
        # cross-class sanity: a smaller frame budget must not be slower than
        # a larger one (F strictly grows the computed work). BENCH_r04
        # recorded F=5 at 370.7 ms vs F=7's 221.3 -- a stalled timing block
        # masquerading as a measurement. Re-time any violating class.
        retimed = []
        classes = sorted(weights)
        for attempt in range(2):
            bad = [classes[i] for i in range(len(classes) - 1)
                   if times_ms[classes[i]] > times_ms[classes[i + 1]] * 1.02]
            if not bad:
                break
            for F in bad:
                print(f"# non-monotonic class time (F={F}: {times_ms[F]} ms); "
                      f"re-timing", file=sys.stderr)
                dt_c, flops_c, hbm_c, blk = time_class(F)
                if dt_c * 1e3 < times_ms[F]:
                    times_ms[F] = round(dt_c * 1e3, 1)
                    blocks_ms[F] = [round(x, 1) for x in blk]
                    costs[F] = (dt_c, flops_c, hbm_c)
                retimed.append(F)
        worst_costs = costs[classes[-1]]
        sec_per_img = sum(weights[c] * (times_ms[c] / 1e3) / B for c in weights)
        blended = 1.0 / sec_per_img
        worst = B / (max(times_ms.values()) / 1e3)
        out = {
            "metric": "train_imgs_per_sec_per_chip_realistic_mix_640x192",
            "value": round(blended, 2),
            "unit": "imgs/sec/chip",
            "vs_baseline": round(blended / REFERENCE_IMGS_PER_SEC, 3),
            "class_step_ms": {str(k): v for k, v in times_ms.items()},
            "mix": {str(k): v for k, v in weights.items()},
            "worst_case_imgs_per_sec": round(worst, 2),
            "speedup_vs_pad_to_max": round(blended / worst, 3),
        }
        if retimed:
            out["retimed_classes"] = sorted(set(retimed))
        out["class_block_ms"] = {str(k): v for k, v in blocks_ms.items()}
        # roofline numbers for the worst (F=7) class, same as --worst reports
        wf = roofline_fields(*worst_costs)
        wf.pop("step_ms", None)  # already in class_step_ms
        out.update({f"worst_{k}": v for k, v in wf.items()})
        print(json.dumps(out))
        return

    dt, flops, hbm_bytes, blk = time_class(args.F)
    imgs_per_sec = B / dt
    n_chips = 1  # bench runs on one chip; metric is per-chip

    out = {
        "metric": "train_imgs_per_sec_per_chip_full_method_640x192"
        + ("" if args.zoo == "md2" else f"_{args.zoo}")
        + ("" if args.F == 7 else f"_F{args.F}")
        + ("" if args.pose_input_scale == 1.0 else f"_ps{args.pose_input_scale}")
        + ("" if args.remat == "none" else f"_remat_{args.remat}")
        + ("" if args.merged_warp is None
           else ("_mergedwarp" if args.merged_warp else "_nomergedwarp"))
        + ("" if args.phase_tail is None
           else ("_phasetail" if args.phase_tail else "_nophasetail")),
        "value": round(imgs_per_sec / n_chips, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec / n_chips / REFERENCE_IMGS_PER_SEC, 3),
    }
    out.update(roofline_fields(dt, flops, hbm_bytes))
    out["block_ms"] = [round(x, 1) for x in blk]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
