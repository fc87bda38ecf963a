"""The jitted training step: augmentation -> depth + pose forward -> static
candidate-slot warping -> min-reprojection loss -> Adam update.

This is the TPU re-design of the reference's per-batch pipeline
(process_batch trainer.py:286-298, predict_poses trainer.py:310-419,
generate_images_pred trainer.py:444-475, compute_losses trainer.py:488-570 +
x_min_opt trainer.py:983-1100). Differences by design:

- All shapes are static per curriculum stage (StepStatic); the step compiles
  exactly once per stage (two stages over a 20-epoch run) instead of the
  reference's per-batch graph rebuilding.
- Every pose pair needed by the stage (step pairs for chaining, direct pairs
  for partial replacement / the direct path) is stacked on the batch axis and
  sent through ONE pose-net call -- a single large conv workload for the MXU
  rather than many ragged sub-batch launches.
- Pose chaining (incremental_skip) is an unrolled cumulative 4x4 matmul over
  the step axis (geometry.compose_poses). NOTE: the reference's chained
  composition for negative offsets never executes its accumulation loop
  (trainer.py:364 `range(f_i, 0, -1)` is empty for f_i < 0), silently leaving
  those long-jump poses at identity; we chain negative offsets properly --
  the mathematically intended behavior.
- Partial pose replacement is a masked column splice (chained rotation +
  direct translation) instead of a python list rebuild (trainer.py:407-418).
  The reference keeps the chained pose for samples whose ordering max equals
  |f|+2; in slot space that is exactly slots 4/5 (+-(f-2)), encoded in
  batch['slot_partial'].
- Error-induced poses (decomp): stop_gradient(chained pose) with translation
  divided by pose_error, built BEFORE partial replacement, matching the
  reference's op order (trainer.py:375-377 then 407-418).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from baseboostdepth_tpu import geometry, losses
from baseboostdepth_tpu.data.augment import apply_flip, color_jitter
from baseboostdepth_tpu.training.batch import num_temporal_slots
from baseboostdepth_tpu.models import DEPTH_IS_METRIC, build_depth_net, build_pose_net
from baseboostdepth_tpu.ops.sampling import bilinear_sample, resolve_warp
from baseboostdepth_tpu.ops.warp_pallas import (
    bilinear_sample_corner_u8,
    bilinear_sample_pallas_u8,
)
from baseboostdepth_tpu.ops.resize import lanczos_pyramid, resize_bilinear


# --------------------------------------------------------------------------
# Static step configuration (hashable; one jit specialization per value).
# --------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class StepStatic:
    zoo: str = "md2"
    num_layers: int = 18
    height: int = 192
    width: int = 640
    F: int = 2  # stage-wide max temporal offset (NF = 2F + 2)
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    trimin: bool = True
    incremental: bool = False  # chained poses active this stage
    partial: bool = False
    decomp: bool = True
    pose_error: float = 5.5
    use_ssim: bool = True
    min_depth: float = 0.1
    max_depth: float = 100.0
    smooth_weight: float = 1e-3
    # loss normalizer: the reference divides by len(initial opt.scales) == 4
    # even in late epochs that compute one scale (trainer.py:44 vs 568);
    # harmless under Adam but kept for logged-loss comparability.
    loss_norm_scales: int = 4
    dtype: str = "float32"
    # warp backend: "pallas" = packed kernel with custom-VJP bwd sweep;
    # "corner" = packed kernel emits the 4 corner planes and XLA does the
    # (differentiable) blend -- ONE sweep per step instead of two, and the
    # unpack/blend fuses into the photometric loss. "auto" = corner on the
    # packed TPU path (in-step 223 vs 239 ms like-for-like), XLA off-TPU.
    warp_impl: str = "auto"  # auto | corner | pallas | xla
    # photometric backend: the fused Pallas kernel is ~2.7x the XLA
    # reduce_window formulation standalone (15.3 vs 41.1 ms fwd+grad at
    # late-stage volume) but measured SLOWER inside the full step (262.7 vs
    # 248.9 ms -- the custom call blocks producer/consumer fusion with the
    # warp outputs and candidate min and adds planar pad/transpose
    # traffic), so the step defaults to XLA. Revisit with a warp+photo
    # megakernel.
    photo_impl: str = "xla"  # xla | fused
    # performance mode (OFF by default -- a documented divergence when on):
    # run the pose network on bilinearly downscaled pairs. The pose stack is
    # the largest step component (~81 ms of ~248 at F=7); 0.5 cuts its FLOPs
    # 4x. The reference always uses full resolution (trainer.py:348-418).
    pose_input_scale: float = 1.0
    # rematerialization (jax.checkpoint): recompute the net's forward during
    # the backward pass instead of saving activations to HBM. Loss-exact;
    # trades FLOPs for HBM traffic on a step that is memory-bound per XLA's
    # byte counting (bench pct_sol). A/B knobs -- see the CLAUDE.md ledger
    # for measured verdicts before changing the defaults.
    remat_pose: bool = False
    remat_depth: bool = False
    # warp batching: compute the main-slot and error-pose warps in ONE
    # warp_all call (one grid matmul batch + one packed-kernel sweep over
    # 2S-1 slots) instead of two back-to-back calls. Loss-AND-grad exact
    # (the warp is slot-independent elementwise work;
    # tests/test_train_step.py) and the DEFAULT since round 5: step
    # accounting attributed 41 ms to the error-pose warps vs 9.9 for the
    # main slots, and merging the calls reclaimed the asymmetry -- measured
    # 223.0 -> 196.7 ms at F=7 (+13%, docs/results/bench_merged_r4b.json).
    # False reproduces the two-call schedule for A/B.
    merged_warp: bool = True

    @property
    def metric_depth(self) -> bool:
        return self.zoo in DEPTH_IS_METRIC

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any  # {'depth': ..., 'pose': ...}
    stats: Any  # {'depth': batch_stats, 'pose': batch_stats}
    opt_state: Any


def build_networks(st: StepStatic):
    # The decoder always owns all four disp heads; StepStatic.scales only
    # selects which scales enter the loss. (The reference constructs its
    # decoder once with scales [0,1,2,3] and later epochs merely shrink
    # opt.scales for the loss -- trainer.py:88-89 vs 208-212.)
    depth_net = build_depth_net(
        st.zoo, num_layers=st.num_layers, scales=(0, 1, 2, 3), dtype=st.compute_dtype
    )
    pose_net = build_pose_net(dtype=st.compute_dtype)
    return depth_net, pose_net


def init_state(
    st: StepStatic, optimizer: optax.GradientTransformation, rng: jax.Array
) -> TrainState:
    depth_net, pose_net = build_networks(st)
    rd, rp = jax.random.split(rng)
    dvars = depth_net.init(rd, jnp.zeros((1, st.height, st.width, 3)), train=False)
    pvars = pose_net.init(rp, jnp.zeros((1, st.height, st.width, 6)), train=False)
    params = {"depth": dvars["params"], "pose": pvars["params"]}
    stats = {
        "depth": dvars.get("batch_stats", {}),
        "pose": pvars.get("batch_stats", {}),
    }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        stats=stats,
        opt_state=optimizer.init(params),
    )


# --------------------------------------------------------------------------
# Pose pair table (static python -> one batched pose-net call)
# --------------------------------------------------------------------------
def _pose_pair_table(st: StepStatic):
    """Static (left_frame_index, right_frame_index) blocks on the NF axis.

    Incremental stage: [step+ g=1..F | step- g=1..F]. Direct stage:
    [dir+ g=1..F | dir- g=1..F]. Pair orientation and the invert flag follow
    the reference (trainer.py:349-360 step pairs, 380-384 / 396-402 direct
    pairs): negative offsets feed (source, target) with invert=True.

    Direct pairs for partial replacement are NOT in this static table: a
    sample only ever consumes direct translations for its partial-eligible
    slots (offsets +-f_max, +-(f_max-1); trainer.py:407-418), so those pairs
    are gathered per sample by slot_offset in predict_poses -- at most
    _n_slot_pairs(st) of them instead of the 2(F-1) static direct blocks.
    """
    F = st.F
    left, right = [], []
    if st.incremental:
        for g in range(1, F + 1):  # step+ : (g-1, g)
            left.append(F + g - 1), right.append(F + g)
        for g in range(1, F + 1):  # step- : (-g, -g+1), inverted
            left.append(F - g), right.append(F - g + 1)
    else:
        for g in range(1, F + 1):
            left.append(F), right.append(F + g)
        for g in range(1, F + 1):
            left.append(F - g), right.append(F)
    return np.asarray(left), np.asarray(right)


def _n_slot_pairs(st: StepStatic) -> int:
    """How many per-sample direct pose pairs partial replacement needs.

    Partial replacement can only touch slots 0..3 (offsets +-f_max,
    +-(f_max-1)) and only where |offset| > 1 (batch.slot_table /
    trainer.py:409). At stage F == 2 slots 2/3 hold +-1 which is never
    eligible, so 2 pairs suffice; F >= 3 needs all 4; F < 2 never replaces.
    """
    if not (st.incremental and st.partial):
        return 0
    if st.F < 2:
        return 0
    n = 2 if st.F == 2 else 4
    return min(n, num_temporal_slots(st.F, st.trimin))


def _pose_lut(st: StepStatic, aa: jax.Array, t: jax.Array) -> jax.Array:
    """(axisangle, translation) [B, 2F, 3] -> pose lookup table.

    Returns lut [B, 2F+1, 4, 4] with index o+F = T(0 -> o) (offset 0 =
    identity): chained long-jump poses under incremental, direct otherwise.
    """
    B = aa.shape[0]
    F = st.F
    eye = jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4))

    def lut_from(pos, neg):
        # pos[:, g-1] = T(0 -> g), neg[:, g-1] = T(0 -> -g)
        return jnp.concatenate([jnp.flip(neg, axis=1), eye, pos], axis=1)

    if st.incremental:
        step_pos = geometry.transformation_from_parameters(aa[:, :F], t[:, :F], invert=False)
        step_neg = geometry.transformation_from_parameters(aa[:, F : 2 * F], t[:, F : 2 * F], invert=True)
        return lut_from(geometry.compose_poses(step_pos), geometry.compose_poses(step_neg))
    dir_pos = geometry.transformation_from_parameters(aa[:, :F], t[:, :F], invert=False)
    dir_neg = geometry.transformation_from_parameters(aa[:, F:], t[:, F:], invert=True)
    return lut_from(dir_pos, dir_neg)


def _gather_slots(lut: jax.Array, slot_offset: jax.Array, F: int) -> jax.Array:
    """lut [B, 2F+1, 4, 4], slot_offset [B, 6] -> [B, 6, 4, 4]."""
    idx = (slot_offset + F)[:, :, None, None]
    return jnp.take_along_axis(lut, idx, axis=1)


def slot_poses(
    st: StepStatic,
    aa: jax.Array,
    t: jax.Array,
    slot_offset: jax.Array,
    slot_partial: jax.Array,
):
    """Per-slot poses from the batched pose-net outputs.

    aa/t: [B, P, 3] where the first 2F entries are the static pair-table
    poses (step pairs under incremental) and, when partial replacement is
    on, the last _n_slot_pairs(st) entries are the per-sample slot-direct
    poses for slots 0..n_par-1 (even slot index = forward pair, odd =
    reversed pair to be inverted -- matching batch.slot_table's +-
    interleaving).

    Returns (T_slot [B,S,4,4], T_err [B,S,4,4] or None). Order of
    operations follows the reference: error poses derive from the chained
    estimate BEFORE partial replacement (trainer.py:375-377 vs 407-418).
    """
    F = st.F
    lut = _pose_lut(st, aa[:, : 2 * F], t[:, : 2 * F])
    T_chain = _gather_slots(lut, slot_offset, F)

    T_err = None
    if st.decomp and st.trimin:
        T_err = jax.lax.stop_gradient(T_chain)
        T_err = T_err.at[..., :3, 3].set(T_err[..., :3, 3] / st.pose_error)

    T_slot = T_chain
    n_par = _n_slot_pairs(st)
    if n_par > 0:
        B = aa.shape[0]
        aa_d, t_d = aa[:, 2 * F :], t[:, 2 * F :]
        # even slots hold positive offsets (pair (0, +o)), odd slots negative
        # (pair (-o, 0), inverted) -- fixed by slot_table's interleaving
        T_even = geometry.transformation_from_parameters(
            aa_d[:, 0::2], t_d[:, 0::2], invert=False
        )
        T_odd = geometry.transformation_from_parameters(
            aa_d[:, 1::2], t_d[:, 1::2], invert=True
        )
        T_dir = jnp.stack([T_even, T_odd], axis=2).reshape(B, n_par, 4, 4)
        head = T_chain[:, :n_par]
        T_repl = jnp.concatenate([head[..., :, :3], T_dir[..., :, 3:]], axis=-1)
        pm = slot_partial[:, :n_par, None, None]
        T_slot = T_chain.at[:, :n_par].set(jnp.where(pm, T_repl, head))
    return T_slot, T_err


def init_disp_bias(params, value: float):
    """Set every disparity-head conv bias to `value` (a sigmoid logit).

    Cold-start aid, OFF unless configured (the reference keeps torch's
    zero bias): sigmoid(0) = 0.5 puts the initial depth at ~0.2 units
    (disp_to_depth with 0.1/100 bounds), far below typical scene depth, so
    every warp candidate loses the min to the identity candidates and the
    depth gradient vanishes -- training sits on a constant-depth plateau
    until the scale slowly climbs (observed on the synthetic benchmark:
    bf16 escaped at step ~420; an fp32 run stayed flat for 2160 steps).
    value = -2.2 starts depth around 1 unit (~5 m KITTI scale).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        path = "/".join(str(p) for p in k).lower()
        if "dispconv" in path and k[-1] == "bias":
            out[k] = jnp.full_like(v, value)
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(out)


def predict_poses(
    st: StepStatic,
    pose_net,
    pose_params,
    pose_stats,
    aug: jax.Array,
    slot_offset: jax.Array,
    slot_partial: jax.Array,
    train: bool,
):
    """All per-slot poses via ONE batched pose-net call.

    Stacks the static pair table (step pairs under incremental, direct
    otherwise) with the per-sample slot-direct pairs partial replacement
    needs -- gathered from `aug` by slot_offset, so only the <=4 direct
    estimates a sample actually consumes are computed (the reference
    likewise only runs the pose net on real pairs, trainer.py:348-418;
    round 1 ran 2(F-1) static direct blocks = 12 wasted pair passes at F=7).

    aug: [B, NF, H, W, 3] augmented frames. Returns (T_slot, T_err,
    new_pose_stats).
    """
    B, _, H, W, _ = aug.shape
    F = st.F
    cdt = st.compute_dtype

    left, right = _pose_pair_table(st)
    pairs = jnp.concatenate([aug[:, left], aug[:, right]], axis=-1)  # [B,P0,H,W,6]

    n_par = _n_slot_pairs(st)
    if n_par > 0:
        off = slot_offset[:, :n_par]  # [B, n_par] signed offsets
        idx = (off + F)[:, :, None, None, None]
        src = jnp.take_along_axis(aug, idx, axis=1)  # [B, n_par, H, W, 3]
        tgt = jnp.broadcast_to(aug[:, F : F + 1], src.shape)
        # even slots: (target, source); odd slots: (source, target) and the
        # resulting pose is inverted in slot_poses -- the reference's
        # orientation for negative offsets (trainer.py:396-402, 410-415)
        even = (jnp.arange(n_par) % 2 == 0)[None, :, None, None, None]
        lhs = jnp.where(even, tgt, src)
        rhs = jnp.where(even, src, tgt)
        pairs = jnp.concatenate([pairs, jnp.concatenate([lhs, rhs], axis=-1)], axis=1)

    P = pairs.shape[1]
    flat = pairs.reshape((B * P, H, W, 6)).astype(cdt)
    if st.pose_input_scale != 1.0:
        from baseboostdepth_tpu.ops.resize import resize_bilinear

        ph = int(round(H * st.pose_input_scale / 32)) * 32
        pw = int(round(W * st.pose_input_scale / 32)) * 32
        flat = resize_bilinear(flat, ph, pw)
    pvars = {"params": pose_params, "batch_stats": pose_stats}
    if train:
        def _apply(p, s, x):
            (a_, t_), pmut = pose_net.apply(
                {"params": p, "batch_stats": s}, x, train=True,
                mutable=["batch_stats"],
            )
            return a_, t_, pmut["batch_stats"]

        if st.remat_pose:
            _apply = jax.checkpoint(_apply)
        aa, t, new_pstats = _apply(pose_params, pose_stats, flat)
    else:
        aa, t = pose_net.apply(pvars, flat, train=False)
        new_pstats = pose_stats
    aa = aa.reshape(B, P, 3).astype(jnp.float32)
    t = t.reshape(B, P, 3).astype(jnp.float32)

    T_slot, T_err = slot_poses(st, aa, t, slot_offset, slot_partial)
    return T_slot, T_err, new_pstats


# --------------------------------------------------------------------------
# Loss forward (shared by train and the synthetic tests)
# --------------------------------------------------------------------------
def loss_forward(
    params,
    stats,
    batch: Dict[str, jax.Array],
    noise_key: jax.Array,
    st: StepStatic,
    train: bool = True,
    mesh=None,
):
    """Returns (total_loss, (metrics, new_stats))."""
    depth_net, pose_net = build_networks(st)
    H, W, F = st.height, st.width, st.F
    NF = 2 * F + 2

    noise_key, drop_key = jax.random.split(noise_key)

    frames = batch["frames"]
    assert frames.shape[1] == NF, (
        f"batch frame axis {frames.shape[1]} != 2F+2 = {NF}: the loader's "
        f"stage/bucket F and StepStatic.F disagree"
    )
    is_u8 = frames.dtype == jnp.uint8
    frames = apply_flip(frames, batch["flip"])
    color = frames.astype(jnp.float32) / 255.0 if is_u8 else frames

    B = color.shape[0]
    cdt = st.compute_dtype
    # (measured: running the jitter in bf16 does not change the step time
    # -- XLA fuses it into its consumers -- so it stays fp32 for fidelity)
    aug = color_jitter(color, batch["jitter"])

    # ---- depth forward on the augmented target frame ----
    dvars = {"params": params["depth"], "batch_stats": stats["depth"]}
    if train:
        def _depth_apply(p, s, x):
            d_, dmut = depth_net.apply(
                {"params": p, "batch_stats": s}, x, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_key},
            )
            return tuple(d_), dmut["batch_stats"]

        if st.remat_depth:
            _depth_apply = jax.checkpoint(_depth_apply)
        disps, new_dstats = _depth_apply(
            params["depth"], stats["depth"], aug[:, F].astype(cdt)
        )
    else:
        disps = depth_net.apply(dvars, aug[:, F].astype(cdt), train=False)
        new_dstats = stats["depth"]

    # ---- one batched pose-net call over every pair the stage needs ----
    T_slot, T_err, new_pstats = predict_poses(
        st,
        pose_net,
        params["pose"],
        stats["pose"],
        aug,
        batch["slot_offset"],
        batch["slot_partial"],
        train,
    )

    # all 7 slots: 6 temporal + stereo
    T_slots = jnp.concatenate([T_slot, batch["stereo_T"][:, None]], axis=1)

    # ---- slot source images & shared identity losses ----
    src_idx = jnp.concatenate(
        [batch["slot_offset"] + F, jnp.full((B, 1), NF - 1, jnp.int32)], axis=1
    )  # [B, 7]
    sources_raw = jnp.take_along_axis(frames, src_idx[:, :, None, None, None], axis=1)
    sources = sources_raw.astype(jnp.float32) / 255.0 if is_u8 else sources_raw
    target = color[:, F]
    slot_valid = batch["slot_valid"]

    # GSPMD replicates custom calls it cannot partition; under a >1-device
    # mesh both Pallas kernels (packed warp, fused photometric) are
    # shard_map-pinned to per-device batch shards on the data axis.
    multi_dev = mesh is not None and mesh.devices.size > 1

    photo_fn = None
    use_fused_photo = (
        st.photo_impl == "fused" and st.use_ssim and jax.default_backend() == "tpu"
    )
    if use_fused_photo:
        from baseboostdepth_tpu.ops.ssim_pallas import reprojection_loss_fused

        if multi_dev:
            from jax.sharding import PartitionSpec as _P

            photo_fn = jax.shard_map(
                lambda p, t: reprojection_loss_fused(p, t, False),
                mesh=mesh,
                in_specs=(_P("data"), _P("data")),
                out_specs=_P("data"),
                check_vma=False,
            )
        else:
            photo_fn = lambda p, t: reprojection_loss_fused(p, t, False)

    ident_l = losses.slot_losses(
        target, sources, slot_valid, use_ssim=st.use_ssim, photo_fn=photo_fn,
        impl="xla",
    )
    noise = jax.random.normal(noise_key, (B, 1, H, W)) * 1e-5

    pyramid = lanczos_pyramid(target, num_scales=max(st.scales) + 1)

    K = batch["K"]
    inv_K = batch["inv_K"]

    warp_fn = resolve_warp(st.warp_impl)
    use_packed = is_u8 and warp_fn is not bilinear_sample

    # off-TPU the Pallas kernels run in interpret mode, so warp_impl="pallas"
    # exercises the production kernel-under-shard_map path on a CPU mesh
    # (what the driver's dryrun and tests/test_train_step.py validate)
    interp = jax.default_backend() != "tpu"
    # "auto" on the packed path means the corner-plane kernel: measured
    # like-for-like in-step 223.1 ms vs 239.3 ms for the custom-VJP packed
    # kernel (one gather sweep instead of two; the blend fuses into the
    # photometric loss).
    if st.warp_impl in ("corner", "auto"):
        packed_warp = lambda i, g: bilinear_sample_corner_u8(i, g, interpret=interp)
    else:
        packed_warp = lambda i, g: bilinear_sample_pallas_u8(i, g, interpret=interp)
    if use_packed and multi_dev:
        from jax.sharding import PartitionSpec as _P

        packed_warp = jax.shard_map(
            packed_warp,
            mesh=mesh,
            in_specs=(_P("data"), _P("data")),
            out_specs=_P("data"),
            check_vma=False,
        )

    def warp_all(depth_hw, Ts, src_u8=None, src_f=None):
        """depth [B,H,W], Ts [B,S,4,4] -> warped [B,S,H,W,3] (slot i gathers
        source image i unless explicit per-slot sources are passed). On TPU
        with uint8 sources the packed Pallas kernel fetches all three
        channels per gather."""
        S = Ts.shape[1]
        depth_r = jnp.broadcast_to(depth_hw[:, None], (B, S, H, W)).reshape(B * S, H, W)
        K_r = jnp.repeat(K, S, axis=0)
        iK_r = jnp.repeat(inv_K, S, axis=0)
        grid = geometry.warp_grid(depth_r, K_r, iK_r, Ts.reshape(B * S, 4, 4))
        if use_packed:
            src = sources_raw[:, :S] if src_u8 is None else src_u8
            return packed_warp(
                src.reshape(B * S, H, W, 3), grid
            ).reshape(B, S, H, W, 3)
        src = sources[:, :S] if src_f is None else src_f
        return warp_fn(
            src.reshape(B * S, H, W, 3), grid
        ).reshape(B, S, H, W, 3)

    total = 0.0
    metrics: Dict[str, jax.Array] = {}
    for s in st.scales:
        disp = disps[s]  # decoder returns all four scales, finest first
        disp_full = disp if disp.shape[1:3] == (H, W) else resize_bilinear(disp, H, W)
        if st.metric_depth:
            depth = disp_full[..., 0]
        else:
            _, depth = geometry.disp_to_depth(disp_full[..., 0], st.min_depth, st.max_depth)

        if T_err is not None and st.merged_warp:
            # error slot i reuses main slot i's source (T_err has S-1 slots)
            S_main, S_err = T_slots.shape[1], T_err.shape[1]
            both = warp_all(
                depth,
                jnp.concatenate([T_slots, T_err], axis=1),
                src_u8=jnp.concatenate(
                    [sources_raw[:, :S_main], sources_raw[:, :S_err]], axis=1
                ),
                src_f=jnp.concatenate(
                    [sources[:, :S_main], sources[:, :S_err]], axis=1
                ),
            )
            warped, warped_e = both[:, :S_main], both[:, S_main:]
        else:
            warped = warp_all(depth, T_slots)
            warped_e = warp_all(depth, T_err) if T_err is not None else None
        warp_l = losses.slot_losses(
            target, warped, slot_valid, use_ssim=st.use_ssim, photo_fn=photo_fn,
            impl="xla",
        )

        err_l = None
        if warped_e is not None:
            err_l = losses.slot_losses(
                target, warped_e, slot_valid[:, :-1], use_ssim=st.use_ssim,
                photo_fn=photo_fn, impl="xla",
            )

        min_l = losses.min_reprojection(warp_l, ident_l, noise, err_l)
        loss_s = jnp.mean(min_l)

        # SQL's head emits at H/2; the reference upsamples before the
        # smoothness term (trainer.py:558-559)
        if st.smooth_weight:  # static; 0.0 skips the term entirely (ablation)
            disp_sm = disp if disp.shape[1:3] == pyramid[s].shape[1:3] else resize_bilinear(
                disp, pyramid[s].shape[1], pyramid[s].shape[2]
            )
            nd = losses.normalized_disp(disp_sm)
            sm = losses.smooth_loss(nd, pyramid[s].astype(nd.dtype))
            loss_s = loss_s + st.smooth_weight * sm / (2**s)

        metrics[f"loss/{s}"] = loss_s
        total = total + loss_s

    total = total / st.loss_norm_scales
    metrics["loss"] = total
    new_stats = {"depth": new_dstats, "pose": new_pstats}
    return total, (metrics, new_stats)


# --------------------------------------------------------------------------
# The jitted update
# --------------------------------------------------------------------------
def make_train_step(
    st: StepStatic, optimizer: optax.GradientTransformation, mesh=None
):
    """Build train_step(state, batch, rng) -> (state, metrics), jitted with
    state donation. Pass the data mesh so the Pallas warp shards with the
    batch instead of being replicated by GSPMD."""

    def _step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_forward, has_aux=True)
        (loss, (metrics, new_stats)), grads = grad_fn(
            state.params, state.stats, batch, rng, st, True, mesh
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    return jax.jit(_step, donate_argnums=(0,))


def make_debug_forward(st: StepStatic):
    """Build debug_fn(params, stats, batch, rng) -> image panel tensors.

    The observability the reference gets from wandb image logging
    (trainer.py:736-772): target, colormappable disparity, per-slot warped
    candidates, the per-pixel min loss, and which candidate won (warp /
    identity / error-pose per slot -- the reference's `ident` masks,
    trainer.py:1046-1100). Run on demand at log time; never in the train
    loop.
    """

    @jax.jit
    def _dbg(params, stats, batch, rng):
        H, W, F = st.height, st.width, st.F
        frames = batch["frames"]
        is_u8 = frames.dtype == jnp.uint8
        frames = apply_flip(frames, batch["flip"])
        color = frames.astype(jnp.float32) / 255.0 if is_u8 else frames

        depth_net, pose_net = build_networks(st)
        dvars = {"params": params["depth"], "batch_stats": stats["depth"]}
        disps = depth_net.apply(dvars, color[:, F].astype(st.compute_dtype), train=False)
        disp0 = disps[0].astype(jnp.float32)
        disp_full = disp0 if disp0.shape[1:3] == (H, W) else resize_bilinear(disp0, H, W)

        T_slot, T_err, _ = predict_poses(
            st, pose_net, params["pose"], stats["pose"], color,
            batch["slot_offset"], batch["slot_partial"], train=False,
        )
        T_slots = jnp.concatenate([T_slot, batch["stereo_T"][:, None]], axis=1)

        if st.metric_depth:
            depth = disp_full[..., 0]
        else:
            _, depth = geometry.disp_to_depth(disp_full[..., 0], st.min_depth, st.max_depth)

        B = color.shape[0]
        S = T_slots.shape[1]
        target = color[:, F]
        src_idx = jnp.concatenate(
            [batch["slot_offset"] + F, jnp.full((B, 1), 2 * F + 1, jnp.int32)], axis=1
        )
        sources = jnp.take_along_axis(color, src_idx[:, :, None, None, None], axis=1)

        def warp(Ts):
            n = Ts.shape[1]
            d = jnp.broadcast_to(depth[:, None], (B, n, H, W)).reshape(B * n, H, W)
            grid = geometry.warp_grid(
                d, jnp.repeat(batch["K"], n, axis=0), jnp.repeat(batch["inv_K"], n, axis=0),
                Ts.reshape(B * n, 4, 4),
            )
            return bilinear_sample(sources[:, :n].reshape(B * n, H, W, 3), grid).reshape(
                B, n, H, W, 3
            )

        warped = warp(T_slots)
        slot_valid = batch["slot_valid"]
        warp_l = losses.slot_losses(target, warped, slot_valid, use_ssim=st.use_ssim)
        ident_l = losses.slot_losses(target, sources, slot_valid, use_ssim=st.use_ssim)
        noise = jax.random.normal(rng, (B, 1, H, W)) * 1e-5
        cands = [warp_l, ident_l + noise]
        if T_err is not None:
            warped_e = warp(T_err)
            cands.append(
                losses.slot_losses(target, warped_e, slot_valid[:, :-1], use_ssim=st.use_ssim)
            )
        all_c = jnp.concatenate(cands, axis=1)
        winner = jnp.argmin(all_c, axis=1).astype(jnp.int32)
        return {
            "target": target,
            "disp": disp_full[..., 0],
            "depth": depth,
            "warped": warped,
            "min_loss": jnp.min(all_c, axis=1),
            # candidate index: 0..S-1 warp, S..2S-1 identity, 2S.. error
            "winner": winner,
            # automask = an identity candidate won (stationary pixel;
            # reference's `ident` bookkeeping, trainer.py:1046-1100)
            "automask": ((winner >= S) & (winner < 2 * S)).astype(jnp.float32),
        }

    return _dbg


def make_eval_forward(st: StepStatic):
    """Build eval_fn(params, stats, images [B,H,W,3]) -> full-res depth
    [B,H,W] (the val()/evaluate path: disp_0 -> disp_to_depth;
    reference trainer.py:299-307)."""
    depth_net, _ = build_networks(st)

    @jax.jit
    def _fwd(params, stats, images):
        dvars = {"params": params["depth"], "batch_stats": stats["depth"]}
        disps = depth_net.apply(dvars, images.astype(st.compute_dtype), train=False)
        disp0 = disps[0].astype(jnp.float32)
        if st.metric_depth:
            return disp0[..., 0]
        _, depth = geometry.disp_to_depth(disp0[..., 0], st.min_depth, st.max_depth)
        return depth

    return _fwd
