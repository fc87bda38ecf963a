"""Train-step tests: slot-table parity with the reference's candidate
enumeration, a brute-force ragged oracle for the masked min, finiteness of
both curriculum stages, and a loss-decrease smoke run."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from baseboostdepth_tpu.training.batch import make_batch, num_frames, slot_table
from baseboostdepth_tpu.training.step import (
    StepStatic,
    TrainState,
    init_state,
    loss_forward,
    make_train_step,
)
from baseboostdepth_tpu import losses
from baseboostdepth_tpu.ops.ssim import reprojection_loss


H, W = 64, 128


def _kitti_K(width, height):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * width, 1.92 * height
    K[0, 2], K[1, 2] = 0.5 * width, 0.5 * height
    return K


def _toy_batch(rng, B, F, trimin=True, f_max=None, classic=False):
    NF = num_frames(F)
    frames = rng.integers(0, 255, (B, NF, H, W, 3), dtype=np.uint8)
    if f_max is None:
        f_max = rng.integers(0, F + 1, B)
    # replicate frame 0 into out-of-window positions (loader contract)
    for b in range(B):
        for o in range(-F, F + 1):
            if abs(o) > f_max[b]:
                frames[b, o + F] = frames[b, F]
    K = np.broadcast_to(_kitti_K(W, H), (B, 4, 4)).copy()
    stereo_T = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    stereo_T[:, 0, 3] = 0.1
    flip = np.zeros(B, bool)
    jitter = np.ones((B, NF, 4), np.float32)
    jitter[..., 3] = 0.0
    return make_batch(frames, f_max, K, stereo_T, flip, jitter, F, trimin, True, classic)


class TestSlotTable:
    """Slot sets must reproduce the reference's per-max-frame candidate
    enumeration (x_min_opt trainer.py:983-1100)."""

    def test_trimin_sets(self):
        def valid_offsets(f):
            off, valid, _ = slot_table(f, 7, trimin=True, use_stereo=True)
            s = {int(o) for o, v in zip(off, valid[:6]) if v}
            return s, bool(valid[6])

        assert valid_offsets(0) == (set(), True)
        assert valid_offsets(1) == ({1, -1}, True)
        assert valid_offsets(2) == ({2, -2, 1, -1}, True)
        for f in range(3, 8):
            s, stereo = valid_offsets(f)
            assert s == {f, -f, f - 1, -(f - 1), f - 2, -(f - 2)}
            assert not stereo

    def test_non_trimin_sets(self):
        off, valid, _ = slot_table(3, 7, trimin=False, use_stereo=True)
        assert {int(o) for o, v in zip(off, valid[:6]) if v} == {3, -3}
        assert not valid[6]
        _, valid0, _ = slot_table(0, 7, trimin=False, use_stereo=True)
        assert valid0[6] and not valid0[:6].any()

    def test_partial_eligibility(self):
        # f=5: slots 0-3 are +-5, +-4 -> replaced; slots 4,5 (+-3) keep chain
        off, valid, part = slot_table(5, 7, trimin=True, use_stereo=True)
        assert part.tolist() == [True, True, True, True, False, False]
        # f=1: |off| == 1 -> never replaced (trainer.py:409 abs(f_i) > 1)
        _, _, p1 = slot_table(1, 7, trimin=True, use_stereo=True)
        assert not p1.any()


class TestMinReprojectionOracle:
    def test_masked_min_equals_bruteforce(self):
        """Static masked min == per-sample ragged min over exactly the valid
        candidate set."""
        rng = np.random.default_rng(0)
        B, S, h, w = 4, 7, 8, 10
        warp = rng.random((B, S, h, w)).astype(np.float32)
        ident = rng.random((B, S, h, w)).astype(np.float32)
        err = rng.random((B, S, h, w)).astype(np.float32)
        valid = rng.random((B, S)) > 0.4
        valid[:, 0] = True  # every sample needs one valid candidate
        noise = (rng.standard_normal((B, 1, h, w)) * 1e-5).astype(np.float32)

        wl = np.where(valid[:, :, None, None], warp, 1e4)
        il = np.where(valid[:, :, None, None], ident, 1e4)
        el = np.where(valid[:, :6, None, None], err[:, :6], 1e4)

        out = np.asarray(
            losses.min_reprojection(
                jnp.asarray(wl), jnp.asarray(il), jnp.asarray(noise), jnp.asarray(el)
            )
        )

        for b in range(B):
            cands = []
            for s in range(S):
                if valid[b, s]:
                    cands.append(warp[b, s])
                    cands.append(ident[b, s] + noise[b, 0])
                    if s < 6:
                        cands.append(err[b, s])
            ref = np.min(np.stack(cands), axis=0)
            np.testing.assert_allclose(out[b], ref, atol=1e-6)


def _static(F, incremental, scales=(0,)):
    return StepStatic(
        zoo="md2",
        num_layers=18,
        height=H,
        width=W,
        F=F,
        scales=scales,
        trimin=True,
        incremental=incremental,
        partial=incremental,
        decomp=True,
        pose_error=5.5,
    )


class TestLossForward:
    @pytest.mark.parametrize(
        "F,incremental,scales",
        [(2, False, (0, 1)), (3, True, (0,))],
        ids=["early-stage", "late-stage"],
    )
    def test_finite_loss_both_stages(self, F, incremental, scales):
        st = _static(F, incremental, scales)
        opt = optax.adam(1e-4)
        state = init_state(st, opt, jax.random.PRNGKey(0))
        batch = _toy_batch(np.random.default_rng(1), 3, F)
        batch = jax.tree.map(jnp.asarray, batch)
        loss, (metrics, new_stats) = loss_forward(
            state.params, state.stats, batch, jax.random.PRNGKey(2), st, True
        )
        assert np.isfinite(float(loss)), metrics
        assert float(loss) < 1.0  # photometric losses live well below 1
        for s in scales:
            assert np.isfinite(float(metrics[f"loss/{s}"]))
        # BN stats must actually update
        diff = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), state.stats, new_stats
        )
        assert max(jax.tree.leaves(diff)) > 0

    def test_loss_decreases(self):
        st = _static(1, False, (0,))
        opt = optax.adam(1e-3)
        state = init_state(st, opt, jax.random.PRNGKey(0))
        step_fn = make_train_step(st, opt)
        batch = jax.tree.map(jnp.asarray, _toy_batch(np.random.default_rng(3), 2, 1, f_max=np.array([1, 1])))
        hist = []
        for i in range(6):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            hist.append(float(metrics["loss"]))
        assert all(np.isfinite(hist))
        assert hist[-1] < hist[0], hist


class TestPosePlumbing:
    """Pose lookup tables and slot-pose assembly against manual composition
    (reference semantics: chained long-jumps trainer.py:348-373, partial
    translation splice trainer.py:407-418, error pose trainer.py:375-377)."""

    def _random_posenet_out(self, rng, B, P):
        aa = jnp.asarray(rng.standard_normal((B, P, 3)).astype(np.float32) * 0.05)
        t = jnp.asarray(rng.standard_normal((B, P, 3)).astype(np.float32) * 0.05)
        return aa, t

    def test_incremental_lut_matches_manual_chaining(self):
        from baseboostdepth_tpu import geometry
        from baseboostdepth_tpu.training.step import _pose_lut

        F = 3
        st = _static(F, incremental=True)
        rng = np.random.default_rng(0)
        B, P = 2, 2 * F
        aa, t = self._random_posenet_out(rng, B, P)
        lut = _pose_lut(st, aa, t)
        assert lut.shape == (B, 2 * F + 1, 4, 4)

        steps_pos = [
            np.asarray(geometry.transformation_from_parameters(aa[:, g], t[:, g]))
            for g in range(F)
        ]
        steps_neg = [
            np.asarray(geometry.transformation_from_parameters(aa[:, F + g], t[:, F + g], invert=True))
            for g in range(F)
        ]
        # T(0->g) = step_g @ ... @ step_1
        acc = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4))
        for g in range(F):
            acc = steps_pos[g] @ acc
            np.testing.assert_allclose(np.asarray(lut[:, F + g + 1]), acc, atol=1e-5)
        acc = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4))
        for g in range(F):
            acc = steps_neg[g] @ acc
            np.testing.assert_allclose(np.asarray(lut[:, F - g - 1]), acc, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lut[:, F]), np.broadcast_to(np.eye(4), (B, 4, 4)), atol=1e-6)

    def test_partial_splice_and_error_pose(self):
        from baseboostdepth_tpu import geometry
        from baseboostdepth_tpu.training.step import _n_slot_pairs, _pose_lut, slot_poses

        F = 3
        st = _static(F, incremental=True)
        rng = np.random.default_rng(1)
        B = 2
        n_par = _n_slot_pairs(st)
        assert n_par == 4
        P = 2 * F + n_par
        aa, t = self._random_posenet_out(rng, B, P)

        slot_offset = np.tile(np.array([3, -3, 2, -2, 1, -1], np.int32), (B, 1))
        slot_partial = np.tile(
            np.array([True, True, True, True, False, False]), (B, 1)
        )
        T_slot, T_err = slot_poses(
            st, aa, t, jnp.asarray(slot_offset), jnp.asarray(slot_partial)
        )
        lut = _pose_lut(st, aa[:, : 2 * F], t[:, : 2 * F])

        # slot 0 (+3): direct pose from slot-pair 0, forward orientation
        chain3 = np.asarray(lut[:, F + 3])
        dir3 = np.asarray(
            geometry.transformation_from_parameters(aa[:, 2 * F], t[:, 2 * F])
        )
        got = np.asarray(T_slot[:, 0])
        # partial slot: chained rotation columns + direct translation column
        np.testing.assert_allclose(got[..., :3], chain3[..., :3], atol=1e-6)
        np.testing.assert_allclose(got[..., 3], dir3[..., 3], atol=1e-6)
        # slot 1 (-3): direct pose from slot-pair 1, inverted orientation
        chain_m3 = np.asarray(lut[:, F - 3])
        dir_m3 = np.asarray(
            geometry.transformation_from_parameters(
                aa[:, 2 * F + 1], t[:, 2 * F + 1], invert=True
            )
        )
        got1 = np.asarray(T_slot[:, 1])
        np.testing.assert_allclose(got1[..., :3], chain_m3[..., :3], atol=1e-6)
        np.testing.assert_allclose(got1[..., 3], dir_m3[..., 3], atol=1e-6)
        # non-partial slot (+-1) keeps the chained pose
        np.testing.assert_allclose(np.asarray(T_slot[:, 4]), np.asarray(lut[:, F + 1]), atol=1e-6)
        # error pose: chained pose with translation / pose_error
        np.testing.assert_allclose(
            np.asarray(T_err[:, 0, :3, 3]), chain3[:, :3, 3] / st.pose_error, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(T_err[:, 0, :3, :3]), chain3[:, :3, :3], atol=1e-6)

    def test_slot_pair_gather_matches_per_pair_oracle(self):
        """predict_poses' gathered slot-direct pairs must equal running the
        pose net on each sample's real (frame0, frame_o) pairs individually
        (the reference's per-pair enumeration, trainer.py:407-418). Eval
        mode so BN uses running stats and outputs are batch-agnostic."""
        from baseboostdepth_tpu import geometry
        from baseboostdepth_tpu.models import build_pose_net
        from baseboostdepth_tpu.training.step import (
            _pose_lut,
            _pose_pair_table,
            predict_poses,
        )

        F = 3
        st = _static(F, incremental=True)
        rng = np.random.default_rng(5)
        B, NF = 2, num_frames(F)
        aug = jnp.asarray(rng.random((B, NF, H, W, 3), dtype=np.float32))
        # sample 0: f_max=3 (all partial slots); sample 1: f_max=2
        slot_offset = jnp.asarray(
            np.array([[3, -3, 2, -2, 1, -1], [2, -2, 1, -1, 0, 0]], np.int32)
        )
        slot_partial = jnp.asarray(
            np.array(
                [[True, True, True, True, False, False],
                 [True, True, False, False, False, False]]
            )
        )

        pose_net = build_pose_net()
        pvars = pose_net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)), train=False)
        pparams, pstats = pvars["params"], pvars.get("batch_stats", {})

        T_slot, T_err, _ = predict_poses(
            st, pose_net, pparams, pstats, aug, slot_offset, slot_partial, train=False
        )

        def pose_of(pair_img):
            aa, t = pose_net.apply(
                {"params": pparams, "batch_stats": pstats}, pair_img[None], train=False
            )
            return aa[0], t[0]

        # oracle: chained poses from per-pair step estimates
        left, right = _pose_pair_table(st)
        for b in range(B):
            aa_all, t_all = [], []
            for l, r in zip(left, right):
                aa_, t_ = pose_of(jnp.concatenate([aug[b, l], aug[b, r]], axis=-1))
                aa_all.append(aa_), t_all.append(t_)
            lut = _pose_lut(st, jnp.stack(aa_all)[None], jnp.stack(t_all)[None])[0]
            for j in range(6):
                o = int(slot_offset[b, j])
                expected = np.asarray(lut[o + F])
                if bool(slot_partial[b, j]):
                    # direct pair for this slot
                    if o > 0:
                        aa_d, t_d = pose_of(
                            jnp.concatenate([aug[b, F], aug[b, F + o]], axis=-1)
                        )
                        T_d = geometry.transformation_from_parameters(aa_d, t_d)
                    else:
                        aa_d, t_d = pose_of(
                            jnp.concatenate([aug[b, F + o], aug[b, F]], axis=-1)
                        )
                        T_d = geometry.transformation_from_parameters(
                            aa_d, t_d, invert=True
                        )
                    expected = expected.copy()
                    expected[:, 3] = np.asarray(T_d)[:, 3]
                np.testing.assert_allclose(
                    np.asarray(T_slot[b, j]), expected, atol=2e-5,
                    err_msg=f"sample {b} slot {j} offset {o}",
                )


def test_remat_is_loss_and_grad_exact():
    """remat_pose/remat_depth (jax.checkpoint) must not change the loss or
    the gradients -- it only changes what is saved vs recomputed."""
    import dataclasses

    st = _static(2, True, (0,))
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    batch = _toy_batch(np.random.default_rng(1), 3, 2)
    batch = jax.tree.map(jnp.asarray, batch)

    def loss_and_grads(st_v):
        grad_fn = jax.value_and_grad(loss_forward, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, state.stats, batch, jax.random.PRNGKey(2), st_v, True
        )
        return float(loss), grads

    base_loss, base_grads = loss_and_grads(st)
    remat_loss, remat_grads = loss_and_grads(
        dataclasses.replace(st, remat_pose=True, remat_depth=True)
    )
    # not bit-exact: rematerialization changes XLA fusion and thus float
    # summation order (measured max leaf delta 4.8e-6 on grads of ~1e-3)
    assert base_loss == pytest.approx(remat_loss, abs=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-5),
        base_grads, remat_grads,
    )


def test_merged_warp_is_loss_and_grad_exact():
    """merged_warp (main + error-pose warps in one warp_all call) must
    reproduce the two-call loss and gradients: the warp is slot-independent
    elementwise work, so batching slots differently cannot change values
    (only float summation order inside the 4x4 grid matmuls, which are
    fp32-forced and per-element deterministic)."""
    import dataclasses

    st = _static(2, True, (0,))  # incremental+partial+decomp: T_err active
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    batch = _toy_batch(np.random.default_rng(1), 3, 2)
    batch = jax.tree.map(jnp.asarray, batch)

    def loss_and_grads(st_v):
        grad_fn = jax.value_and_grad(loss_forward, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, state.stats, batch, jax.random.PRNGKey(2), st_v, True
        )
        return float(loss), grads

    base_loss, base_grads = loss_and_grads(
        dataclasses.replace(st, merged_warp=False)
    )
    merged_loss, merged_grads = loss_and_grads(
        dataclasses.replace(st, merged_warp=True)
    )
    assert base_loss == pytest.approx(merged_loss, abs=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7),
        base_grads, merged_grads,
    )


def test_vit_optimizer_grouping():
    """MonoViT two-group AdamW: depth-encoder params get the lower LR
    (reference trainer.py:106-109). Verify the label function routes the
    encoder subtree to the 'encoder' transform."""
    from baseboostdepth_tpu.training.optim import make_optimizer

    params = {
        "depth": {"encoder": {"w": jnp.ones((2,))}, "decoder": {"w": jnp.ones((2,))}},
        "pose": {"encoder": {"w": jnp.ones((2,))}},
    }
    opt = make_optimizer(learning_rate=1e-4, steps_per_epoch=10, vit=True, vit_encoder_lr=5e-5)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    # AdamW with constant grads: |update| == lr (per-group)
    enc = float(jnp.abs(updates["depth"]["encoder"]["w"][0]))
    dec = float(jnp.abs(updates["depth"]["decoder"]["w"][0]))
    pose = float(jnp.abs(updates["pose"]["encoder"]["w"][0]))
    assert enc < dec * 0.75, (enc, dec)  # encoder at 5e-5-ish vs 1e-4-ish
    assert abs(pose - dec) / dec < 0.2   # pose encoder is NOT the depth encoder


def test_disp_init_bias():
    """Cold-start bias touches exactly the dispconv biases and moves the
    initial depth from ~0.2 to ~1 unit (see step.init_disp_bias)."""
    from baseboostdepth_tpu import geometry
    from baseboostdepth_tpu.training.step import init_disp_bias, make_eval_forward

    st = StepStatic(zoo="md2", height=H, width=W, F=1, scales=(0,))
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    new_depth = init_disp_bias(state.params["depth"], -2.2)

    changed = unchanged = 0
    flat_old = jax.tree_util.tree_flatten_with_path(state.params["depth"])[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_depth)[0])
    for path, old in flat_old:
        new = flat_new[path]
        p = "/".join(str(x) for x in path).lower()
        if "dispconv" in p and "bias" in p:
            assert np.allclose(np.asarray(new), -2.2)
            changed += 1
        else:
            np.testing.assert_array_equal(np.asarray(new), np.asarray(old))
            unchanged += 1
    assert changed == 4 and unchanged > 10, (changed, unchanged)

    state = state.replace(params=dict(state.params, depth=new_depth))
    fwd = make_eval_forward(st)
    img = jnp.full((1, H, W, 3), 0.5, jnp.float32)
    depth = np.asarray(fwd(state.params, state.stats, img))
    assert 0.5 < float(np.median(depth)) < 2.5, float(np.median(depth))


def test_classic_monodepth2_mode():
    """curriculum=False: frames [0,-1,1,'s'], joint min over temporal+stereo
    candidates, no trimin/decomp."""
    st = StepStatic(zoo="md2", height=H, width=W, F=1, scales=(0, 1),
                    trimin=False, incremental=False, partial=False, decomp=False)
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    batch = _toy_batch(np.random.default_rng(7), 2, 1, trimin=False,
                       f_max=np.array([1, 1]), classic=True)
    assert batch["slot_valid"][:, -1].all()  # stereo always on in classic mode
    batch = jax.tree.map(jnp.asarray, batch)
    loss, (metrics, _) = loss_forward(state.params, state.stats, batch,
                                      jax.random.PRNGKey(1), st, True)
    assert np.isfinite(float(loss))


def test_no_ssim_flag():
    st = StepStatic(zoo="md2", height=H, width=W, F=1, scales=(0,),
                    trimin=True, use_ssim=False)
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    batch = jax.tree.map(jnp.asarray, _toy_batch(np.random.default_rng(8), 2, 1))
    loss, _ = loss_forward(state.params, state.stats, batch, jax.random.PRNGKey(1), st, True)
    assert np.isfinite(float(loss))


def test_state_carries_across_curriculum_stages():
    """The epoch 9 -> 10 transition changes F, scales, and the method gates
    (trainer.py:207-230); the SAME TrainState must train under both compiled
    specializations (params/opt_state are stage-independent because the
    decoder always owns all four disp heads)."""
    opt = optax.adam(1e-4)
    early = _static(2, incremental=False, scales=(0, 1, 2, 3))
    late = _static(3, incremental=True, scales=(0,))
    state = init_state(early, opt, jax.random.PRNGKey(0))

    step_early = make_train_step(early, opt)
    batch_e = jax.tree.map(jnp.asarray, _toy_batch(np.random.default_rng(1), 2, 2))
    state, m_e = step_early(state, batch_e, jax.random.PRNGKey(1))
    assert np.isfinite(float(m_e["loss"]))

    step_late = make_train_step(late, opt)
    batch_l = jax.tree.map(jnp.asarray, _toy_batch(np.random.default_rng(2), 2, 3))
    state, m_l = step_late(state, batch_l, jax.random.PRNGKey(2))
    assert np.isfinite(float(m_l["loss"]))
    assert int(np.asarray(state.step)) == 2
