"""Quantify divergence #6 (README "Switching from the reference"): the
dense slot-batched pose stack feeds REPLICA pairs (frame0, frame0) into
BatchNorm batch statistics for samples whose curriculum window is narrower
than the stage budget, whereas the reference's ragged sub-batching only
ever normalizes over real pairs (/root/reference/trainer.py:348-418).

This test measures the shift on a realistic late-stage f_max mix and pins
a bound, so the divergence is a measured quantity instead of an argument.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from baseboostdepth_tpu.models import build_pose_net
from baseboostdepth_tpu.training.step import StepStatic, _n_slot_pairs, _pose_pair_table

H, W = 64, 128


def _frames(rng, B, F, f_max):
    """Natural-ish smooth random frames with out-of-window replicas."""
    NF = 2 * F + 2
    base = rng.random((B, 1, H // 8, W // 8, 3)).astype(np.float32)
    frames = np.repeat(base, NF, axis=1)
    # real frames: smooth variations of the center frame
    for b in range(B):
        for o in range(-f_max[b], f_max[b] + 1):
            jitter = rng.random((H // 8, W // 8, 3)).astype(np.float32)
            frames[b, o + F] = 0.7 * base[b, 0] + 0.3 * jitter
    frames = np.kron(frames, np.ones((1, 1, 8, 8, 1), np.float32))  # upsample
    return jnp.asarray(frames)


@pytest.mark.slow
def test_replica_pair_bn_shift_is_bounded():
    F = 7
    st = StepStatic(zoo="md2", height=H, width=W, F=F, trimin=True,
                    incremental=True, partial=True, decomp=True)
    rng = np.random.default_rng(0)
    B = 8
    # realistic late-epoch mix: most samples at full window, a 30% mini
    # shrink tail (mono_dataset.py:99-108)
    f_max = np.array([7, 7, 7, 7, 7, 3, 2, 1])
    aug = _frames(rng, B, F, f_max)

    pose_net = build_pose_net()
    pvars = pose_net.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 6)), train=False)
    params, stats = pvars["params"], pvars.get("batch_stats", {})

    left, right = _pose_pair_table(st)  # static step pairs (2F)
    n_par = _n_slot_pairs(st)

    # ---- dense path: all pairs incl. replicas (our batching) ----
    dense_pairs = []
    for b in range(B):
        for l, r in zip(left, right):
            dense_pairs.append(np.concatenate([aug[b, l], aug[b, r]], axis=-1))
        # slot-direct pairs for slots 0..3 (offsets +-f, +-(f-1))
        f = f_max[b]
        offs = [f, -f, f - 1, -(f - 1)][:n_par]
        for j, o in enumerate(offs):
            a, c = (F, F + o) if j % 2 == 0 else (F + o, F)
            dense_pairs.append(np.concatenate([aug[b, a], aug[b, c]], axis=-1))
    dense = jnp.asarray(np.stack(dense_pairs))

    # ---- ragged oracle: only the real pairs (reference batching) ----
    real_pairs = []
    real_owner = []  # (dense_index) of the corresponding dense pair
    P = len(left) + n_par
    for b in range(B):
        f = f_max[b]
        for i, (l, r) in enumerate(zip(left, right)):
            # step pair g is real iff g <= f_max (both signs)
            g = (i % F) + 1
            if g <= f:
                real_pairs.append(np.concatenate([aug[b, l], aug[b, r]], axis=-1))
                real_owner.append(b * P + i)
        offs = [f, -f, f - 1, -(f - 1)][:n_par]
        for j, o in enumerate(offs):
            if abs(o) > 1:
                a, c = (F, F + o) if j % 2 == 0 else (F + o, F)
                real_pairs.append(np.concatenate([aug[b, a], aug[b, c]], axis=-1))
                real_owner.append(b * P + len(left) + j)
    ragged = jnp.asarray(np.stack(real_pairs))

    def run(x):
        (aa, t), mut = pose_net.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
        )
        return np.asarray(aa), np.asarray(t), jax.device_get(mut["batch_stats"])

    aa_d, t_d, bs_d = run(dense)
    aa_r, t_r, bs_r = run(ragged)

    # (1) running-stat shift: relative across all BN leaves
    shifts = []
    for ld, lr in zip(jax.tree.leaves(bs_d), jax.tree.leaves(bs_r)):
        denom = np.abs(lr) + 1e-3
        shifts.append(float(np.median(np.abs(ld - lr) / denom)))
    stat_shift = float(np.median(shifts))

    # (2) pose-output shift on the REAL pairs (batch-stat normalization
    # differs between the two batch compositions)
    idx = np.asarray(real_owner)
    d_aa = np.abs(aa_d[idx] - aa_r).max()
    d_t = np.abs(t_d[idx] - t_r).max()

    print(f"\nBN divergence: median running-stat shift {stat_shift:.4f}, "
          f"max |d_axisangle| {d_aa:.5f}, max |d_translation| {d_t:.5f} "
          f"(pose outputs are 0.01-scaled; typical magnitudes ~0.01-0.1)")

    # measured (seed 0): stat shift ~0.02, pose deltas ~2e-4 -- an order of
    # magnitude below typical pose magnitudes. Bound generously; failure
    # here means the replica-pair composition started materially bending
    # BN, and masking replicas out of the BN reduction becomes necessary.
    assert stat_shift < 0.15, stat_shift
    assert d_aa < 2e-3, d_aa
    assert d_t < 2e-3, d_t
