"""Frame-budget bucketing: batches grouped by curriculum window class must
realize EXACTLY the same per-sample plans (window, flip, jitter, frames) as
the unbucketed loader -- only batch composition may differ. This is the
loss-identity contract of the round-2 pose-economy work: the reference only
computes real pose pairs (/root/reference/trainer.py:348-418); bucketing
recovers that with static shapes per class.
"""

import hashlib
import os

import numpy as np
import pytest
from PIL import Image

from baseboostdepth_tpu.data import kitti
from baseboostdepth_tpu.data.curriculum import stage_for_epoch
from baseboostdepth_tpu.data.loader import KittiTrainLoader
from baseboostdepth_tpu.training.batch import num_frames


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    rng = np.random.default_rng(0)
    for cam in (2, 3):
        d = root / folder / f"image_0{cam}" / "data"
        d.mkdir(parents=True)
        for i in range(40):
            arr = rng.integers(0, 255, (48, 160, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:010d}.jpg", quality=96)
    split = root / "split.txt"
    # baselines spread so late-stage windows land in different classes:
    # f = floor(cutoff / baseline) clipped to 7
    lines = []
    for i in range(7, 33):
        baseline = [0.05, 0.3, 0.7, 1.2][i % 4]
        lines.append(f"{folder} {i} l kt {baseline}")
    split.write_text("\n".join(lines) + "\n")
    return str(root), str(split)


def _sample_fingerprints(batches):
    """Multiset of per-sample plan fingerprints across all batches."""
    out = []
    for b in batches:
        B, NF = b["frames"].shape[:2]
        F_c = (NF - 2) // 2
        for i in range(B):
            f = int(np.abs(b["slot_offset"][i]).max(initial=0))
            center = b["frames"][i, F_c]
            h = hashlib.sha1(center.tobytes()).hexdigest()[:16]
            out.append(
                (
                    h,
                    f,
                    bool(b["flip"][i]),
                    float(b["stereo_T"][i, 0, 3]),
                    tuple(np.round(b["jitter"][i, F_c], 5)),
                )
            )
    return out


def test_bucketed_plans_match_unbucketed(kitti_tree, caplog):
    root, split = kitti_tree
    index = kitti.KittiRawIndex(root, split)
    stage = stage_for_epoch(14, trimin=True)  # F=7, wide class mix
    kw = dict(
        batch_size=2, height=48, width=160, trimin=True, use_stereo=True,
        num_workers=2, seed=5, use_native=False,
    )
    plain = list(KittiTrainLoader(index, stage, **kw))
    with caplog.at_level("INFO", logger="baseboostdepth_tpu.data.loader"):
        bucketed = list(
            KittiTrainLoader(index, stage, bucket_fs=(2, 5, 7), **kw)
        )

    assert bucketed, "no bucketed batches produced"
    for b in bucketed:
        NF = b["frames"].shape[1]
        F_c = (NF - 2) // 2
        assert F_c in (2, 5, 7)
        # every sample fits its class
        assert int(np.abs(b["slot_offset"]).max(initial=0)) <= F_c
        assert b["jitter"].shape[1] == NF

    plain_fp = _sample_fingerprints(plain)
    bucket_fp = _sample_fingerprints(bucketed)
    # identical per-sample plans; bucketing only drops per-class leftovers
    missing = [fp for fp in bucket_fp if fp not in plain_fp]
    assert not missing, missing[:3]
    assert len(bucket_fp) >= 0.5 * len(plain_fp), (len(bucket_fp), len(plain_fp))
    # at least two distinct classes realized with this seed/baseline mix
    classes = {b["frames"].shape[1] for b in bucketed}
    assert len(classes) >= 2, classes
    # the coverage cost is quantified per epoch: one INFO line whose dropped
    # count equals exactly the plans that never made a full class batch
    drop_lines = [r for r in caplog.records if "leftovers" in r.getMessage()]
    assert len(drop_lines) == 1, [r.getMessage() for r in caplog.records]
    n_dropped = len(plain_fp) - len(bucket_fp)
    assert f"{n_dropped}/{len(index)} samples dropped" in drop_lines[0].getMessage()


def test_skip_batches_resumes_loader_stream(kitti_tree):
    """skip_batches=k must yield exactly the batches [k:] of the same-seed
    loader -- the mid-epoch checkpoint-resume contract (a resumed run sees
    precisely what an uninterrupted run would have seen next), including
    under bucket_fs where batch boundaries depend on drawn plans."""
    root, split = kitti_tree
    index = kitti.KittiRawIndex(root, split)
    stage = stage_for_epoch(14, trimin=True)
    for bucket_fs in (None, (2, 5, 7)):
        kw = dict(
            batch_size=2, height=48, width=160, trimin=True, use_stereo=True,
            num_workers=2, seed=5, use_native=False, bucket_fs=bucket_fs,
        )
        full = list(KittiTrainLoader(index, stage, **kw))
        k = 3
        resumed = list(KittiTrainLoader(index, stage, skip_batches=k, **kw))
        assert len(resumed) == len(full) - k, (len(resumed), len(full), bucket_fs)
        for a, b in zip(full[k:], resumed):
            assert set(a.keys()) == set(b.keys())
            for key in a:
                np.testing.assert_array_equal(a[key], b[key], err_msg=f"{bucket_fs} {key}")


@pytest.mark.slow
def test_bucketed_batches_train_with_shared_state(kitti_tree):
    """The trainer wiring contract: one TrainState steps under a per-class
    jit specialization (StepStatic with F=F_c) for every bucketed batch --
    params/opt state are F-independent (the decoder owns all heads)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from baseboostdepth_tpu.training.step import StepStatic, init_state, make_train_step

    root, split = kitti_tree
    index = kitti.KittiRawIndex(root, split)
    stage = stage_for_epoch(14, trimin=True)
    loader = KittiTrainLoader(
        index, stage, batch_size=2, height=64, width=160, trimin=True,
        use_stereo=True, num_workers=2, seed=5, use_native=False,
        bucket_fs=(2, 5, 7),
    )
    st = StepStatic(
        zoo="md2", height=64, width=160, F=7, scales=(0,), trimin=True,
        incremental=True, partial=True, decomp=True,
    )
    opt = optax.adam(1e-4)
    state = init_state(st, opt, jax.random.PRNGKey(0))
    fns = {}
    classes_run = set()
    for batch in loader:
        F_c = (batch["frames"].shape[1] - 2) // 2
        st_c = st if F_c == st.F else dataclasses.replace(st, F=F_c)
        if st_c not in fns:
            fns[st_c] = make_train_step(st_c, opt)
        state, metrics = fns[st_c](state, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(F_c))
        assert np.isfinite(float(metrics["loss"]))
        classes_run.add(F_c)
        if len(classes_run) >= 2 and len(fns) >= 2:
            break
    assert len(classes_run) >= 2, classes_run


def test_bucketed_process_slices_partition(kitti_tree):
    """Bucketing composes with multi-host slicing: the union of both
    processes' bucketed batches equals the single-process bucketed run."""
    root, split = kitti_tree
    index = kitti.KittiRawIndex(root, split)
    stage = stage_for_epoch(14, trimin=True)

    def loader(pi, pc):
        return KittiTrainLoader(
            index, stage, batch_size=4, height=48, width=160, trimin=True,
            use_stereo=True, num_workers=2, seed=3, use_native=False,
            bucket_fs=(2, 5, 7), process_index=pi, process_count=pc,
        )

    single = list(loader(0, 1))
    left = list(loader(0, 2))
    right = list(loader(1, 2))
    assert len(single) == len(left) == len(right)
    for full, a, b in zip(single, left, right):
        for k in full:
            np.testing.assert_array_equal(
                np.concatenate([a[k], b[k]], axis=0), full[k], err_msg=k
            )
