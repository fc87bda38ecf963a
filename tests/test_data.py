"""Data layer tests: curriculum schedule parity, loader over a synthetic
KITTI-layout fixture, batch contract."""

import os

import numpy as np
import pytest
from PIL import Image

from baseboostdepth_tpu.data import kitti
from baseboostdepth_tpu.data.curriculum import sample_f_max, stage_for_epoch
from baseboostdepth_tpu.data.loader import KittiTrainLoader
from baseboostdepth_tpu.training.batch import num_frames


class TestCurriculum:
    def test_stage_schedule_matches_reference(self):
        """mono_dataset.py:61-66 + trainer.py:208-212, 346."""
        for epoch in range(20):
            st = stage_for_epoch(epoch, trimin=True)
            if epoch < 10:
                assert st.F == 2
                assert st.cutoff == pytest.approx(0.1 + 0.04 * epoch)
                assert st.scales == (0, 1, 2, 3)
                assert not st.incremental_active
            else:
                assert st.F == 7
                assert st.cutoff == pytest.approx(0.15 * epoch - 0.9)
                assert st.scales == (0,)
                assert st.incremental_active
        st = stage_for_epoch(3, trimin=False)
        assert st.F == 1
        st = stage_for_epoch(15, trimin=False)
        assert st.F == 5

    def test_sample_f_max_cutoff(self):
        rng = np.random.default_rng(0)
        stage = stage_for_epoch(15, trimin=True)  # cutoff = 1.35, F = 7
        # tiny baseline -> full window (bounded by the random shrink)
        fs = [sample_f_max(0.01, stage, np.random.default_rng(i)) for i in range(200)]
        assert max(fs) == 7
        assert min(fs) >= 1
        # the 30% shrink: some draws land below 7
        assert any(f < 7 for f in fs)
        # large baseline -> f = floor(cutoff / baseline)
        f = sample_f_max(0.4, stage, rng)
        assert f <= 3
        # huge baseline -> stereo-only
        assert sample_f_max(5.0, stage, np.random.default_rng(1)) == 0

    def test_existence_limits(self):
        stage = stage_for_epoch(15, trimin=True)
        # sequence boundary: only +-2 exist
        f = sample_f_max(
            0.01, stage, np.random.default_rng(2), exists=lambda o: abs(o) <= 2
        )
        assert f <= 2


@pytest.fixture(scope="module")
def kitti_fixture(tmp_path_factory):
    """Tiny KITTI-raw layout: 1 drive, 12 frames, both sides, 32x96 jpgs."""
    root = tmp_path_factory.mktemp("kitti")
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    rng = np.random.default_rng(0)
    for cam in (2, 3):
        d = root / folder / f"image_0{cam}" / "data"
        d.mkdir(parents=True)
        for i in range(12):
            arr = rng.integers(0, 255, (64, 200, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i:010d}.jpg")
    split = root / "split.txt"
    lines = [f"{folder} {i} l kt 0.05" for i in range(3, 9)]
    split.write_text("\n".join(lines) + "\n")
    return str(root), str(split)


class TestKittiLoader:
    @pytest.mark.parametrize("use_native", [False, True])
    def test_batch_contract(self, kitti_fixture, use_native):
        from baseboostdepth_tpu.native import native_available

        if use_native and not native_available():
            pytest.skip("native loader not built")
        root, split = kitti_fixture
        index = kitti.KittiRawIndex(root, split)
        assert len(index) == 6
        stage = stage_for_epoch(12, trimin=True)  # F=7, incremental
        H, W, B = 32, 96, 3
        loader = KittiTrainLoader(
            index, stage, batch_size=B, height=H, width=W, trimin=True,
            num_workers=2, seed=0, use_native=use_native,
        )
        batches = list(loader)
        assert len(batches) == 2
        NF = num_frames(stage.F)
        for b in batches:
            assert b["frames"].shape == (B, NF, H, W, 3)
            assert b["frames"].dtype == np.uint8
            assert b["slot_offset"].shape == (B, 6)
            assert b["slot_valid"].shape == (B, 7)
            assert b["K"].shape == (B, 4, 4)
            # every sample has at least one valid candidate
            assert b["slot_valid"].any(axis=1).all()
            # out-of-window frames replicate frame 0
            for i in range(B):
                fmax = int(np.abs(b["slot_offset"][i]).max(initial=0))
                if fmax < stage.F:
                    np.testing.assert_array_equal(
                        b["frames"][i, stage.F + stage.F],  # offset +F
                        b["frames"][i, stage.F],
                    )
            # stereo_T x-translation is +-0.1
            assert np.all(np.abs(np.abs(b["stereo_T"][:, 0, 3]) - 0.1) < 1e-6)

    def test_intrinsics_scaling(self):
        K, iK = kitti.intrinsics(640, 192)
        assert K[0, 0] == pytest.approx(0.58 * 640)
        assert K[1, 1] == pytest.approx(1.92 * 192)
        np.testing.assert_allclose(K @ iK, np.eye(4), atol=1e-5)
