"""Pretrained-model fetcher: checksum/unzip/no-op logic over a local
file:// fixture (no network; reference utils.py:46-109 behavior)."""

import hashlib
import os
import zipfile

import pytest

from baseboostdepth_tpu.utils.download import (
    MODEL_URLS,
    download_model_if_doesnt_exist,
)


@pytest.fixture()
def zip_fixture(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "encoder.pth").write_bytes(b"fake-encoder")
    (src / "depth.pth").write_bytes(b"fake-depth")
    zpath = tmp_path / "weights.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in src.iterdir():
            zf.write(f, f.name)
    md5 = hashlib.md5(zpath.read_bytes()).hexdigest()
    return str(zpath), md5, str(tmp_path / "models")


def test_fetch_verify_unpack(zip_fixture):
    zpath, md5, models_dir = zip_fixture
    folder = download_model_if_doesnt_exist(
        "myweights", models_dir, url=f"file://{zpath}", md5=md5
    )
    assert os.path.exists(os.path.join(folder, "encoder.pth"))
    # second call is a no-op (reference utils.py:85)
    assert download_model_if_doesnt_exist(
        "myweights", models_dir, url="http://invalid.invalid/x.zip", md5=md5
    ) == folder


def test_checksum_mismatch_raises(zip_fixture):
    zpath, _, models_dir = zip_fixture
    with pytest.raises(RuntimeError, match="checksum"):
        download_model_if_doesnt_exist(
            "bad", models_dir, url=f"file://{zpath}", md5="0" * 32
        )


def test_unknown_name_raises(tmp_path):
    with pytest.raises(KeyError, match="unknown model"):
        download_model_if_doesnt_exist("nope", str(tmp_path))


def test_existing_zip_without_md5_not_refetched(zip_fixture):
    """Explicit url + no md5: an already-present zip is trusted, not
    re-downloaded (the url here is unreachable, so a fetch would raise)."""
    zpath, _, models_dir = zip_fixture
    os.makedirs(models_dir, exist_ok=True)
    import shutil

    shutil.copy(zpath, os.path.join(models_dir, "trusted.zip"))
    folder = download_model_if_doesnt_exist(
        "trusted", models_dir, url="http://invalid.invalid/x.zip", md5=None
    )
    assert os.path.exists(os.path.join(folder, "encoder.pth"))


class TestTorchvisionFetch:
    """fetch_torchvision_resnet over a file:// fixture (no network)."""

    def _fixture(self, tmp_path, content=b"imagenet-weights"):
        import hashlib as _h

        from baseboostdepth_tpu.utils import download as dl

        prefix = _h.sha256(content).hexdigest()[:8]
        src = tmp_path / f"resnet18-{prefix}.pth"
        src.write_bytes(content)
        return dl, {18: f"file://{src}"}, str(tmp_path / "models")

    def test_fetch_verify_and_noop(self, tmp_path, monkeypatch):
        dl, table, models_dir = self._fixture(tmp_path)
        monkeypatch.setattr(dl, "TORCHVISION_RESNETS", table)
        path = dl.fetch_torchvision_resnet(18, models_dir)
        assert os.path.exists(path)
        # second call verifies the local copy without re-fetching
        monkeypatch.setattr(dl, "TORCHVISION_RESNETS",
                            {18: "http://invalid.invalid/resnet18-" + os.path.basename(path).split("-")[1]})
        assert dl.fetch_torchvision_resnet(18, models_dir) == path

    def test_checksum_mismatch_raises(self, tmp_path, monkeypatch):
        from baseboostdepth_tpu.utils import download as dl

        src = tmp_path / "resnet18-00000000.pth"
        src.write_bytes(b"corrupt")
        monkeypatch.setattr(dl, "TORCHVISION_RESNETS", {18: f"file://{src}"})
        with pytest.raises(RuntimeError, match="checksum"):
            dl.fetch_torchvision_resnet(18, str(tmp_path / "models"))

    def test_table_covers_reference_depths(self):
        # networks/resnet_encoder.py:59-64 supports 18/34/50/101/152
        from baseboostdepth_tpu.utils.download import TORCHVISION_RESNETS

        assert sorted(TORCHVISION_RESNETS) == [18, 34, 50, 101, 152]


def test_reference_table_complete():
    # the reference's 9-row public table (utils.py:50-79)
    assert len(MODEL_URLS) == 9
    for url, md5 in MODEL_URLS.values():
        assert url.startswith("https://") and len(md5) == 32
