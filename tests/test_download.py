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


def test_reference_table_complete():
    # the reference's 9-row public table (utils.py:50-79)
    assert len(MODEL_URLS) == 9
    for url, md5 in MODEL_URLS.values():
        assert url.startswith("https://") and len(md5) == 32
