"""CLI smoke tests: infer and evaluate_depth --ext_disp_to_eval run end to
end from a saved checkpoint / saved disparities."""

import os

import numpy as np
import jax
import pytest
from PIL import Image

from baseboostdepth_tpu.config import Config
from baseboostdepth_tpu.training.checkpoint import CheckpointManager
from baseboostdepth_tpu.training.optim import make_optimizer
from baseboostdepth_tpu.training.step import StepStatic, init_state

H, W = 32, 64


@pytest.fixture(scope="module")
def saved_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    st = StepStatic(zoo="md2", height=H, width=W, dtype="float32")
    state = init_state(st, make_optimizer(), jax.random.PRNGKey(0))
    ckpt_dir = str(root / "ckpt")
    CheckpointManager(ckpt_dir).save(1, jax.device_get(state))
    cfg = Config()
    cfg.data.height = H
    cfg.data.width = W
    cfg.model.dtype = "float32"
    cfg_path = str(root / "config.json")
    cfg.save(cfg_path)
    return str(root), cfg_path, ckpt_dir


def test_infer_cli(saved_checkpoint, tmp_path):
    from baseboostdepth_tpu.cli.infer import main

    root, cfg_path, ckpt = saved_checkpoint
    rng = np.random.default_rng(0)
    img = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 255, (48, 96, 3), dtype=np.uint8)).save(img)

    out = tmp_path / "out"
    main(["--config", cfg_path, "--checkpoint", ckpt,
          "--image_path", str(img), "--out_dir", str(out)])
    assert (out / "img_disp.jpeg").exists()
    disp = np.load(out / "img_disp.npy")
    assert disp.shape == (H, W)


def test_visualize_absrel_overlay(saved_checkpoint, tmp_path, monkeypatch):
    """visualize stitches a comparison video and, given GT depths, stamps a
    per-frame abs_rel on each model panel (reference validation.py:179,
    269-273)."""
    cv2 = pytest.importorskip("cv2")
    from baseboostdepth_tpu.cli import visualize

    root, cfg_path, ckpt = saved_checkpoint
    rng = np.random.default_rng(3)
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    n = 2
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (48, 96, 3), dtype=np.uint8)
        ).save(img_dir / f"{i:06d}.jpg")

    yy = np.linspace(2, 50, 40)[:, None] * np.ones((1, 120))
    gt = np.empty(n, dtype=object)
    for i in range(n):
        gt[i] = yy.astype(np.float32)
    gt_npz = tmp_path / "gt_depths.npz"
    np.savez_compressed(gt_npz, data=gt)

    labels = []
    orig_put_text = cv2.putText

    def record(img, text, *a, **k):
        labels.append(text)
        return orig_put_text(img, text, *a, **k)

    monkeypatch.setattr(cv2, "putText", record)

    out = tmp_path / "cmp.avi"
    visualize.main([
        "--image_dir", str(img_dir), "--out", str(out),
        "--model", f"{cfg_path}:{ckpt}", "--gt_npz", str(gt_npz),
    ])
    assert out.exists() and out.stat().st_size > 0
    assert len(labels) == n
    assert all("abs_rel=" in t for t in labels)
    # the stamped value is a finite number
    v = float(labels[0].rsplit("=", 1)[1])
    assert np.isfinite(v) and v >= 0


def test_evaluate_depth_ext_disp(saved_checkpoint, tmp_path, capsys):
    from baseboostdepth_tpu.cli.evaluate_depth import main

    root, cfg_path, ckpt = saved_checkpoint
    # synthetic gt + matching disparities
    splits = tmp_path / "splits" / "eigen"
    splits.mkdir(parents=True)
    n = 3
    yy = np.linspace(2, 50, 40)[:, None] * np.ones((1, 120))
    gt = np.empty(n, dtype=object)
    for i in range(n):
        gt[i] = yy.astype(np.float32)
    np.savez_compressed(splits / "gt_depths.npz", data=gt)
    disps = (1.0 / yy[None].repeat(n, 0) * 2.0).astype(np.float32)
    dp = tmp_path / "disps.npy"
    np.save(dp, disps)

    cfg = Config.load(cfg_path)
    cfg.data.splits_dir = str(tmp_path / "splits")
    cfg2 = tmp_path / "cfg2.json"
    cfg.save(str(cfg2))

    main(["--config", str(cfg2), "--checkpoint", ckpt,
          "--split", "eigen", "--ext_disp_to_eval", str(dp)])
    outp = capsys.readouterr().out
    assert "abs_rel" in outp


def _parse_metric_lines(text):
    """Parse the `name: value` lines both eval paths print."""
    out = {}
    for ln in text.splitlines():
        if ":" in ln and not ln.startswith(" "):
            k, _, v = ln.partition(":")
            try:
                out[k.strip()] = float(v)
            except ValueError:
                pass
    return out


def test_ext_disp_reproduces_live_eval(saved_checkpoint, tmp_path, capsys):
    """--ext_disp_to_eval on a --save_pred_disps file must reproduce the
    live model eval bit-for-bit (reference evaluate_depth.py scores saved
    .npy stacks through the same metric loop, options.py:225-232)."""
    from baseboostdepth_tpu.cli.evaluate_depth import main

    root, cfg_path, ckpt = saved_checkpoint
    rng = np.random.default_rng(7)
    kt = tmp_path / "kitti"
    folder = "2011_09_26/2011_09_26_drive_0001_sync"
    d = kt / folder / "image_02" / "data"
    d.mkdir(parents=True)
    n = 3
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (40, 120, 3), dtype=np.uint8)
        ).save(d / f"{i:010d}.jpg")
    splits = tmp_path / "splits" / "eigen"
    splits.mkdir(parents=True)
    splits.joinpath("test_files.txt").write_text(
        "\n".join(f"{folder} {i} l" for i in range(n)) + "\n"
    )
    yy = np.linspace(2, 50, 40)[:, None] * np.ones((1, 120))
    gt = np.empty(n, dtype=object)
    for i in range(n):
        gt[i] = yy.astype(np.float32)
    np.savez_compressed(splits / "gt_depths.npz", data=gt)

    cfg = Config.load(cfg_path)
    cfg.data.kt_path = str(kt)
    cfg.data.splits_dir = str(tmp_path / "splits")
    cfg2 = tmp_path / "cfg2.json"
    cfg.save(str(cfg2))

    dp = tmp_path / "pred_disps.npy"
    main(["--config", str(cfg2), "--checkpoint", ckpt, "--split", "eigen",
          "--save_pred_disps", str(dp)])
    live = _parse_metric_lines(capsys.readouterr().out)

    main(["--config", str(cfg2), "--checkpoint", ckpt, "--split", "eigen",
          "--ext_disp_to_eval", str(dp)])
    ext = _parse_metric_lines(capsys.readouterr().out)

    assert live and ext
    for k, v in live.items():
        assert ext[k] == pytest.approx(v, abs=5e-5), (k, v, ext[k])
