"""Config tree: CLI overrides, JSON round-trip, coercion."""

import pytest

from baseboostdepth_tpu.config import Config


def test_defaults_match_reference_recipe():
    cfg = Config()
    assert cfg.optim.batch_size == 12
    assert cfg.optim.learning_rate == 1e-4
    assert cfg.optim.num_epochs == 20
    assert cfg.optim.lr_milestones == (11, 13, 15, 16, 17, 18, 19)
    assert cfg.optim.lr_gamma == 0.4
    assert cfg.method.pose_error == 5.5
    assert cfg.data.height == 192 and cfg.data.width == 640
    # full paper method on by default (run.sh)
    assert cfg.method.curriculum and cfg.method.trimin
    assert cfg.method.incremental and cfg.method.partial and cfg.method.decomp


def test_cli_overrides():
    cfg = Config.from_args([
        "--optim.batch_size", "8",
        "--method.trimin", "false",
        "--method.scales", "0,1",
        "--model.zoo", "monovit",
        "--seed", "7",
    ])
    assert cfg.optim.batch_size == 8
    assert cfg.method.trimin is False
    assert cfg.method.scales == (0, 1)
    assert cfg.model.zoo == "monovit"
    assert cfg.seed == 7


def test_unknown_field_rejected():
    with pytest.raises(SystemExit):
        Config.from_args(["--optim.nope", "1"])


def test_json_roundtrip(tmp_path):
    cfg = Config.from_args(["--data.height", "96", "--log.model_name", "x"])
    p = tmp_path / "c.json"
    cfg.save(str(p))
    cfg2 = Config.load(str(p))
    assert cfg2.data.height == 96
    assert cfg2.log.model_name == "x"
    assert cfg2.method.scales == cfg.method.scales


def test_perf_auto_defaults_per_zoo():
    """merged_warp/phase_tail default to the measured per-zoo policy
    (docs/results/bench_*_r5.json) and explicit values override it."""
    cfg = Config()
    assert cfg.model.merged_warp is None and cfg.model.phase_tail is None
    assert cfg.model.resolved_merged_warp() is True  # md2
    assert cfg.model.resolved_phase_tail() is True  # md2: measured win
    cad = Config.from_args(["--model.zoo", "cadepth"])
    assert cad.model.resolved_merged_warp() is False  # measured regression
    assert cad.model.resolved_phase_tail() is False  # unmeasured -> off
    for zoo in ("monovit", "sql", "diffnet"):
        c = Config.from_args(["--model.zoo", zoo])
        assert c.model.resolved_merged_warp() is True
        assert c.model.resolved_phase_tail() is False

    # CLI force in both directions (Optional[bool] coercion)
    forced = Config.from_args(["--model.zoo", "cadepth",
                               "--model.merged_warp", "true",
                               "--model.phase_tail", "true"])
    assert forced.model.resolved_merged_warp() is True
    assert forced.model.resolved_phase_tail() is True
    off = Config.from_args(["--model.merged_warp", "false",
                            "--model.phase_tail", "off"])
    assert off.model.resolved_merged_warp() is False
    assert off.model.resolved_phase_tail() is False
    auto = Config.from_args(["--model.merged_warp", "none"])
    assert auto.model.merged_warp is None


def test_config_file_plus_override(tmp_path):
    p = tmp_path / "c.json"
    Config.from_args(["--optim.batch_size", "4"]).save(str(p))
    cfg = Config.from_args(["--config", str(p), "--optim.num_epochs", "2"])
    assert cfg.optim.batch_size == 4
    assert cfg.optim.num_epochs == 2
