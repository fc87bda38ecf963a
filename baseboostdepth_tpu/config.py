"""Configuration tree for the framework.

Replaces the reference's flat ~45-flag argparse namespace (options.py:10-257)
with a typed dataclass tree + CLI overrides (`--optim.batch_size 12` style)
and JSON round-tripping (the reference dumps opt.json at train start,
trainer.py:774-781; `Config.save` / `Config.load` mirror that).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class ModelConfig:
    zoo: str = "md2"  # md2 | monovit | sql | sql_large | cadepth | diffnet
    num_layers: int = 18  # ResNet depth for md2 (reference --num_layers)
    weights_init: str = "scratch"  # "pretrained" needs a torch ckpt to import
    pretrained_path: Optional[str] = None  # torchvision/MPViT .pth to import
    dtype: str = "bfloat16"  # conv/attention compute dtype (params, losses,
    # geometry and BN statistics stay float32); set float32 for bit-parity runs
    # performance mode: pose net on downscaled pairs (1.0 = reference
    # behavior; 0.5 cuts the dominant step component ~4x -- a documented
    # divergence, quantify on the synthetic benchmark before using)
    pose_input_scale: float = 1.0
    # main-slot + error-pose warps in ONE warp_all call (one grid matmul
    # batch + one packed-kernel sweep over 2S-1 slots) instead of two
    # back-to-back calls. Loss-AND-grad exact (the warp is slot-independent
    # elementwise work; tests/test_train_step.py). None = auto per zoo:
    # True everywhere merged measured faster (md2 61.6 vs 56.26 imgs/s,
    # docs/results/bench_worst[_nomerged]_r5.json) EXCEPT cadepth, where
    # the same-session A/B shows the two-call schedule wins (40.9 vs 36.53,
    # docs/results/bench_cadepth[_nomerged]_r5.json -- its SPM/DEM decoder
    # shifts the warp/compute ratio). True/False force either schedule.
    merged_warp: Optional[bool] = None
    # phase-domain scale-0 decoder tail (ops/phase_tail.py): both scale-0
    # convs run at half resolution with 4x channels; the 2x-upsampled
    # tensor is never materialized. Exact to fp32 rounding (grads too,
    # tests/test_phase_tail.py). None = auto per zoo: enabled where the
    # in-step win is measured (md2 62.46 vs 61.6 imgs/s at F=7,
    # docs/results/bench_worst_phasetail_r5.json); measured REGRESSIONS
    # keep it off for diffnet (44.12 vs 45.22) and monovit (43.79 vs
    # 44.64), docs/results/bench_{diffnet,monovit}_phasetail_r5f.json.
    # BBD_PHASE_TAIL env var overrides everything (A/B knob).
    phase_tail: Optional[bool] = None

    # measured per-zoo auto defaults (ledger discipline: flips require an
    # in-step A/B in docs/results/)
    def resolved_merged_warp(self) -> bool:
        if self.merged_warp is not None:
            return bool(self.merged_warp)
        return self.zoo != "cadepth"

    def resolved_phase_tail(self) -> bool:
        if self.phase_tail is not None:
            return bool(self.phase_tail)
        return self.zoo == "md2"


@dataclass
class MethodConfig:
    """The BaseBoostDepth method toggles; defaults reproduce the full paper
    method (reference run.sh: --rand --trimin --incremental_skip
    --partial_skip --decomp)."""

    curriculum: bool = True  # reference --rand
    trimin: bool = True  # tri-minimization across neighboring baselines
    incremental: bool = True  # chained step poses (--incremental_skip)
    partial: bool = True  # partial pose (translation) replacement
    decomp: bool = True  # error-induced reconstructions (--decomp)
    pose_error: float = 5.5  # error-pose translation divisor (run.sh:22)
    use_stereo: bool = True
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    min_depth: float = 0.1
    max_depth: float = 100.0
    disparity_smoothness: float = 1e-3
    no_ssim: bool = False
    frame_ids: Tuple[int, ...] = (0, -1, 1)  # classic mode (curriculum=False)
    # cold-start disparity-head bias (sigmoid logit; None = reference
    # zero-bias init). -2.2 starts depth ~5 m and avoids the
    # constant-depth plateau (see training/step.py init_disp_bias)
    disp_init_bias: Optional[float] = None
    # curriculum schedule (reference mono_dataset.py:61-66):
    #   epoch < switch: F = 2 (trimin) / 1, cutoff = 0.1 + 0.04 * epoch
    #   epoch >= switch: F = 7 (trimin) / 5, cutoff = 0.15 * epoch - 0.9
    curriculum_switch_epoch: int = 10


@dataclass
class DataConfig:
    kt_path: str = "kitti_data"
    syns_path: str = "syns_data"
    split: str = "eigen_zhou"
    splits_dir: str = "splits"  # directory containing split txt files
    height: int = 192
    width: int = 640
    png: bool = False
    num_workers: int = 8
    prefetch: int = 2
    # frame-budget bucketing: batch samples by curriculum window class so
    # narrow-window samples run a cheaper jit specialization instead of
    # padding to the stage budget. Default ON (measured ~+20% realistic-mix
    # throughput, loss-identical per-sample plans -- tests/test_bucketing.py;
    # the reference analogue is that it only ever computes real pairs,
    # trainer.py:348-418). () = off (pad every sample to the stage budget).
    # Changes batch composition (and thus BN batch stats), not per-sample
    # plans -- see data/loader.py docstring.
    bucket_fs: Tuple[int, ...] = (2, 5, 7)


@dataclass
class OptimConfig:
    batch_size: int = 12
    learning_rate: float = 1e-4
    num_epochs: int = 20
    lr_milestones: Tuple[int, ...] = (11, 13, 15, 16, 17, 18, 19)
    lr_gamma: float = 0.4
    vit_encoder_lr: float = 5e-5  # MonoViT two-group AdamW (trainer.py:106-109)


@dataclass
class DistConfig:
    """Multi-host (multi-process) data parallelism.

    The reference has no distributed backend at all (SURVEY.md section 2.10:
    single GPU, trainer.py:43); this is its TPU-native replacement. With
    enabled=True, cli/train.py calls jax.distributed.initialize() before any
    JAX use, the data mesh spans the global device set (DCN between hosts,
    ICI within), each host loads its own batch_size/process_count slice of
    every global batch, and shard_batch assembles the global array from
    process-local data. Leave coordinator/num_processes/process_id as None
    on TPU pods -- JAX auto-detects from the TPU metadata; set all three
    explicitly for CPU/GPU clusters or tests.
    """

    enabled: bool = False
    coordinator: Optional[str] = None  # "host:port" of process 0
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


@dataclass
class LogConfig:
    log_dir: str = "logs"
    model_name: str = "bbd_tpu"
    log_frequency: int = 250  # batches between val+checkpoint (trainer.py:266)
    save_frequency: int = 1  # epochs between checkpoints
    wandb: bool = False  # optional; console/JSONL writer is the default
    # quick-val subsample size for the periodic in-epoch validation; 0 = the
    # reference behavior (ALL 4,424 val images every log_frequency batches,
    # trainer.py:623-633). A full val still runs at every epoch end.
    quick_val_size: int = 0
    image_panels: bool = True  # per-val target/disp/warp/automask PNG grids
    # SYNS edge-accuracy online validation (reference trainer.py:646-663,
    # gated by its --SYNS_edge flag); needs syns_path + SYNS split GT
    syns_val: bool = False


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    method: MethodConfig = field(default_factory=MethodConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    log: LogConfig = field(default_factory=LogConfig)
    dist: DistConfig = field(default_factory=DistConfig)
    seed: int = 42

    # ------------------------------------------------------------------ io
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(tcls, sub):
            kw = {}
            for f_ in dataclasses.fields(tcls):
                if f_.name in sub:
                    v = sub[f_.name]
                    if isinstance(v, list):
                        v = tuple(v)
                    kw[f_.name] = v
            return tcls(**kw)

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            method=build(MethodConfig, d.get("method", {})),
            data=build(DataConfig, d.get("data", {})),
            optim=build(OptimConfig, d.get("optim", {})),
            log=build(LogConfig, d.get("log", {})),
            dist=build(DistConfig, d.get("dist", {})),
            seed=d.get("seed", 42),
        )

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    # ----------------------------------------------------------------- cli
    @classmethod
    def from_args(cls, argv: Optional[List[str]] = None) -> "Config":
        """Parse `--section.field value` overrides over the defaults.

        Booleans accept true/false; tuples accept comma-separated values.
        `--config path.json` loads a base config first.
        """
        parser = argparse.ArgumentParser(description="BaseBoostDepth-TPU")
        parser.add_argument("--config", type=str, default=None)
        ns, rest = parser.parse_known_args(argv)
        cfg = cls.load(ns.config) if ns.config else cls()

        it = iter(rest)
        for tok in it:
            if not tok.startswith("--"):
                raise SystemExit(f"unexpected argument: {tok}")
            key = tok[2:]
            try:
                val = next(it)
            except StopIteration:
                raise SystemExit(f"missing value for --{key}")
            if key == "seed":
                cfg.seed = int(val)
                continue
            if "." not in key:
                raise SystemExit(f"expected --section.field, got --{key}")
            sec_name, f_name = key.split(".", 1)
            sec = getattr(cfg, sec_name, None)
            if sec is None or not hasattr(sec, f_name):
                raise SystemExit(f"unknown config field: {key}")
            cur = getattr(sec, f_name)
            setattr(sec, f_name, _coerce(val, cur))
        return cfg


def _coerce(val: str, current):
    if isinstance(current, bool):
        return val.lower() in ("1", "true", "yes", "on")
    if isinstance(current, tuple):
        elems = [e for e in val.split(",") if e]
        elem_t = type(current[0]) if current else int
        return tuple(elem_t(e) for e in elems)
    if isinstance(current, int) and not isinstance(current, bool):
        return int(val)
    if isinstance(current, float):
        return float(val)
    if current is None:
        # Optional[...] field with no current value to infer from: accept
        # none/null, then numbers narrowest-first, then the raw string
        # (e.g. --method.disp_init_bias -2.2 must parse as a float)
        if val.lower() in ("none", "null"):
            return None
        if val.lower() in ("true", "false", "yes", "no", "on", "off"):
            # Optional[bool] fields (e.g. --model.merged_warp false)
            return val.lower() in ("true", "yes", "on")
        for typ in (int, float):
            try:
                return typ(val)
            except ValueError:
                pass
        return val
    return val
