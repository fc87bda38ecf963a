"""Trainer orchestration: epochs, curriculum stages, validation,
checkpointing, logging.

Role parity with the reference Trainer (trainer.py:29-284) minus everything
that moved into compiled code: the curriculum advances by swapping the
epoch's Stage/StepStatic (two jit specializations per run) and loader, not
by rebuilding python graphs per batch. Online validation runs the eigen_zhou
val split against precomputed GT every log_frequency batches and tracks best
abs_rel (trainer.py:623-665).
"""

from __future__ import annotations

import dataclasses
import json
import os
import signal
import time
from typing import Dict, Optional

import jax
import numpy as np

from baseboostdepth_tpu.config import Config
from baseboostdepth_tpu.data import kitti
from baseboostdepth_tpu.data.curriculum import Stage, stage_for_epoch
from baseboostdepth_tpu.data.loader import EvalLoader, KittiTrainLoader
from baseboostdepth_tpu.evaluation.metrics import METRIC_NAMES, single_image_errors
from baseboostdepth_tpu.parallel import data_mesh, replicate, shard_batch
from baseboostdepth_tpu.training.checkpoint import CheckpointManager
from baseboostdepth_tpu.training.optim import make_optimizer
from baseboostdepth_tpu.training.step import (
    StepStatic,
    init_state,
    make_debug_forward,
    make_eval_forward,
    make_train_step,
)
from baseboostdepth_tpu.utils import sec_to_hm_str


class MetricLogger:
    """Console + JSONL metric writer (pluggable; wandb optional).

    Replaces the reference's hard wandb dependency (trainer.py:34-36,
    678-772) with a local JSONL stream any dashboard can tail.
    """

    def __init__(self, log_dir: str, use_wandb: bool = False, config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project="baseboostdepth_tpu", config=config)
                self._wandb = wandb
            except Exception as e:  # wandb genuinely optional
                print(f"[log] wandb unavailable ({e}); continuing with JSONL")

    def log(self, step: int, payload: Dict[str, float]):
        rec = {"step": int(step), "t": time.time(), **{k: float(v) for k, v in payload.items()}}
        if not self._f.closed:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._wandb is not None:
            self._wandb.log(payload, step=step)

    def close(self):
        self._f.close()


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.log_path = os.path.join(cfg.log.log_dir, cfg.log.model_name)
        os.makedirs(self.log_path, exist_ok=True)
        cfg.save(os.path.join(self.log_path, "config.json"))

        # perf defaults resolved per zoo from measurements (config.py);
        # phase_tail is a trace-time gate, so it must be set before any
        # step/eval fn is traced
        from baseboostdepth_tpu.models.depth_decoder import set_phase_tail

        set_phase_tail(cfg.model.resolved_phase_tail())

        assert cfg.data.height % 32 == 0 and cfg.data.width % 32 == 0, \
            "height/width must be multiples of 32"
        # the reference's curriculum path always adds the stereo frame for
        # narrow windows (mono_dataset.py:91-92,107-108) -- without stereo,
        # stereo-only samples would have no loss candidate at all
        assert cfg.method.use_stereo or not cfg.method.curriculum, \
            "curriculum training requires use_stereo (as in the reference)"

        from baseboostdepth_tpu.utils import resolve_splits_dir

        split_dir = os.path.join(resolve_splits_dir(cfg.data.splits_dir), cfg.data.split)
        train_file = os.path.join(split_dir, "train_files_baselines.txt")
        if not os.path.exists(train_file):
            train_file = os.path.join(split_dir, "train_files.txt")
        self.train_index = kitti.KittiRawIndex(
            cfg.data.kt_path, train_file, ".png" if cfg.data.png else ".jpg"
        )
        self.steps_per_epoch = len(self.train_index) // cfg.optim.batch_size

        # online validation assets (optional: only if GT has been exported)
        self.val_paths = []
        self.gt_depths = None
        val_file = os.path.join(split_dir, "val_files.txt")
        gt_file = os.path.join(split_dir, "gt_depths.npz")
        if os.path.exists(val_file) and os.path.exists(gt_file):
            val_index = kitti.KittiRawIndex(cfg.data.kt_path, val_file, ".jpg")
            self.val_paths = [
                val_index.image_path(s.folder, s.frame_index, s.side)
                for s in val_index.samples
            ]
            self.gt_depths = np.load(
                gt_file, fix_imports=True, encoding="latin1", allow_pickle=True
            )["data"]

        self.mesh = data_mesh()
        n_dev = self.mesh.devices.size
        assert cfg.optim.batch_size % n_dev == 0, (
            f"batch_size {cfg.optim.batch_size} must divide over {n_dev} devices"
        )
        # multi-host: this process loads and logs only its share (the
        # reference has no distributed path to mirror; SURVEY.md section 2.10)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        self.is_lead = self.process_index == 0
        assert cfg.optim.batch_size % max(self.process_count, 1) == 0

        self.optimizer = make_optimizer(
            cfg.optim.learning_rate,
            cfg.optim.lr_milestones,
            cfg.optim.lr_gamma,
            self.steps_per_epoch,
            vit=(cfg.model.zoo == "monovit"),
            vit_encoder_lr=cfg.optim.vit_encoder_lr,
        )

        st0 = self._static_for_stage(stage_for_epoch(0, cfg.method.trimin))
        self.state = init_state(st0, self.optimizer, jax.random.PRNGKey(cfg.seed))
        if cfg.method.disp_init_bias is not None:
            from baseboostdepth_tpu.training.step import init_disp_bias

            self.state = self.state.replace(
                params=dict(
                    self.state.params,
                    depth=init_disp_bias(self.state.params["depth"], cfg.method.disp_init_bias),
                )
            )
        if cfg.model.weights_init == "pretrained":
            from baseboostdepth_tpu.models.torch_import import load_pretrained_encoder

            # Resolve depth-encoder weights: an explicit --model.pretrained_path,
            # else auto-fetch the torchvision ImageNet ResNet like the
            # reference does implicitly (networks/resnet_encoder.py:46-53).
            depth_layers = {"md2": cfg.model.num_layers, "sql": 50, "sql_large": 50, "cadepth": 50}
            depth_path = cfg.model.pretrained_path
            pose_path = None
            if depth_path is None:
                from baseboostdepth_tpu.utils.download import fetch_torchvision_resnet

                if cfg.model.zoo not in depth_layers:
                    raise SystemExit(
                        f"--model.weights_init pretrained for zoo {cfg.model.zoo!r} "
                        "needs --model.pretrained_path (mpvit_small.pth / hrnet18 "
                        "ImageNet weights have no stable public URL; see "
                        "utils/download.py)"
                    )
                depth_path = fetch_torchvision_resnet(depth_layers[cfg.model.zoo])
            if depth_layers.get(cfg.model.zoo, 0) != 18:
                from baseboostdepth_tpu.utils.download import fetch_torchvision_resnet

                pose_path = fetch_torchvision_resnet(18)  # pose pair is always RN18
            self.state = load_pretrained_encoder(
                self.state, depth_path, cfg.model.zoo, pose_path=pose_path
            )
        self.state = replicate(self.state, self.mesh)

        self.ckpt = CheckpointManager(os.path.join(self.log_path, "checkpoints"))
        self.start_epoch = 0
        self.start_batch = 0
        self.best_abs_rel = 10.0
        latest = self.ckpt.latest_step()
        if jax.process_count() > 1:
            # Checkpoints are written by the lead process only, but every
            # process restores via its own latest_step(). On a non-shared
            # checkpoint filesystem the non-lead hosts would silently resume
            # at epoch 0 while the lead skips mid-epoch, desyncing loader
            # streams and hanging collectives -- fail loudly instead.
            from jax.experimental import multihost_utils

            lead_latest = int(
                multihost_utils.broadcast_one_to_all(
                    np.int64(-1 if latest is None else latest)
                )
            )
            mine = -1 if latest is None else int(latest)
            if mine != lead_latest:
                raise RuntimeError(
                    f"process {jax.process_index()} sees checkpoint step "
                    f"{mine} but the lead sees {lead_latest}: the checkpoint "
                    f"dir ({self.ckpt.directory}) must be on a filesystem "
                    "shared by all hosts"
                )
        if latest is not None:
            self.state, extra = self.ckpt.restore(self.state, latest)
            extra = extra or {}
            # resume position comes from checkpoint metadata, not from
            # latest // steps_per_epoch: best-abs_rel checkpoints land
            # mid-epoch, and --data.bucket_fs drops per-class leftovers so
            # realized steps/epoch < steps_per_epoch (the reference replays
            # epoch + scheduler from its folder name, trainer.py:168-186;
            # here the optimizer schedule rides the restored state.step)
            if "epoch" in extra:
                if extra.get("epoch_complete"):
                    self.start_epoch = int(extra["epoch"]) + 1
                else:
                    self.start_epoch = int(extra["epoch"])
                    self.start_batch = int(extra.get("batch_in_epoch", -1)) + 1
            else:  # legacy checkpoints without position metadata
                self.start_epoch = int(latest // max(1, self.steps_per_epoch))
            self.best_abs_rel = float(extra.get("best_abs_rel", 10.0))
            print(
                f"resumed from step {latest} (epoch {self.start_epoch}, "
                f"batch {self.start_batch}, best_abs_rel {self.best_abs_rel:.4f})"
            )

        self._step_fns: Dict[StepStatic, object] = {}
        self._eval_fns: Dict[str, object] = {}
        self.logger = MetricLogger(self.log_path, cfg.log.wandb, cfg.to_dict())
        # per-step device RNG is a pure function of (seed, global_step) so a
        # resumed run replays the exact key stream of an uninterrupted one
        self._base_key = jax.random.PRNGKey(cfg.seed)

    # ------------------------------------------------------------------
    def _static_for_stage(self, stage: Stage) -> StepStatic:
        m, cfg = self.cfg.method, self.cfg
        sql = cfg.model.zoo in ("sql", "sql_large")
        if not m.curriculum:
            return StepStatic(
                zoo=cfg.model.zoo,
                num_layers=cfg.model.num_layers,
                height=cfg.data.height,
                width=cfg.data.width,
                F=1,
                scales=(0,) if sql else tuple(m.scales),
                trimin=False,
                incremental=False,
                partial=False,
                decomp=False,
                use_ssim=not m.no_ssim,
                min_depth=m.min_depth,
                max_depth=m.max_depth,
                smooth_weight=m.disparity_smoothness,
                dtype=cfg.model.dtype,
                pose_input_scale=cfg.model.pose_input_scale,
                merged_warp=cfg.model.resolved_merged_warp(),
            )
        return StepStatic(
            zoo=cfg.model.zoo,
            num_layers=cfg.model.num_layers,
            height=cfg.data.height,
            width=cfg.data.width,
            F=stage.F,
            scales=tuple(stage.scales),
            trimin=m.trimin,
            incremental=m.incremental and stage.incremental_active,
            partial=m.partial and stage.incremental_active,
            decomp=m.decomp,
            pose_error=m.pose_error,
            use_ssim=not m.no_ssim,
            min_depth=m.min_depth,
            max_depth=m.max_depth,
            smooth_weight=m.disparity_smoothness,
            dtype=cfg.model.dtype,
            pose_input_scale=cfg.model.pose_input_scale,
            merged_warp=cfg.model.resolved_merged_warp(),
        )

    def _step_fn(self, st: StepStatic):
        if st not in self._step_fns:
            mesh = self.mesh if self.mesh.devices.size > 1 else None
            self._step_fns[st] = make_train_step(st, self.optimizer, mesh=mesh)
        return self._step_fns[st]

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        t0 = time.time()
        global_step = int(jax.device_get(self.state.step))

        # failure handling the reference lacks (SURVEY.md section 5): emergency
        # checkpoint on SIGTERM/SIGINT so preempted runs resume cleanly, and a
        # NaN guard that saves state for post-mortem before aborting.
        stop_requested = {"flag": False}

        def _on_signal(signum, frame):
            print(f"signal {signum}: checkpointing and stopping after this step")
            stop_requested["flag"] = True

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:
                pass  # not the main thread
        print(f"training {cfg.log.model_name}: {len(self.train_index)} samples, "
              f"{self.steps_per_epoch} steps/epoch, mesh={self.mesh.devices.size} device(s)")
        for epoch in range(self.start_epoch, cfg.optim.num_epochs):
            stage = stage_for_epoch(
                epoch, cfg.method.trimin, cfg.method.curriculum_switch_epoch,
                sql=cfg.model.zoo in ("sql", "sql_large"),
            )
            st = self._static_for_stage(stage)
            step_fn = self._step_fn(st)
            # frame-budget buckets clipped to this stage (e.g. (2,5,7) ->
            # (2,5,7) late stage, no-op early); only meaningful with the
            # curriculum on
            bucket_fs = None
            if cfg.data.bucket_fs and cfg.method.curriculum:
                bucket_fs = tuple(sorted({min(b, stage.F) for b in cfg.data.bucket_fs}))
                if bucket_fs == (stage.F,):
                    bucket_fs = None
            skip = self.start_batch if epoch == self.start_epoch else 0
            loader = KittiTrainLoader(
                self.train_index,
                stage,
                cfg.optim.batch_size,
                cfg.data.height,
                cfg.data.width,
                trimin=cfg.method.trimin,
                use_stereo=cfg.method.use_stereo,
                classic=not cfg.method.curriculum,
                num_workers=cfg.data.num_workers,
                prefetch=cfg.data.prefetch,
                seed=cfg.seed * 1000 + epoch,
                process_index=self.process_index,
                process_count=self.process_count,
                bucket_fs=bucket_fs,
                skip_batches=skip,
            )
            print(
                f"epoch {epoch}: F={st.F} scales={st.scales} cutoff={stage.cutoff:.2f} "
                f"incremental={st.incremental} partial={st.partial} decomp={st.decomp}"
            )
            t_epoch = time.time()
            seen = 0
            # one-ahead device prefetch: device_put is async, so the next
            # batch's host->HBM transfer overlaps the current step's compute
            # (the host-side decode pipeline is already double-buffered in
            # the loader; this overlaps the device edge too)
            def shard_iter():
                for b in loader:
                    yield b, shard_batch(b, self.mesh)

            it = shard_iter()
            pending = next(it, None)
            bi = skip - 1  # batch indices continue the pre-resume count
            while pending is not None:
                host_batch, batch = pending
                pending = next(it, None)
                bi += 1
                fn, st_b = step_fn, st
                if bucket_fs is not None:
                    F_c = (host_batch["frames"].shape[1] - 2) // 2
                    if F_c != st.F:
                        st_b = dataclasses.replace(st, F=F_c)
                        fn = self._step_fn(st_b)
                key = jax.random.fold_in(self._base_key, global_step)
                self.state, metrics = fn(self.state, batch, key)
                global_step += 1
                seen += cfg.optim.batch_size

                if stop_requested["flag"]:
                    if self.is_lead:
                        self.ckpt.save(
                            global_step, jax.device_get(self.state),
                            {"epoch": epoch, "batch_in_epoch": bi, "preempted": True,
                             "best_abs_rel": self.best_abs_rel},
                        )
                        print("emergency checkpoint written; exiting")
                    return

                if bi % cfg.log.log_frequency == 0 and bi > 0:
                    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                    if not all(map(lambda v: v == v and abs(v) < 1e6, m.values())):
                        if self.is_lead:
                            self.ckpt.save(
                                global_step, jax.device_get(self.state),
                                {"epoch": epoch, "batch_in_epoch": bi, "nan": True,
                                 "best_abs_rel": self.best_abs_rel},
                            )
                        raise FloatingPointError(f"non-finite loss at step {global_step}: {m}")
                    if not self.is_lead:
                        continue
                    rate = seen / (time.time() - t_epoch)
                    elapsed = time.time() - t0
                    m.update(epoch=epoch, imgs_per_sec=rate)
                    self.logger.log(global_step, m)
                    print(
                        f"e{epoch} b{bi} loss {m['loss']:.4f} | {rate:5.1f} imgs/s | "
                        f"elapsed {sec_to_hm_str(elapsed)}"
                    )
                    if cfg.log.image_panels and self.process_count == 1:
                        self.save_image_panels(st_b, batch, key, global_step)
                    if self.gt_depths is not None:
                        self.validate(
                            st, global_step, epoch, bi,
                            quick=cfg.log.quick_val_size,
                        )
                    if cfg.log.syns_val:
                        self.validate_syns(global_step)

            # full validation at every epoch end (quick-val only subsamples
            # the in-epoch checks)
            if self.is_lead and self.gt_depths is not None:
                self.validate(st, global_step, epoch, -1)

            if (epoch + 1) % cfg.log.save_frequency == 0 and self.is_lead:
                self.ckpt.save(
                    global_step, jax.device_get(self.state),
                    {"epoch": epoch, "epoch_complete": True,
                     "best_abs_rel": self.best_abs_rel},
                )
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        self.logger.close()

    # ------------------------------------------------------------------
    def _local_params(self):
        """(params, stats) safe to feed a lead-process-only jitted eval.

        Under multi-host training the live state is built of global
        jax.Arrays spanning every process (NamedSharding over the
        multi-process mesh); dispatching a computation on those from one
        process alone deadlocks, so validation pulls fully-replicated
        host copies first and runs a purely process-local computation.
        Single-process: the live arrays, no copy.
        """
        if self.process_count == 1:
            return self.state.params, self.state.stats
        return (
            jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), self.state.params),
            jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), self.state.stats),
        )

    def validate(self, st: StepStatic, global_step: int, epoch: int, bi: int,
                 quick: int = 0):
        """Online eigen_zhou validation (reference val(), trainer.py:623-665).

        quick > 0 subsamples the val split to that many images (even
        stride) for the in-epoch checks -- the reference runs all 4,424
        every log_frequency batches, which on a ~25 ms/dispatch tunnel
        would dominate wall-clock. The epoch-end call always runs full.
        """
        import cv2

        if st.zoo not in self._eval_fns:
            self._eval_fns[st.zoo] = make_eval_forward(st)
        fwd = self._eval_fns[st.zoo]

        val_paths, gt_depths = self.val_paths, self.gt_depths
        if quick and quick < len(val_paths):
            sel = np.linspace(0, len(val_paths) - 1, quick).astype(int)
            val_paths = [val_paths[i] for i in sel]
            gt_depths = [gt_depths[i] for i in sel]

        totals = np.zeros(len(METRIC_NAMES))
        count = 0
        loader = EvalLoader(
            val_paths, self.cfg.data.height, self.cfg.data.width, batch_size=16
        )
        params, stats = self._local_params()
        for imgs, start, n in loader:
            depth = np.asarray(jax.device_get(fwd(params, stats, imgs.astype(np.float32) / 255.0)))
            for j in range(n):
                gt = gt_depths[start + j]
                pred = cv2.resize(depth[j], (gt.shape[1], gt.shape[0]))
                totals += np.array(single_image_errors(pred, gt))
                count += 1
        vals = dict(zip(METRIC_NAMES, totals / max(count, 1)))
        self.logger.log(global_step, {f"val/{k}": v for k, v in vals.items()})
        print("val:", " ".join(f"{k}={v:.4f}" for k, v in vals.items()))
        if vals["abs_rel"] < self.best_abs_rel:
            self.best_abs_rel = vals["abs_rel"]
            self.ckpt.save(
                global_step,
                jax.device_get(self.state),
                {"epoch": epoch, "batch_in_epoch": bi, "epoch_complete": bi < 0,
                 "abs_rel": vals["abs_rel"], "best": True,
                 "best_abs_rel": self.best_abs_rel},
            )
            print(f"new best abs_rel {vals['abs_rel']:.4f} -> checkpoint saved")

    # ------------------------------------------------------------------
    def validate_syns(self, global_step: int):
        """SYNS edge-accuracy online validation (reference trainer.py:646-663,
        its --SYNS_edge path), over the SYNS val split."""
        try:
            from baseboostdepth_tpu.evaluation.syns import evaluate_syns

            params, stats = self._local_params()
            m = evaluate_syns(self.cfg, params, stats, file_name="val_files.txt")
        except FileNotFoundError as e:
            print(f"[syns-val] skipped (missing asset: {e})")
            return
        self.logger.log(global_step, {f"syns/{k}": v for k, v in m.items()})
        print("syns-val:", " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    # ------------------------------------------------------------------
    def save_image_panels(self, st: StepStatic, batch, rng, global_step: int,
                          max_rows: int = 3):
        """Write a target | disp | automask | min-loss | warped-candidates
        grid PNG for the current train batch (the observability the
        reference gets from wandb image logging, trainer.py:736-772)."""
        from PIL import Image

        from baseboostdepth_tpu.utils import colormap

        key = ("dbg", st)
        if key not in self._eval_fns:
            self._eval_fns[key] = make_debug_forward(st)
        dbg = jax.device_get(
            self._eval_fns[key](self.state.params, self.state.stats, batch, rng)
        )

        rows = []
        n = min(max_rows, dbg["target"].shape[0])
        for b in range(n):
            cells = [np.asarray(dbg["target"][b])]
            disp = np.asarray(dbg["disp"][b], np.float32)
            cells.append(colormap(disp, cmap="magma"))
            am = np.asarray(dbg["automask"][b], np.float32)
            cells.append(np.repeat(am[..., None], 3, axis=-1))
            ml = np.asarray(dbg["min_loss"][b], np.float32)
            cells.append(colormap(np.clip(ml, 0, np.percentile(ml, 98) + 1e-8)))
            S = dbg["warped"].shape[1]
            for s in (0, S - 1):  # farthest temporal slot + stereo
                cells.append(np.asarray(dbg["warped"][b, s]))
            rows.append(np.concatenate(cells, axis=1))
        panel = (np.clip(np.concatenate(rows, axis=0), 0, 1) * 255).astype(np.uint8)
        out_dir = os.path.join(self.log_path, "panels")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"step_{global_step:08d}.png")
        Image.fromarray(panel).save(path)
        if self.logger._wandb is not None:
            self.logger._wandb.log(
                {"panels": self.logger._wandb.Image(path)}, step=global_step
            )
