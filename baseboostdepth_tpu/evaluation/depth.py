"""Batch KITTI/SYNS depth evaluation (the reference's evaluate_depth.py
as a library + CLI).

Pipeline parity (evaluate_depth.py:104-317): run encoder+decoder over the
test split at checkpoint resolution, collect scaled disparities (or metric
depth for SQL), cv2-resize each to GT resolution, invert, Garg-crop +
range-mask, median-scale (mono) or x5.4 (stereo), average the 7 metrics.
Batched device inference replaces the reference's bs=1 loop.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from baseboostdepth_tpu import geometry
from baseboostdepth_tpu.config import Config
from baseboostdepth_tpu.data import kitti
from baseboostdepth_tpu.data.loader import EvalLoader
from baseboostdepth_tpu.evaluation import metrics as M
from baseboostdepth_tpu.training.step import StepStatic, build_networks


def make_disp_forward(st: StepStatic):
    """jit: (params, stats, images float [B,H,W,3]) -> [B, H, W] scaled
    disparity (non-SQL) or metric depth (SQL)."""
    depth_net, _ = build_networks(st)

    @jax.jit
    def fwd(params, stats, images):
        dvars = {"params": params["depth"], "batch_stats": stats["depth"]}
        disps = depth_net.apply(dvars, images.astype(st.compute_dtype), train=False)
        d0 = disps[0].astype(jnp.float32)[..., 0]
        if st.metric_depth:
            return d0
        scaled, _ = geometry.disp_to_depth(d0, st.min_depth, st.max_depth)
        return scaled

    return fwd


def predict_disparities(
    st: StepStatic,
    params,
    stats,
    paths: List[str],
    batch_size: int = 16,
    post_process: bool = False,
) -> np.ndarray:
    """Run the depth network over a list of image paths -> [N, H, W] disps.

    post_process: flip-averaging from the original monodepth paper
    (reference exposes it via --post_process)."""
    fwd = make_disp_forward(st)
    loader = EvalLoader(paths, st.height, st.width, batch_size=batch_size)
    out = []
    for imgs, start, n in loader:
        x = imgs.astype(np.float32) / 255.0
        d = np.asarray(jax.device_get(fwd(params, stats, jnp.asarray(x))))
        if post_process:
            d_f = np.asarray(
                jax.device_get(fwd(params, stats, jnp.asarray(x[:, :, ::-1])))
            )[:, :, ::-1]
            d = _batch_post_process(d, d_f)
        out.append(d[:n])
    return np.concatenate(out, axis=0)


def _batch_post_process(disp: np.ndarray, disp_flipped: np.ndarray) -> np.ndarray:
    """Monodepth v1 flip post-processing: blend the prediction and the
    flipped prediction with a left/right ramp."""
    _, h, w = disp.shape
    mean = 0.5 * (disp + disp_flipped)
    xs = np.linspace(0, 1, w, dtype=np.float32)[None, None, :]
    mask = np.clip(20 * (xs - 0.05), 0, 1)
    mask_f = mask[:, :, ::-1]
    return mask_f * disp + mask * disp_flipped + (1.0 - mask - mask_f) * mean


def evaluate_kitti(
    cfg: Config,
    params,
    stats,
    eval_split: str = "eigen",
    stereo: bool = False,
    post_process: bool = False,
    save_pred_disps: Optional[str] = None,
) -> dict:
    """End-to-end KITTI eval: test_files.txt -> metrics dict."""
    st = StepStatic(
        zoo=cfg.model.zoo,
        num_layers=cfg.model.num_layers,
        height=cfg.data.height,
        width=cfg.data.width,
        min_depth=cfg.method.min_depth,
        max_depth=cfg.method.max_depth,
        dtype=cfg.model.dtype,
    )
    from baseboostdepth_tpu.utils import resolve_splits_dir

    split_dir = os.path.join(resolve_splits_dir(cfg.data.splits_dir), eval_split)
    index = kitti.KittiRawIndex(
        cfg.data.kt_path, os.path.join(split_dir, "test_files.txt"), ".jpg"
    )
    paths = [index.image_path(s.folder, s.frame_index, s.side) for s in index.samples]

    disps = predict_disparities(st, params, stats, paths, post_process=post_process)
    if save_pred_disps:
        np.save(save_pred_disps, disps)

    gt = np.load(
        os.path.join(split_dir, "gt_depths.npz"),
        fix_imports=True,
        encoding="latin1",
        allow_pickle=True,
    )["data"]

    protocol = M.EvalProtocol.stereo() if stereo else M.EvalProtocol.mono()
    protocol.disp_input = not st.metric_depth
    mean_errors, ratios = M.evaluate_disparities(disps, list(gt), protocol)

    result = dict(zip(M.METRIC_NAMES, mean_errors.tolist()))
    if len(ratios):
        med = np.median(ratios)
        result["median_ratio"] = float(med)
        result["ratio_std"] = float(np.std(ratios / med))
    return result


def print_metrics(result: dict) -> None:
    names = [n for n in M.METRIC_NAMES if n in result]
    print("\n  " + ("{:>9} | " * len(names)).format(*names))
    print(("&{: 9.3f}  " * len(names)).format(*[result[n] for n in names]) + "\\\\")
