"""Single-image / folder depth inference demo (reference test_simple.py):
load a checkpoint, predict disparity, save colormapped JPEGs + npy depth.

Usage:
  python -m baseboostdepth_tpu.cli.infer --config cfg.json \
      --checkpoint logs/bbd_tpu/checkpoints --image_path assets/test.jpg
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.evaluation.depth import make_disp_forward
    from baseboostdepth_tpu.training.checkpoint import CheckpointManager
    from baseboostdepth_tpu.training.optim import make_optimizer
    from baseboostdepth_tpu.training.step import StepStatic, init_state
    from baseboostdepth_tpu.utils import colormap

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image_path", required=True, help="image file or folder")
    ap.add_argument("--ext", default="jpg")
    ap.add_argument("--out_dir", default=None)
    args = ap.parse_args(argv)

    cfg = Config.load(args.config)
    st = StepStatic(
        zoo=cfg.model.zoo, num_layers=cfg.model.num_layers,
        height=cfg.data.height, width=cfg.data.width, dtype=cfg.model.dtype,
        min_depth=cfg.method.min_depth, max_depth=cfg.method.max_depth,
    )
    state = init_state(st, make_optimizer(), jax.random.PRNGKey(0))
    state, _ = CheckpointManager(args.checkpoint).restore(state)
    fwd = make_disp_forward(st)

    if os.path.isdir(args.image_path):
        paths = sorted(glob.glob(os.path.join(args.image_path, f"*.{args.ext}")))
        out_dir = args.out_dir or args.image_path
    else:
        paths = [args.image_path]
        out_dir = args.out_dir or os.path.dirname(args.image_path)
    os.makedirs(out_dir, exist_ok=True)
    print(f"predicting on {len(paths)} image(s)")

    for p in paths:
        with Image.open(p) as im:
            im = im.convert("RGB")
            ow, oh = im.size
            x = np.asarray(im.resize((st.width, st.height), Image.LANCZOS), np.float32) / 255.0
        disp = np.asarray(jax.device_get(fwd(state.params, state.stats, jnp.asarray(x[None]))))[0]
        # upsample to the original resolution for display
        disp_big = np.asarray(
            jax.image.resize(jnp.asarray(disp), (oh, ow), method="linear")
        )
        base = os.path.splitext(os.path.basename(p))[0]
        np.save(os.path.join(out_dir, f"{base}_disp.npy"), disp)
        # percentile-normalized magma visualization (test_simple.py:141-155)
        vmax = np.percentile(disp_big, 95)
        vis = np.clip(disp_big / max(vmax, 1e-9), 0, 1)
        rgb = (colormap(vis, cmap="magma", normalize=False) * 255).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(out_dir, f"{base}_disp.jpeg"))
        print(f"  {base} -> {base}_disp.jpeg")


if __name__ == "__main__":
    main(sys.argv[1:])
