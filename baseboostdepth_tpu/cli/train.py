"""Training entry point (reference train.py): seed, build Trainer, run."""

from __future__ import annotations

import random
import sys

import numpy as np


def main(argv=None):
    from baseboostdepth_tpu.config import Config
    from baseboostdepth_tpu.training.trainer import Trainer

    cfg = Config.from_args(argv)
    # full determinism hooks (reference train.py:8-23): host RNGs seeded;
    # device RNG is explicitly keyed everywhere, XLA is deterministic.
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    Trainer(cfg).train()


if __name__ == "__main__":
    main(sys.argv[1:])
