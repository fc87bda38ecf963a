"""Training entry point (reference train.py): seed, build Trainer, run."""

from __future__ import annotations

import random
import sys

import numpy as np


def main(argv=None):
    from baseboostdepth_tpu.config import Config

    cfg = Config.from_args(argv)
    if cfg.dist.enabled:
        # must precede any backend-touching JAX call (multi-host backend the
        # reference never had; SURVEY.md section 2.10 item 3)
        from baseboostdepth_tpu.parallel import initialize_distributed

        initialize_distributed(
            cfg.dist.coordinator, cfg.dist.num_processes, cfg.dist.process_id
        )

    from baseboostdepth_tpu.training.trainer import Trainer

    # full determinism hooks (reference train.py:8-23): host RNGs seeded;
    # device RNG is explicitly keyed everywhere, XLA is deterministic.
    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    Trainer(cfg).train()


if __name__ == "__main__":
    main(sys.argv[1:])
