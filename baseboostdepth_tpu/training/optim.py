"""Optimizer and LR schedule.

Reference: Adam lr=1e-4 with MultiStepLR milestones [11,13,15,16,17,18,19]
gamma=0.4 (trainer.py:106-112); MonoViT uses AdamW with a second param group
for the encoder at lr 5e-5 (trainer.py:107-109).

Scheduler quirk reproduced: the reference calls scheduler.step() at the
START of every epoch (trainer.py:197) on top of torch's epoch counting, so a
milestone value m takes effect during 0-indexed epoch m-1. We therefore
place the boundary at (m-1) * steps_per_epoch.
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    boundaries = {
        max(0, (m - 1)) * steps_per_epoch: gamma for m in milestones
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    learning_rate: float = 1e-4,
    milestones: Sequence[int] = (11, 13, 15, 16, 17, 18, 19),
    gamma: float = 0.4,
    steps_per_epoch: int = 1,
    vit: bool = False,
    vit_encoder_lr: float = 5e-5,
) -> optax.GradientTransformation:
    sched = multistep_lr(learning_rate, milestones, gamma, steps_per_epoch)
    if not vit:
        return optax.adam(sched)

    # MonoViT: AdamW; depth encoder params at a lower LR, everything else at
    # the base LR (two-group AdamW, trainer.py:106-109).
    enc_sched = multistep_lr(vit_encoder_lr, milestones, gamma, steps_per_epoch)

    def label_fn(params):
        import jax

        def label(path, _):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            return "encoder" if (keys[:2] == ["depth", "encoder"]) else "rest"

        return jax.tree_util.tree_map_with_path(label, params)

    return optax.multi_transform(
        {"encoder": optax.adamw(enc_sched), "rest": optax.adamw(sched)}, label_fn
    )
