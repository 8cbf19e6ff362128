"""LR schedules matching the reference trainers.

* linear warmup (factor 0.01 -> 1 over warmup_epochs) then cosine annealing
  (reference train_qm9v3.py:193-208 SequentialLR(LinearLR, CosineAnnealingLR));
* per-step cosine+warmup lambda (reference train_oc20v2.py
  get_lr_lambda_cosine_warmup).

Everything is expressed per-step for jax/optax (the reference mixes per-batch
warmup with per-epoch cosine, train_MatPES_GATAWandB.py:405-448 — per-step is
the clean equivalent).
"""

from __future__ import annotations

import math

import optax

__all__ = ["warmup_cosine"]


def warmup_cosine(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    min_lr_factor: float = 0.0,
    start_factor: float = 0.01,
):
    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (
            start_factor + (1.0 - start_factor) * step / max(warmup_steps, 1)
        )
        progress = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = base_lr * (
            min_lr_factor
            + (1.0 - min_lr_factor) * 0.5 * (1.0 + jnp.cos(math.pi * progress))
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule
