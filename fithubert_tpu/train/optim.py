"""Optimizer: AdamW with linear warmup + linear decay.

Reproduces s3prl's `AdamW_with_schedule` (consumed at reference train.py:12,
407-421): HF-style AdamW (decoupled weight decay scaled by lr — optax.adamw
semantics) under a get_linear_schedule_with_warmup ramp. Number of steps and
warmup are computed from epochs × batches / accumulation like
reference train.py:411-413.
"""

from __future__ import annotations

import optax

from fithubert_tpu.config import OptimizerConfig


def linear_warmup_decay(lr: float, num_training_steps: int, warmup_proportion: float):
    warmup = max(1, int(num_training_steps * warmup_proportion))
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, warmup),
            optax.linear_schedule(lr, 0.0, max(1, num_training_steps - warmup)),
        ],
        [warmup],
    )


def build_optimizer(cfg: OptimizerConfig, num_training_steps: int):
    if cfg.name not in ("AdamW_with_schedule", "AdamW", "adamw"):
        raise NotImplementedError(f"optimizer '{cfg.name}' is not supported.")
    schedule = linear_warmup_decay(
        float(cfg.lr), num_training_steps, float(cfg.warmup_proportion)
    )
    tx = optax.adamw(
        learning_rate=schedule,
        b1=float(cfg.betas[0]),
        b2=float(cfg.betas[1]),
        eps=float(cfg.eps),
        weight_decay=float(cfg.weight_decay),
    )
    # NOTE: optax.flatten was tried here (one fused update pass instead of
    # ~300 per-leaf loops; 8.9 -> 5.8 ms standalone on v5e) but is net
    # NEGATIVE inside the full jitted train step — the ravel/concat copies
    # of the 90 MB grad tree cost more than the fusion saves (10.76 ->
    # 10.48 steps/s end to end). Keep the plain tree update.
    return tx, schedule
