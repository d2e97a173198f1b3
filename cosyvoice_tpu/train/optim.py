"""LR schedules + optimizer factory.

Behavioral spec: reference `cosyvoice/utils/scheduler.py` (WarmupLR:27 —
lr * warmup^0.5 * min(step^-0.5, step*warmup^-1.5); NoamHoldAnnealing:623 —
linear warmup, hold, then decay initial_lr * warmup^d / (step-hold)^d;
ConstantLR:719) and `utils/train_utils.py:123-196` (adam/adamw wiring, grad
clip 5, gradient accumulation).  Expressed as optax schedules/transforms.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def warmup_lr(peak_lr: float, warmup_steps: int = 25000) -> optax.Schedule:
    """wenet WarmupLR (scheduler.py:27-66); step is 1-based in the reference."""

    def schedule(step):
        s = jnp.maximum(step.astype(jnp.float32) + 1.0, 1.0)
        return peak_lr * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)

    return schedule


def constant_lr(lr: float, warmup_steps: int = 0) -> optax.Schedule:
    def schedule(step):
        if warmup_steps <= 0:
            return jnp.asarray(lr)
        s = step.astype(jnp.float32)
        return lr * jnp.minimum(1.0, (s + 1.0) / warmup_steps)

    return schedule


def noam_hold_annealing(peak_lr: float, warmup_steps: int, hold_steps: int,
                        decay_rate: float = 0.5, min_lr: float = 0.0) -> optax.Schedule:
    """NeMo NoamHoldAnnealing (scheduler.py:433-441,623-717)."""
    hold_total = warmup_steps + hold_steps

    def schedule(step):
        s = step.astype(jnp.float32) + 1.0
        warm = peak_lr * jnp.minimum(1.0, s / max(warmup_steps, 1))
        t_wd = max(1.0, warmup_steps ** decay_rate)
        t_hd = jnp.maximum(1.0, (s - hold_steps) ** decay_rate)
        decay = jnp.maximum(peak_lr * t_wd / t_hd, min_lr)
        return jnp.where(s <= warmup_steps, warm,
                         jnp.where(s <= hold_total, peak_lr, decay))

    return schedule


def cosine_annealing(peak_lr: float, max_steps: int, warmup_steps: int = 0,
                     min_lr: float = 0.0) -> optax.Schedule:
    """NeMo CosineAnnealing (scheduler.py:497-556, _cosine_annealing:391-394):
    linear warmup lr*(s+1)/(warmup+1), then cosine from peak to min_lr over
    (max_steps - warmup_steps), clamped at min_lr past max_steps."""

    def schedule(step):
        s = step.astype(jnp.float32)
        warm = peak_lr * (s + 1.0) / (warmup_steps + 1.0)
        frac = jnp.clip((s - warmup_steps) / max(max_steps - warmup_steps, 1),
                        0.0, 1.0)
        mult = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        decay = (peak_lr - min_lr) * mult + min_lr
        return jnp.where(s < warmup_steps, warm, decay)

    return schedule


SCHEDULERS = {
    "warmuplr": warmup_lr,
    "constantlr": constant_lr,
    "NoamHoldAnnealing": noam_hold_annealing,
    "CosineAnnealing": cosine_annealing,
}


def make_optimizer(optim: str = "adam", lr: float = 1e-3,
                   scheduler: str = "warmuplr", scheduler_kwargs: Optional[dict] = None,
                   grad_clip: float = 5.0, accum_grad: int = 1,
                   weight_decay: float = 0.0) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Mirror of train_utils.init_optimizer_and_scheduler:123-196."""
    sched = SCHEDULERS[scheduler](lr, **(scheduler_kwargs or {}))
    if optim == "adam":
        opt = optax.adam(sched)
    elif optim == "adamw":
        opt = optax.adamw(sched, weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {optim}")
    tx = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    # reference skips the step on non-finite grad norm (train_utils.py:290-315)
    tx = optax.apply_if_finite(tx, max_consecutive_errors=1000000)
    if accum_grad > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_grad)
    return tx, sched
