"""LR schedules as optax-compatible callables (reference:
`nnunetv2/training/lr_scheduler/polylr.py:7-110`, `warmup.py`, `cosine_lr.py`).

Schedules map *epoch* (not step) to LR, like the reference's per-epoch
``lr_scheduler.step(epoch)``. Wrap with :func:`per_step` to feed optax, which
counts optimizer steps.
"""

import math
from typing import Callable

import jax.numpy as jnp
import numpy as np


def poly_lr(initial_lr: float, max_epochs: int, exponent: float = 0.9) -> Callable:
    """PolyLR: lr = initial * (1 - epoch/max)^0.9 (reference `polylr.py:7-25`)."""
    def schedule(epoch):
        return initial_lr * (1 - jnp.minimum(epoch, max_epochs - 1) / max_epochs) ** exponent
    return schedule


def poly_lr_with_warmup(initial_lr: float, max_epochs: int, warmup_epochs: int,
                        exponent: float = 0.9, warmup_initial_factor: float = 1e-3
                        ) -> Callable:
    """Linear warmup then poly decay (reference
    `polylr.py:28-72` ContinuedPolyLRSchedulerWithWarmup)."""
    def schedule(epoch):
        warm = initial_lr * (warmup_initial_factor +
                             (1 - warmup_initial_factor) *
                             jnp.minimum(epoch, warmup_epochs) / max(warmup_epochs, 1))
        decay_epoch = jnp.maximum(epoch - warmup_epochs, 0)
        decay_total = max(max_epochs - warmup_epochs, 1)
        decayed = initial_lr * (1 - jnp.minimum(decay_epoch, decay_total - 1)
                                / decay_total) ** exponent
        return jnp.where(epoch < warmup_epochs, warm, decayed)
    return schedule


def linear_warmup_cosine_annealing(initial_lr: float, max_epochs: int,
                                   warmup_epochs: int, warmup_start_lr: float = 0.0,
                                   eta_min: float = 0.0) -> Callable:
    """Reference `polylr.py:75-110` LinearWarmupCosineAnnealingLR."""
    def schedule(epoch):
        if np.ndim(epoch) == 0 and epoch < warmup_epochs and warmup_epochs > 0:
            return warmup_start_lr + (initial_lr - warmup_start_lr) * \
                epoch / max(warmup_epochs - 1, 1)
        t = (epoch - warmup_epochs) / max(max_epochs - warmup_epochs, 1)
        return eta_min + (initial_lr - eta_min) * (1 + math.cos(math.pi * t)) / 2
    return schedule


def lin_incr_lr(initial_lr: float, max_epochs: int) -> Callable:
    """Linearly increasing LR (reference `warmup.py` Lin_incr_LRScheduler)."""
    def schedule(epoch):
        return initial_lr * (epoch + 1) / max_epochs
    return schedule


def per_step(epoch_schedule: Callable, steps_per_epoch: int) -> Callable:
    """Adapt an epoch->lr schedule to optax's step counter. LR is constant within an
    epoch, exactly like the reference's per-epoch scheduler.step()."""
    def schedule(step):
        return epoch_schedule(step // steps_per_epoch)
    return schedule


def continued_poly_lr_with_warmup(initial_lr: float, total_epochs: int,
                                  warmup_epochs: int, start_epoch: int = 0,
                                  warmup_lr: float = 1e-5,
                                  final_lr: float = 1e-5,
                                  exponent: float = 0.9) -> Callable:
    """Reference ``ContinuedPolyLRSchedulerWithWarmup`` (`polylr.py:28-73`):
    linear warmup from ``warmup_lr`` over ``warmup_epochs`` starting at
    ``start_epoch``, then poly decay to ``final_lr`` at ``total_epochs``."""
    def schedule(epoch):
        warm = warmup_lr + (initial_lr - warmup_lr) * (
            jnp.maximum(epoch - start_epoch, 0) / max(warmup_epochs, 1))
        decay_steps = max(total_epochs - start_epoch - warmup_epochs, 1)
        adjusted = epoch - start_epoch - warmup_epochs
        decayed = final_lr + (initial_lr - final_lr) * (
            1 - jnp.clip(adjusted, 0, decay_steps) / decay_steps) ** exponent
        return jnp.where(epoch < warmup_epochs + start_epoch, warm, decayed)
    return schedule


def finetune_double_warmup_lr(initial_lr: float, num_epochs: int,
                              freeze_encoder_epochs: int,
                              encoder_warmup_epochs: int,
                              decoder_warmup_epochs: int) -> Callable:
    """The FineTuneDecoderWarmUp trainer's two-phase schedule (reference
    `nnUNetTrainerFineTuneDecoderWarmUp.py:36-140`): while the encoder is
    frozen, a ContinuedPoly over [0, freeze) with the encoder warmup; once
    unfrozen, a fresh ContinuedPoly starting at ``freeze_encoder_epochs``
    with the decoder warmup over the full run."""
    phase1 = continued_poly_lr_with_warmup(
        initial_lr, total_epochs=freeze_encoder_epochs,
        warmup_epochs=encoder_warmup_epochs, start_epoch=0)
    phase2 = continued_poly_lr_with_warmup(
        initial_lr, total_epochs=num_epochs,
        warmup_epochs=decoder_warmup_epochs,
        start_epoch=freeze_encoder_epochs)

    def schedule(epoch):
        return jnp.where(epoch < freeze_encoder_epochs,
                         phase1(epoch), phase2(epoch))
    return schedule
