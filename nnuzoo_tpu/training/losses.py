"""Segmentation losses in JAX.

Semantics match the reference (`nnunetv2/training/loss/dice.py:58-120`,
`compound_losses.py:8-116`, `deep_supervision.py:5`, `robust_ce_loss.py:6-30`):
memory-efficient soft dice (no materialized fp/fn maps), Dice+CE with
ignore-label masking, Dice+BCE for region-based training (ignore mask in the last
target channel), deep-supervision weighting 1/2^i with the lowest output zeroed.

Under pjit with a batch-sharded mesh the global sums that the reference gets from
``AllGatherGrad`` (ddp=True) fall out of XLA's partitioner automatically — a
``jnp.sum`` over the batch axis of a sharded array IS the cross-device reduction.
"""

from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def _onehot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """labels (B, 1, *spatial) int -> (B, C, *spatial) float one-hot. XLA fuses the
    comparison into downstream reductions; nothing big is materialized."""
    classes = jnp.arange(num_classes, dtype=labels.dtype).reshape(
        (1, num_classes) + (1,) * (labels.ndim - 2))
    return (labels == classes).astype(jnp.float32)


def memory_efficient_soft_dice(probs: jnp.ndarray, target: jnp.ndarray,
                               batch_dice: bool = False, do_bg: bool = True,
                               smooth: float = 1.0,
                               loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """probs (B, C, *spatial) after nonlin; target (B, 1, *spatial) labels or
    (B, C, *spatial) one-hot. Returns -mean dice."""
    if target.shape != probs.shape:
        y_onehot = _onehot(target, probs.shape[1])
    else:
        y_onehot = target.astype(jnp.float32)

    if not do_bg:
        probs = probs[:, 1:]
        y_onehot = y_onehot[:, 1:]

    axes = tuple(range(2, probs.ndim))
    if loss_mask is None:
        intersect = jnp.sum(probs * y_onehot, axis=axes)
        sum_pred = jnp.sum(probs, axis=axes)
        sum_gt = jnp.sum(y_onehot, axis=axes)
    else:
        intersect = jnp.sum(probs * y_onehot * loss_mask, axis=axes)
        sum_pred = jnp.sum(probs * loss_mask, axis=axes)
        sum_gt = jnp.sum(y_onehot * loss_mask, axis=axes)

    if batch_dice:
        intersect = intersect.sum(0)
        sum_pred = sum_pred.sum(0)
        sum_gt = sum_gt.sum(0)

    dc = (2 * intersect + smooth) / jnp.clip(sum_gt + sum_pred + smooth, 1e-8)
    return -dc.mean()


def robust_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """logits (B, C, *spatial), labels (B, *spatial) int. Mean CE over valid voxels."""
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    nll = -picked
    if loss_mask is not None:
        m = loss_mask.astype(nll.dtype)
        return jnp.sum(nll * m) / jnp.clip(jnp.sum(m), 1.0)
    return nll.mean()


def topk_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, k_percent: float = 10.0,
                       loss_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """TopK loss (reference `robust_ce_loss.py:19-30`): mean of the worst k% voxels."""
    logp = jax.nn.log_softmax(logits, axis=1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    nll = -picked
    if loss_mask is not None:
        nll = jnp.where(loss_mask.astype(bool), nll, 0.0)
    flat = nll.reshape(-1)
    k = max(1, int(flat.shape[0] * k_percent / 100))
    topk = jax.lax.top_k(flat, k)[0]
    return topk.mean()


def dice_ce_loss(logits: jnp.ndarray, target: jnp.ndarray, batch_dice: bool,
                 ignore_label: Optional[int] = None, weight_ce: float = 1.0,
                 weight_dice: float = 1.0, smooth: float = 1e-5) -> jnp.ndarray:
    """Label-based compound loss (reference `compound_losses.py:8-57`): softmax dice
    (do_bg False) + CE; ignore_label masks both."""
    target = target.astype(jnp.int32)
    if ignore_label is not None:
        mask = (target != ignore_label)
        target_dice = jnp.where(mask, target, 0)
        num_fg = mask.sum()
    else:
        mask = None
        target_dice = target

    probs = jax.nn.softmax(logits, axis=1)
    dc = memory_efficient_soft_dice(probs, target_dice, batch_dice=batch_dice,
                                    do_bg=False, smooth=smooth, loss_mask=mask)
    # gather on the ignore-replaced labels: the ignore value may exceed C-1 and those
    # voxels are masked out of the mean anyway (reference uses CE ignore_index)
    ce = robust_cross_entropy(logits, target_dice[:, 0],
                              loss_mask=mask[:, 0] if mask is not None else None)
    if ignore_label is not None:
        ce = jnp.where(num_fg > 0, ce, 0.0)
    return weight_ce * ce + weight_dice * dc


def dice_bce_loss(logits: jnp.ndarray, target: jnp.ndarray, batch_dice: bool,
                  use_ignore_label: bool = False, weight_ce: float = 1.0,
                  weight_dice: float = 1.0, smooth: float = 1e-5) -> jnp.ndarray:
    """Region-based compound loss (reference `compound_losses.py:59-116`): sigmoid
    dice (do_bg True) + BCE over one-hot region targets; if use_ignore_label the
    LAST target channel is the ignore mask (1 = annotated... reference: mask =
    1 - target[:, -1:])."""
    if use_ignore_label:
        mask = (1 - target[:, -1:]).astype(jnp.float32)
        target_regions = target[:, :-1].astype(jnp.float32)
    else:
        mask = None
        target_regions = target.astype(jnp.float32)

    probs = jax.nn.sigmoid(logits)
    dc = memory_efficient_soft_dice(probs, target_regions, batch_dice=batch_dice,
                                    do_bg=True, smooth=smooth, loss_mask=mask)
    # BCE with logits
    per_pixel = jnp.maximum(logits, 0) - logits * target_regions + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    if mask is not None:
        # reference DC_and_BCE_loss sums BCE over all C region channels and
        # divides by the 1-channel mask sum only (compound_losses.py:101)
        bce = jnp.sum(per_pixel * mask) / jnp.clip(jnp.sum(mask), 1.0)
    else:
        bce = per_pixel.mean()
    return weight_ce * bce + weight_dice * dc


def get_deep_supervision_weights(num_outputs: int):
    """1/2^i per output, lowest set to 0, normalized (reference
    `nnUNetTrainer.py:470-487`). Returns a host numpy array so zero entries
    are statically known."""
    import numpy as np
    weights = np.array([1 / (2 ** i) for i in range(num_outputs)])
    if num_outputs > 1:
        weights[-1] = 0
    return weights / weights.sum()


def deep_supervision_loss(loss_fn, outputs: Sequence[jnp.ndarray],
                          targets: Sequence[jnp.ndarray],
                          weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Zero-weight outputs are SKIPPED, not just scaled: the reference's
    DeepSupervisionWrapper (`nnunetv2/training/loss/deep_supervision.py:22-30`)
    never evaluates them — UNETR2Net relies on this (its deepest side output
    is at 1/16 scale while the zero-weighted deepest target is at 1/32)."""
    import numpy as np
    if weights is None:
        weights = get_deep_supervision_weights(len(outputs))
    weights = np.asarray(weights)
    total = 0.0
    for i, (o, t) in enumerate(zip(outputs, targets)):
        if float(weights[i]) == 0.0:
            continue
        total = total + float(weights[i]) * loss_fn(o, t)
    return total


def hard_dice_stats(logits: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                    has_regions: bool, ignore_label_mask: Optional[jnp.ndarray] = None):
    """Per-class tp/fp/fn of the argmax/thresholded prediction — what the reference
    computes in validation_step (`nnUNetTrainer.py:1161-1226`) for pseudo-dice.
    Returns arrays of shape (C_fg,). For label-based training, classes 1..C-1."""
    if has_regions:
        pred = (jax.nn.sigmoid(logits) > 0.5).astype(jnp.float32)
        gt = target.astype(jnp.float32)
    else:
        pred_labels = jnp.argmax(logits, axis=1, keepdims=True)
        classes = jnp.arange(1, num_classes).reshape(
            (1, num_classes - 1) + (1,) * (logits.ndim - 2))
        pred = (pred_labels == classes).astype(jnp.float32)
        gt = (target == classes).astype(jnp.float32)

    axes = (0,) + tuple(range(2, pred.ndim))
    if ignore_label_mask is not None:
        pred = pred * ignore_label_mask
        gt = gt * ignore_label_mask
    tp = jnp.sum(pred * gt, axis=axes)
    fp = jnp.sum(pred * (1 - gt), axis=axes)
    fn = jnp.sum((1 - pred) * gt, axis=axes)
    return tp, fp, fn
