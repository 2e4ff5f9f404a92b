import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from nnuzoo_tpu.training.losses import (deep_supervision_loss, dice_bce_loss,
                                        dice_ce_loss, get_deep_supervision_weights,
                                        hard_dice_stats, memory_efficient_soft_dice,
                                        robust_cross_entropy, topk_cross_entropy)
from nnuzoo_tpu.training.schedulers import (per_step, poly_lr, poly_lr_with_warmup)


def _naive_dice(probs, labels, batch_dice, do_bg, smooth=1.0):
    B, C = probs.shape[:2]
    onehot = np.stack([(labels[:, 0] == c) for c in range(C)], 1).astype(np.float64)
    axes = tuple(range(2, probs.ndim))
    intersect = (probs * onehot).sum(axes)
    sum_pred = probs.sum(axes)
    sum_gt = onehot.sum(axes)
    if batch_dice:
        intersect, sum_pred, sum_gt = intersect.sum(0), sum_pred.sum(0), sum_gt.sum(0)
    dc = (2 * intersect + smooth) / np.clip(sum_gt + sum_pred + smooth, 1e-8, None)
    if not do_bg:
        dc = dc[1:] if batch_dice else dc[:, 1:]
    return -dc.mean()


class TestDice:
    @pytest.mark.parametrize("batch_dice", [False, True])
    def test_matches_naive(self, rng, batch_dice):
        probs = rng.rand(2, 3, 8, 8).astype(np.float32)
        probs /= probs.sum(1, keepdims=True)
        labels = rng.randint(0, 3, (2, 1, 8, 8))
        ours = memory_efficient_soft_dice(jnp.asarray(probs), jnp.asarray(labels),
                                          batch_dice=batch_dice, do_bg=False)
        # note: do_bg=False in memory-efficient form slices BEFORE reduction
        naive_onehot = np.stack([(labels[:, 0] == c) for c in range(3)], 1)[:, 1:]
        p = probs[:, 1:]
        axes = tuple(range(2, probs.ndim))
        inter = (p * naive_onehot).sum(axes)
        sp = p.sum(axes)
        sg = naive_onehot.sum(axes)
        if batch_dice:
            inter, sp, sg = inter.sum(0), sp.sum(0), sg.sum(0)
        expected = -np.mean((2 * inter + 1.0) / np.clip(sg + sp + 1.0, 1e-8, None))
        assert abs(float(ours) - expected) < 1e-5

    def test_perfect_prediction(self):
        labels = np.zeros((1, 1, 4, 4), dtype=np.int32)
        labels[0, 0, :2] = 1
        probs = np.stack([(labels[:, 0] == 0), (labels[:, 0] == 1)], 1).astype(np.float32)
        loss = memory_efficient_soft_dice(jnp.asarray(probs), jnp.asarray(labels),
                                          do_bg=False, smooth=0.0)
        assert abs(float(loss) + 1.0) < 1e-6  # dice = 1 -> loss -1

    def test_ignore_mask(self, rng):
        probs = rng.rand(1, 2, 4, 4).astype(np.float32)
        labels = rng.randint(0, 2, (1, 1, 4, 4))
        mask = np.ones((1, 1, 4, 4), dtype=np.float32)
        mask[0, 0, 0] = 0
        full = memory_efficient_soft_dice(jnp.asarray(probs), jnp.asarray(labels))
        masked = memory_efficient_soft_dice(jnp.asarray(probs), jnp.asarray(labels),
                                            loss_mask=jnp.asarray(mask))
        assert not np.isclose(float(full), float(masked))


class TestCompound:
    def test_dice_ce_gradients_flow(self, rng):
        logits = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
        target = jnp.asarray(rng.randint(0, 3, (2, 1, 8, 8)))
        loss, grad = jax.value_and_grad(
            lambda x: dice_ce_loss(x, target, batch_dice=True))(logits)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(grad)).all()
        assert np.abs(np.asarray(grad)).max() > 0

    def test_dice_ce_ignore_label(self, rng):
        logits = jnp.asarray(rng.randn(1, 2, 6, 6).astype(np.float32))
        target = np.zeros((1, 1, 6, 6), dtype=np.int32)
        target[0, 0, :3] = 1
        target[0, 0, 5] = 2  # ignore label
        l_ign = dice_ce_loss(logits, jnp.asarray(target), batch_dice=False,
                             ignore_label=2)
        assert np.isfinite(float(l_ign))
        # fully-ignored target gives 0 CE
        target_all_ignore = np.full((1, 1, 6, 6), 2, dtype=np.int32)
        l_all = dice_ce_loss(logits, jnp.asarray(target_all_ignore), batch_dice=False,
                             ignore_label=2)
        assert np.isfinite(float(l_all))

    def test_dice_bce_regions(self, rng):
        logits = jnp.asarray(rng.randn(2, 2, 8, 8).astype(np.float32))
        target = jnp.asarray((rng.rand(2, 2, 8, 8) > 0.5).astype(np.float32))
        loss = dice_bce_loss(logits, target, batch_dice=True)
        assert np.isfinite(float(loss))

    def test_dice_bce_with_ignore(self, rng):
        logits = jnp.asarray(rng.randn(2, 2, 8, 8).astype(np.float32))
        # last channel = ignore mask
        target = jnp.asarray((rng.rand(2, 3, 8, 8) > 0.5).astype(np.float32))
        loss = dice_bce_loss(logits, target, batch_dice=True, use_ignore_label=True)
        assert np.isfinite(float(loss))


class TestDeepSupervision:
    def test_weights(self):
        w = np.asarray(get_deep_supervision_weights(4))
        assert w[-1] == 0
        assert abs(w.sum() - 1) < 1e-6
        assert w[0] > w[1] > w[2]

    def test_wrapper(self, rng):
        outputs = [jnp.asarray(rng.randn(1, 2, 8 // 2 ** i, 8 // 2 ** i)
                               .astype(np.float32)) for i in range(3)]
        targets = [jnp.asarray(rng.randint(0, 2, (1, 1, 8 // 2 ** i, 8 // 2 ** i)))
                   for i in range(3)]
        loss = deep_supervision_loss(
            lambda o, t: dice_ce_loss(o, t, batch_dice=False), outputs, targets)
        assert np.isfinite(float(loss))


def test_hard_dice_stats(rng):
    logits = np.full((1, 3, 4, 4), -10.0, dtype=np.float32)
    labels = rng.randint(0, 3, (1, 1, 4, 4))
    # make prediction perfect
    for c in range(3):
        logits[0, c][labels[0, 0] == c] = 10.0
    tp, fp, fn = hard_dice_stats(jnp.asarray(logits), jnp.asarray(labels), 3, False)
    assert tp.shape == (2,)
    assert float(fp.sum()) == 0 and float(fn.sum()) == 0
    for c in (1, 2):
        assert float(tp[c - 1]) == (labels == c).sum()


def test_ce_and_topk(rng):
    logits = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, (2, 8, 8)))
    ce = robust_cross_entropy(logits, labels)
    tk = topk_cross_entropy(logits, labels, k_percent=10)
    assert float(tk) >= float(ce)  # worst 10% >= mean


def test_schedulers():
    s = poly_lr(1e-2, 100)
    assert abs(s(0) - 1e-2) < 1e-9
    assert s(50) < s(10)
    assert s(99) > 0
    w = poly_lr_with_warmup(1e-2, 100, warmup_epochs=5)
    assert w(0) < w(4) <= 1e-2
    ps = per_step(s, steps_per_epoch=250)
    assert ps(0) == ps(249) == s(0)
    assert ps(250) == s(1)
