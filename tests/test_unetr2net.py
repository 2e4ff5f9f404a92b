"""UNETR2Net (faithful per-stage mini-UNETR rebuild, reference
`nnunetv2/nets/unetr2net.py:1026-1344`): stage tables, side-output scales
(d6 at 1/16, NOT 1/32), and DS loss compatibility with the x2net target
scales via the zero-weight skip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_forward_shapes_and_side_scales(rng):
    from nnuzoo_tpu.models.unetr2net import UNETR2Net

    model = UNETR2Net(num_classes=3, spatial_dims=2, deep_supervision=True)
    x = jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x, train=False)
    assert len(outs) == 7
    # d0/d1 full, d2 1/2, d3 1/4, d4 1/8, d5 1/16, d6 1/16 (stage5->6 keeps
    # resolution; reference patch_merging5 scale (1,1))
    expect = [(64, 64), (64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (4, 4)]
    for o, e in zip(outs, expect):
        assert o.shape == (1, *e, 3), (o.shape, e)

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # the reference model is ~117M params (ViT stacks with mlp_dim 3072 at
    # hidden 96-384); the rebuild must be in the same class, not a toy
    assert 80e6 < n_params < 160e6, n_params


def test_ds_loss_skips_mismatched_deepest(rng):
    """With the x2net DS scales (deepest target at 1/32) the zero-weighted d6
    (at 1/16) must never be evaluated — the loss computes without error."""
    from nnuzoo_tpu.training.losses import (deep_supervision_loss,
                                            dice_ce_loss,
                                            get_deep_supervision_weights)

    outs = [jnp.zeros((1, 3, *s)) for s in
            [(64, 64), (64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (4, 4)]]
    # x2net targets: full, full, /2, /4, /8, /16, /32 -- last mismatches d6
    tgts = [jnp.zeros((1, 1, *s), jnp.int32) for s in
            [(64, 64), (64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (2, 2)]]
    w = get_deep_supervision_weights(7)
    assert w[-1] == 0.0
    loss = deep_supervision_loss(
        lambda o, t: dice_ce_loss(o, t, batch_dice=True), outs, tgts, w)
    assert np.isfinite(float(loss))


def test_mini_unetr_stage_tables():
    from nnuzoo_tpu.models.unetr2net import _DEC_TABLE, _ENC_TABLE

    # reference `unetr2net.py:1040-1140` (encoder) and :1162-1232 (decoder)
    assert _ENC_TABLE["stage1"] == (4, 96, 7, 16, (2, 1, 0), (2, 2, 2, 2))
    assert _ENC_TABLE["stage4"] == (8, 384, 4, 4, (1, 1, 0), (2, 2, 1, 1))
    assert _DEC_TABLE["stage3d"] == (4, 384, 5, 4, (1, 1, 0), (2, 2, 1, 1))
    assert _DEC_TABLE["stage2d"] == (4, 192, 6, 8, (2, 1, 0), (2, 2, 2, 1))
