import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from nnuzoo_tpu.models.dynamic_unet import PlainConvUNet, ResidualEncoderUNet
from nnuzoo_tpu.models.registry import get_model_builder
from nnuzoo_tpu.plans.plans_handler import PlansManager


def _arch_kwargs_2d():
    return {
        "n_stages": 4,
        "features_per_stage": [8, 16, 32, 64],
        "kernel_sizes": [[3, 3]] * 4,
        "strides": [[1, 1], [2, 2], [2, 2], [2, 2]],
        "n_conv_per_stage": [2, 2, 2, 2],
        "n_conv_per_stage_decoder": [2, 2, 2],
    }


def _arch_kwargs_3d():
    return {
        "n_stages": 3,
        "features_per_stage": [8, 16, 32],
        "kernel_sizes": [[1, 3, 3], [3, 3, 3], [3, 3, 3]],
        "strides": [[1, 1, 1], [1, 2, 2], [2, 2, 2]],
        "n_conv_per_stage": [2, 2, 2],
        "n_conv_per_stage_decoder": [2, 2],
    }


class TestPlainConvUNet:
    def test_2d_shapes(self, rng):
        model = PlainConvUNet(arch_kwargs=_arch_kwargs_2d(), num_classes=3)
        x = jnp.asarray(rng.rand(2, 32, 32, 1).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert len(outs) == 3  # deep supervision at 3 decoder scales
        assert outs[0].shape == (2, 32, 32, 3)
        assert outs[1].shape == (2, 16, 16, 3)
        assert outs[2].shape == (2, 8, 8, 3)

    def test_2d_no_ds(self, rng):
        model = PlainConvUNet(arch_kwargs=_arch_kwargs_2d(), num_classes=2,
                              deep_supervision=False)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert len(outs) == 1 and outs[0].shape == (1, 32, 32, 2)

    def test_3d_anisotropic_strides(self, rng):
        model = PlainConvUNet(arch_kwargs=_arch_kwargs_3d(), num_classes=2)
        x = jnp.asarray(rng.rand(1, 8, 16, 16, 2).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert outs[0].shape == (1, 8, 16, 16, 2)
        assert outs[1].shape == (1, 8, 8, 8, 2)

    def test_residual_encoder(self, rng):
        kw = _arch_kwargs_2d()
        kw["n_blocks_per_stage"] = [1, 2, 2, 2]
        model = ResidualEncoderUNet(arch_kwargs=kw, num_classes=2)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert outs[0].shape == (1, 32, 32, 2)


class TestU2Net:
    @pytest.mark.parametrize("small", [True, False])
    def test_shapes(self, rng, small):
        from nnuzoo_tpu.models.u2net import U2Net
        model = U2Net(num_classes=2, small=small)
        x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(params, x)
        assert len(outs) == 7  # d0 + 6 side outputs
        for o in outs:
            assert o.shape == (1, 64, 64, 2)  # all full res


def test_registry_resolves():
    b = get_model_builder("nnUNetTrainer")
    assert b is not None
    b2 = get_model_builder("nnUNetTrainerU2NetP")
    assert b2 is not None
    b3 = get_model_builder("nnUNetTrainer_10Percent")
    assert b3 is b
    with pytest.raises(RuntimeError, match="No model registered"):
        get_model_builder("nnUNetTrainerDoesNotExist")


class TestDropPathAndShiftMasks:
    def test_drop_path_stochastic_and_identity(self):
        from nnuzoo_tpu.models.layers import DropPath
        x = jnp.ones((64, 4, 4, 2))
        dp = DropPath(0.5)
        params = dp.init(jax.random.PRNGKey(0), x)
        # deterministic -> identity
        np.testing.assert_array_equal(dp.apply(params, x, True), x)
        # no rng supplied -> identity (graceful degradation)
        np.testing.assert_array_equal(dp.apply(params, x, False), x)
        # train + rng -> per-sample drop with 1/(1-p) rescale
        y = dp.apply(params, x, False, rngs={"dropout": jax.random.PRNGKey(1)})
        y = np.asarray(y)
        per_sample = y.reshape(64, -1)
        dropped = (per_sample == 0).all(1)
        kept = (per_sample == 2.0).all(1)
        assert (dropped | kept).all()
        assert dropped.any() and kept.any()
        # expectation preserved roughly
        assert abs(y.mean() - 1.0) < 0.3

    def test_shift_mask_nd_matches_2d(self):
        from nnuzoo_tpu.models.attention import (_shift_attn_mask,
                                                 _shift_attn_mask_nd)
        m2d = _shift_attn_mask(8, 8, 4, 2)
        mnd = _shift_attn_mask_nd((8, 8), (4, 4), (2, 2))
        np.testing.assert_array_equal(np.asarray(m2d), np.asarray(mnd))
        assert m2d.shape == (4, 16, 16)
        assert set(np.unique(np.asarray(m2d))) <= {0.0, -100.0}

    def test_shift_mask_3d(self):
        from nnuzoo_tpu.models.attention import _shift_attn_mask_nd
        m = _shift_attn_mask_nd((8, 8, 8), (4, 4, 4), (2, 2, 2))
        m = np.asarray(m)
        assert m.shape == (8, 64, 64)
        # diagonal (self-attention) is never masked
        for w in range(8):
            np.testing.assert_array_equal(np.diag(m[w]), 0.0)
        # the corner window mixes all 8 regions -> has masked pairs
        assert (m[-1] == -100.0).any()
        # unshifted axis contributes no bands
        m_partial = _shift_attn_mask_nd((8, 8, 8), (4, 4, 4), (2, 0, 0))
        assert (np.asarray(m_partial)[0] == 0).all()

    def test_swinblock_nd_3d_shifted_runs(self):
        from nnuzoo_tpu.models.attention import SwinBlockND
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(1, 8, 8, 8, 16).astype(np.float32))
        blk_shift = SwinBlockND(num_heads=2, window=4, shift=2)
        p = blk_shift.init(jax.random.PRNGKey(0), x)
        y = blk_shift.apply(p, x, train=False)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()
        # shifted block differs from unshifted with identical params
        blk_plain = SwinBlockND(num_heads=2, window=4, shift=0)
        y0 = blk_plain.apply(p, x, train=False)
        assert not np.allclose(np.asarray(y), np.asarray(y0))

    def test_vssblock_droppath_train_stochastic(self):
        from nnuzoo_tpu.models.ss2d import VSSBlock
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(4, 8, 8, 8).astype(np.float32))
        blk = VSSBlock(hidden_dim=8, drop_path=0.5)
        p = blk.init(jax.random.PRNGKey(0), x)
        y1 = blk.apply(p, x, True, rngs={"dropout": jax.random.PRNGKey(1)})
        y2 = blk.apply(p, x, True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(y1), np.asarray(y2))
        # eval mode is deterministic and rng-free
        ye1 = blk.apply(p, x, False)
        ye2 = blk.apply(p, x, False)
        np.testing.assert_array_equal(np.asarray(ye1), np.asarray(ye2))


def test_patch_merging_odd_dims_truncate():
    """PatchMerging2D on odd spatial dims truncates to floor(dim/scale)
    (reference `m2net.py:249-265` SHAPE_FIX)."""
    from nnuzoo_tpu.models.vssm import PatchMerging2D
    x = jnp.asarray(np.random.RandomState(0).rand(1, 7, 9, 4)
                    .astype(np.float32))
    pm = PatchMerging2D(4, 2)
    p = pm.init(jax.random.PRNGKey(0), x)
    y = pm.apply(p, x)
    assert y.shape == (1, 3, 4, 8)
    # even dims unchanged behavior
    x2 = x[:, :6, :8]
    y2 = pm.apply(p, x2)
    assert y2.shape == (1, 3, 4, 8)
