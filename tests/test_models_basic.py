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
