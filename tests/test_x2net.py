import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from nnuzoo_tpu.models.ssnd import SSND
from nnuzoo_tpu.models.x2net import (MUND, PatchExpandND, PatchMergingND, X2Net,
                                     get_stage_scales)


class TestNDPatchOps:
    def test_merge_expand_3d(self, rng):
        x = jnp.asarray(rng.rand(1, 4, 8, 8, 6).astype(np.float32))
        m = PatchMergingND(6, (1, 2, 2), 12)
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == (1, 4, 4, 4, 12)
        e = PatchExpandND(12, (1, 2, 2), output_dim=6)
        z = e.apply(e.init(jax.random.PRNGKey(0), y), y)
        assert z.shape == (1, 4, 8, 8, 6)

    def test_stage_scales_anisotropic(self):
        scales = get_stage_scales((5.0, 1.0, 1.0), 3, 4)
        assert scales[0] == (1, 2, 2)
        assert scales[1] == (1, 2, 2)
        # once in-plane spacing catches up, z participates
        assert 2 in [s[0] for s in scales[2:]]

    def test_stage_scales_isotropic(self):
        assert get_stage_scales(None, 2, 3) == [(2, 2)] * 3


def test_ssnd_3d(rng):
    m = SSND(d_model=8, spatial_dims=3, d_state=4)
    x = jnp.asarray(rng.rand(1, 4, 6, 6, 8).astype(np.float32))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_mund(rng):
    m = MUND(mid_ch=8, out_ch=16, n_layers=3, mixer="mamba_alt", spatial_dims=2)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 8, 8, 16)


@pytest.mark.parametrize("mixer", ["swin", "vit", "mamba_alt", "mamba2",
                                   "mamba_nd"])
def test_x2net_2d(rng, mixer):
    m = X2Net(num_classes=2, mixer=mixer, spatial_dims=2,
              stage_out=(8, 8, 8, 8), stage_mid=(4, 4, 4, 4),
              bottleneck=16, bottleneck_mid=8, stage_layers=(3, 3, 3, 3))
    x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert len(outs) == 7
    assert outs[0].shape == (1, 32, 32, 2)
    assert outs[2].shape == (1, 16, 16, 2)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_x2net_3d_ssnd(rng):
    m = X2Net(num_classes=2, mixer="ssnd", spatial_dims=3,
              stage_out=(8, 8, 8, 8), stage_mid=(8, 8, 8, 8),
              bottleneck=16, bottleneck_mid=8, stage_layers=(3, 3, 3, 3),
              spacing=None)
    x = jnp.asarray(rng.rand(1, 32, 32, 32, 1).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert outs[0].shape == (1, 32, 32, 32, 2)


def test_registry():
    from nnuzoo_tpu.models.registry import get_model_builder
    for t in ("nnUNetTrainerSwT2Net", "nnUNetTrainerUNETR2Net",
              "nnUNetTrainerLM2Net", "nnUNetTrainerLightMamba2Net",
              "nnUNetTrainerSSND2Net", "nnUNetTrainerMambaND2Net"):
        assert get_model_builder(t) is not None
