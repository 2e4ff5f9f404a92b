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


class TestLM2NetFamily:
    """Faithful LM2Net / LightMamba2Net (per-stage mini LightMUNets with the
    reference stage tables, `lm2net.py:794-1365`, `light_mamba2net.py:784`)."""

    def test_ref_get_scales(self):
        from nnuzoo_tpu.models.lm2net import ref_get_scales, ref_scale_value
        # reference get_scales (`lm2net.py:1057`): odd axes and min_size gate
        # 224 halves 4x to 14; 14/2=7 < min_size=8 -> (1,1) at step 5
        # (so at patch 224 the reference LightMamba2Net's patch_merging5 is a
        # no-op downsample — faithful)
        s = ref_get_scales((224, 224), 5, min_size=8)
        assert s == [(2, 2)] * 4 + [(1, 1)]
        s = ref_get_scales((224, 14), 5, min_size=8)
        assert s[0] == (2, 1)  # 14/2=7 < 8 -> that axis never halves
        s = ref_get_scales((7, 56), 2, min_size=4)
        assert s == [(1, 2), (1, 2)]  # odd axis never halves
        assert ref_scale_value((224, 224), [(2, 2), (2, 2)]) == (56.0, 56.0)

    def test_mini_light_munet(self, rng):
        from nnuzoo_tpu.models.lm2net import MiniLightMUNet
        m = MiniLightMUNet(mid_ch=8, out_ch=16, n_layers=3, dim=2,
                           input_patch_size=(16, 16), add_last=True)
        x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = jax.jit(lambda p, x: m.apply(p, x))(params, x)
        assert y.shape == (1, 16, 16, 16)
        assert np.isfinite(np.asarray(y)).all()

    @pytest.mark.parametrize("m2", [False, True])
    def test_lm2net_small_variants(self, rng, m2):
        from nnuzoo_tpu.models.lm2net import LM2NetBase
        m = LM2NetBase(num_classes=2, dim=2, small=True, use_mamba2=m2,
                       patch_size=(16, 16))
        x = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(lambda p, x: m.apply(p, x, train=False))(params, x)
        assert len(outs) == 7
        assert outs[0].shape == (1, 16, 16, 2)
        assert outs[2].shape == (1, 8, 8, 2)
        for o in outs:
            assert np.isfinite(np.asarray(o)).all()

    @pytest.mark.parametrize("small,m2,side_k,ref_n", [
        # exact reference torch param counts at 224x224 in=1 classes=2,
        # measured via tests/ref_import.py stubs (see test_param_fidelity)
        (False, False, 1, 9_311_620),    # LM2Net
        (True, False, 1, 1_573_252),     # LM2NetP
        (False, True, 1, 34_627_446),    # LightMamba2Net
        (True, True, 3, 2_578_390),      # LightMamba2NetP
    ])
    def test_param_plan_matches_reference(self, small, m2, side_k, ref_n):
        import jax
        from nnuzoo_tpu.models.lm2net import LM2NetBase
        m = LM2NetBase(num_classes=2, dim=2, small=small, use_mamba2=m2,
                       side_kernel=side_k, patch_size=(224, 224))
        shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 224, 224, 1)))
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert abs(n / ref_n - 1) < 5e-3, (n, ref_n)


class TestSSND2NetFamily:
    """Faithful SSND2Net (per-stage mini SSND VSSM U-Nets, reference
    `ssnd2net.py:1143-1739`)."""

    def test_mini_mussnd(self, rng):
        from nnuzoo_tpu.models.ssnd2net import MUSSND
        m = MUSSND(mid_ch=8, out_ch=16, n_layers=3, dim=2,
                   input_patch_size=(16, 16), add_last=True)
        x = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = jax.jit(lambda p, x: m.apply(p, x, train=False))(params, x)
        assert y.shape == (1, 16, 16, 16)
        assert np.isfinite(np.asarray(y)).all()

    def test_mini_no_ips_keeps_resolution(self, rng):
        """Bottleneck minis receive no input_patch_size -> no internal
        downsampling (reference `ssnd2net.py:1193-1201`)."""
        from nnuzoo_tpu.models.ssnd2net import MUSSND
        m = MUSSND(mid_ch=8, out_ch=16, n_layers=4, dim=2,
                   input_patch_size=None, add_last=True)
        x = jnp.asarray(rng.rand(1, 6, 6, 8).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        y = jax.jit(lambda p, x: m.apply(p, x, train=False))(params, x)
        assert y.shape == (1, 6, 6, 16)

    def test_ssnd2net_small(self, rng):
        from nnuzoo_tpu.models.ssnd2net import SSND2Net
        m = SSND2Net(num_classes=2, dim=2, small=True, patch_size=(16, 16))
        x = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        outs = jax.jit(lambda p, x: m.apply(p, x, train=False))(params, x)
        assert len(outs) == 7
        assert outs[0].shape == (1, 16, 16, 2)
        for o in outs:
            assert np.isfinite(np.asarray(o)).all()

    def test_param_plan_full_vs_small(self):
        """Reference torch counts at 224x224 in=1 classes=3 (measured via
        tests/ref_import.py): SSND2Net 41.152M, SSND2NetP 1.985M. Ours is
        ~3.6% under — the reference carries dead per-decoder-stage seg heads
        (`ssnd2net.py:604-630` builds them unconditionally, forward uses only
        the last) we don't replicate."""
        from nnuzoo_tpu.models.ssnd2net import SSND2Net
        for small, ref_n in ((False, 41_152_000), (True, 1_985_000)):
            m = SSND2Net(num_classes=3, dim=2, small=small,
                         patch_size=(224, 224))
            shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                                    jnp.zeros((1, 224, 224, 1)))
            n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
            assert abs(n / ref_n - 1) < 0.05, (small, n, ref_n)


def test_decoder_pads_truncated_merges(rng):
    """Patch-merging floors odd dims (reference SHAPE_FIX); the decoders must
    pad back instead of crashing (the reference crashes on such inputs —
    `m2net.py:467` concatenates without shape handling)."""
    from nnuzoo_tpu.models.m2net import M2NetP
    m = M2NetP(num_classes=2, stage_layers=(2, 2, 2, 2))
    # 24 = 2^3 * 3 -> odd at depth 4 of the stage-1 mini U-Net
    x = jnp.asarray(rng.rand(1, 24, 24, 1).astype(np.float32))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(lambda p, x: m.apply(p, x, train=False))(params, x)
    assert outs[0].shape == (1, 24, 24, 2)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_ssnd2net_train_mode_droppath(rng):
    """Train-mode apply with a dropout rng exercises DropPath's non-deterministic
    branch — the SSND mini passes PER-BLOCK tuple rates into MixerLayer, which
    must slice them per block (regression: `1.0 - tuple` TypeError that broke
    the canonical SSND2Net train step)."""
    from nnuzoo_tpu.models.ssnd2net import SSND2Net

    m = SSND2Net(num_classes=2, dim=2, deep_supervision=True, small=True,
                 patch_size=(32, 32))
    x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x, train=True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(outs) == 7
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
