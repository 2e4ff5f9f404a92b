"""Forward-shape smoke tests for the model zoo (tiny configs, CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def _run(model, x):
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    return outs


class TestMambaBlocks:
    def test_mamba_block(self, rng):
        from nnuzoo_tpu.models.mamba import MambaBlock
        m = MambaBlock(d_model=8, d_state=4)
        x = jnp.asarray(rng.rand(2, 10, 8).astype(np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(p, x)
        assert y.shape == x.shape

    def test_mamba_causality(self, rng):
        """Unidirectional mamba: changing a late token must not affect earlier
        outputs."""
        from nnuzoo_tpu.models.mamba import MambaBlock
        m = MambaBlock(d_model=8, d_state=4)
        x = jnp.asarray(rng.rand(1, 12, 8).astype(np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        y1 = m.apply(p, x)
        x2 = x.at[0, 9].set(5.0)
        y2 = m.apply(p, x2)
        assert np.allclose(np.asarray(y1[0, :9]), np.asarray(y2[0, :9]), atol=1e-5)
        assert not np.allclose(np.asarray(y1[0, 9:]), np.asarray(y2[0, 9:]))

    def test_bimamba(self, rng):
        from nnuzoo_tpu.models.mamba import MambaBlock
        m = MambaBlock(d_model=8, d_state=4, bimamba_type="v2")
        x = jnp.asarray(rng.rand(1, 12, 8).astype(np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        y1 = m.apply(p, x)
        # bidirectional: late change DOES affect early outputs
        y2 = m.apply(p, x.at[0, 9].set(5.0))
        assert not np.allclose(np.asarray(y1[0, :9]), np.asarray(y2[0, :9]))

    def test_mamba2(self, rng):
        from nnuzoo_tpu.models.mamba import Mamba2Block
        m = Mamba2Block(d_model=16, d_state=8, headdim=8)
        x = jnp.asarray(rng.rand(1, 10, 16).astype(np.float32))
        p = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(p, x)
        assert y.shape == x.shape


class TestAttention:
    def test_vit_block(self, rng):
        from nnuzoo_tpu.models.attention import ViTBlock
        m = ViTBlock(num_heads=2)
        x = jnp.asarray(rng.rand(2, 16, 8).astype(np.float32))
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == x.shape

    def test_swin_block_shift(self, rng):
        from nnuzoo_tpu.models.attention import SwinBlock
        x = jnp.asarray(rng.rand(1, 14, 14, 8).astype(np.float32))
        m = SwinBlock(num_heads=2, window=7, shift=3)
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == x.shape

    def test_swin_block_pads_nonmultiple(self, rng):
        from nnuzoo_tpu.models.attention import SwinBlock
        x = jnp.asarray(rng.rand(1, 10, 12, 8).astype(np.float32))
        m = SwinBlock(num_heads=2, window=7, shift=0)
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == x.shape


class TestModels:
    def test_unetr(self, rng):
        from nnuzoo_tpu.models.unetr import UNETR
        m = UNETR(num_classes=3, dim=2, feature_size=4, hidden_size=32,
                  mlp_dim=64, num_heads=2, num_layers=4, patch=16)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 32, 32, 3)

    def test_swt(self, rng):
        from nnuzoo_tpu.models.swt import SwinTransformerUnet
        m = SwinTransformerUnet(num_classes=2, embed_dim=8,
                                depths=(2, 2), num_heads=(2, 2), window=4)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 32, 32, 2)

    def test_swin_unetr(self, rng):
        from nnuzoo_tpu.models.swt import SwinUNETR
        m = SwinUNETR(num_classes=2, feature_size=4, depths=(1, 1, 1, 1),
                      num_heads=(1, 2, 2, 2), window=4)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 32, 32, 2)

    def test_light_munet_2d(self, rng):
        from nnuzoo_tpu.models.light_munet import LightMUNet
        m = LightMUNet(num_classes=2, dim=2, init_filters=4,
                       blocks_down=(1, 1, 1), blocks_up=(1, 1))
        x = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 16, 16, 2)

    def test_light_munet_3d(self, rng):
        from nnuzoo_tpu.models.light_munet import LightMUNet
        m = LightMUNet(num_classes=2, dim=3, init_filters=4,
                       blocks_down=(1, 1), blocks_up=(1,))
        x = jnp.asarray(rng.rand(1, 8, 8, 8, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 8, 8, 8, 2)

    def test_swin_umamba(self, rng):
        from nnuzoo_tpu.models.swin_umamba import SwinUMamba
        m = SwinUMamba(num_classes=2, feat_size=(4, 8, 16, 32, 64))
        # backbone needs /64 divisibility (stem /2 + patch 2 + 3 merges)
        x = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
        outs = _run(m, x)
        assert len(outs) == 4
        assert outs[0].shape == (1, 64, 64, 2)
        assert outs[1].shape == (1, 32, 32, 2)

    def test_segmamba(self, rng):
        from nnuzoo_tpu.models.seg_mamba import SegMamba
        m = SegMamba(num_classes=2, dim=2, feat_size=(4, 8, 16, 32),
                     hidden_size=32)
        x = jnp.asarray(rng.rand(1, 32, 32, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 32, 32, 2)

    def test_all_registered(self):
        from nnuzoo_tpu.models.registry import get_model_builder
        for name in ("nnUNetTrainerUNETR", "nnUNetTrainerSwinTransformerUnet",
                     "nnUNetTrainerSwUNETR", "nnUNetTrainerSwinUMamba",
                     "nnUNetTrainerSwinUMambaD", "nnUNetTrainerLightMUNet",
                     "nnUNetTrainerLightSS2DMambaUNet", "nnUNetTrainerSegMamba"):
            assert get_model_builder(name) is not None


class TestSwin3D:
    def test_window_partition_nd_roundtrip(self, rng):
        from nnuzoo_tpu.models.attention import (window_partition_nd,
                                                 window_reverse_nd)
        x = jnp.asarray(rng.rand(2, 8, 8, 4, 6).astype(np.float32))
        wins = window_partition_nd(x, (4, 4, 2))
        assert wins.shape == (2 * 2 * 2 * 2, 32, 6)
        back = window_reverse_nd(wins, (4, 4, 2), (8, 8, 4))
        assert np.allclose(np.asarray(back), np.asarray(x))

    def test_swin_block_3d(self, rng):
        from nnuzoo_tpu.models.attention import SwinBlockND
        x = jnp.asarray(rng.rand(1, 6, 6, 6, 8).astype(np.float32))
        m = SwinBlockND(num_heads=2, window=4)
        y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()

    def test_swin_unetr_3d(self, rng):
        from nnuzoo_tpu.models.swt import SwinUNETR
        m = SwinUNETR(num_classes=2, spatial_dims=3, feature_size=4,
                      depths=(1, 1, 1, 1), num_heads=(1, 2, 2, 2), window=4)
        x = jnp.asarray(rng.rand(1, 32, 32, 32, 1).astype(np.float32))
        outs = _run(m, x)
        assert outs[0].shape == (1, 32, 32, 32, 2)


def test_vmamba_pretrained_transfer(tmp_path):
    """load_vmamba_pretrained maps torch VMamba keys onto the flax
    vssm_encoder (reference `SwinUMamba.py:637-668`)."""
    import torch
    import jax
    import jax.numpy as jnp
    from nnuzoo_tpu.models.swin_umamba import (SwinUMamba,
                                               load_vmamba_pretrained)

    model = SwinUMamba(num_classes=2, deep_supervision=False)
    x = jnp.zeros((1, 64, 64, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    enc = params["params"]["vssm_encoder"]
    rng = np.random.RandomState(0)

    # fabricate a VMamba-style torch checkpoint from the flax shapes
    sd = {}
    blk = enc["layer0"]["block0"]
    sa = blk["self_attention"]
    sd["layers.0.blocks.0.ln_1.weight"] = torch.from_numpy(
        rng.rand(*blk["ln_1"]["scale"].shape).astype(np.float32))
    sd["layers.0.blocks.0.self_attention.in_proj.weight"] = torch.from_numpy(
        rng.rand(*sa["in_proj"]["kernel"].shape[::-1]).astype(np.float32))
    kh, kw, one, d = sa["conv2d"]["kernel"].shape
    sd["layers.0.blocks.0.self_attention.conv2d.weight"] = torch.from_numpy(
        rng.rand(d, one, kh, kw).astype(np.float32))
    sd["layers.0.blocks.0.self_attention.A_logs"] = torch.from_numpy(
        rng.rand(*sa["A_logs"].shape).astype(np.float32))
    sd["layers.0.blocks.0.self_attention.dt_projs_weight"] = torch.from_numpy(
        rng.rand(*sa["dt_projs_weight"].shape).astype(np.float32))
    red = enc["down0"]["reduction"]["kernel"]
    sd["layers.0.downsample.reduction.weight"] = torch.from_numpy(
        rng.rand(*red.shape[::-1]).astype(np.float32))
    # keys the reference skips
    sd["patch_embed.proj.weight"] = torch.zeros(96, 3, 4, 4)
    sd["head.weight"] = torch.zeros(1000, 768)

    ckpt_path = str(tmp_path / "vmamba_tiny.pth")
    torch.save({"model": sd}, ckpt_path)

    new_params, n = load_vmamba_pretrained(params, ckpt_path, verbose=False)
    assert n == 6
    new_enc = new_params["params"]["vssm_encoder"]
    nblk = new_enc["layer0"]["block0"]
    np.testing.assert_allclose(
        np.asarray(nblk["ln_1"]["scale"]),
        sd["layers.0.blocks.0.ln_1.weight"].numpy())
    np.testing.assert_allclose(          # Linear transpose
        np.asarray(nblk["self_attention"]["in_proj"]["kernel"]),
        sd["layers.0.blocks.0.self_attention.in_proj.weight"].numpy().T)
    np.testing.assert_allclose(          # depthwise conv layout
        np.asarray(nblk["self_attention"]["conv2d"]["kernel"]),
        sd["layers.0.blocks.0.self_attention.conv2d.weight"]
        .numpy().transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(new_enc["down0"]["reduction"]["kernel"]),
        sd["layers.0.downsample.reduction.weight"].numpy().T)
    # untouched tensors stay identical
    np.testing.assert_array_equal(
        np.asarray(nblk["self_attention"]["Ds"]),
        np.asarray(enc["layer0"]["block0"]["self_attention"]["Ds"]))
    # model still runs with the transferred params
    out = model.apply(new_params, x, train=False)
    assert np.isfinite(np.asarray(out[0])).all()
