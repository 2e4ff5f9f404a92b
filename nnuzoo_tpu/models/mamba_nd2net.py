"""MambaND2Net — the X2Net family member whose per-stage sub-networks are
patchified mini UNETR-skeleton nets with a MambaND token core (reference:
`nnunetv2/nets/mamba_nd2net.py:1055-1290` mini, `:1598-1905` outer).

The stage tables (feature_size / hidden / num_layers / patch / encoder_layers
/ decoder_scale) are IDENTICAL to UNETR2Net's (`mamba_nd2net.py:1610-1793` vs
`unetr2net.py:1026-1232`); the differences are all in the mini:
no ``add_last`` dwconv residual, no position embeddings, no final LayerNorm,
and the ViT stack is replaced by :class:`~.unetr2net.MambaNDStack` — Mamba
blocks whose flattening axis-order rotates every two layers and whose odd
layers scan reversed. Outer downsampling uses the odd-axis-gated size-derived
scale plan (`mamba_nd2net.py:1294-1330` ``get_scales``), stage5->6 keeps
resolution (merging scale 1), and side heads are 1x1.
"""

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import pad_to_match
from .lm2net import ref_get_scales
from .m2net import _DistributedOutConv
from .registry import register_model
from .unetr2net import _DEC_TABLE, _ENC_TABLE, MiniUNETR
from .x2net import PatchExpandND, PatchMergingND


def _mini(table, key, out_ch, dim, name):
    f, hid, nl, p, enc, dec = table[key]
    return MiniUNETR(out_ch=out_ch, feature_size=f, hidden_size=hid,
                     num_layers=nl, patch=p, dim=dim, encoder_layers=enc,
                     decoder_scale=dec, add_last=False, core="mamba_nd",
                     name=name)


class MambaND2Net(nn.Module):
    num_classes: int
    spatial_dims: int = 2
    deep_supervision: bool = True
    patch_size: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = self.spatial_dims
        full_res = x.shape[1:-1]
        ips = tuple(self.patch_size or full_res)
        scales = ref_get_scales(ips, 5, 1)

        # ------------------------------ encoder
        hx1 = _mini(_ENC_TABLE, "stage1", 32, dim, "stage1")(x, train)
        hx = PatchMergingND(32, scales[0], 64, name="patch_merging1")(hx1)
        hx2 = _mini(_ENC_TABLE, "stage2", 64, dim, "stage2")(hx, train)
        hx = PatchMergingND(64, scales[1], 128, name="patch_merging2")(hx2)
        hx3 = _mini(_ENC_TABLE, "stage3", 128, dim, "stage3")(hx, train)
        hx = PatchMergingND(128, scales[2], 256, name="patch_merging3")(hx3)
        hx4 = _mini(_ENC_TABLE, "stage4", 256, dim, "stage4")(hx, train)
        hx = PatchMergingND(256, scales[3], 512, name="patch_merging4")(hx4)
        hx5 = _mini(_ENC_TABLE, "stage5", 512, dim, "stage5")(hx, train)
        # stage5 -> stage6 keeps resolution (reference merging scale (1,1,1),
        # `mamba_nd2net.py:1678-1681`)
        hx = PatchMergingND(512, (1,) * dim, 512, name="patch_merging5")(hx5)
        hx6 = _mini(_ENC_TABLE, "stage6", 512, dim, "stage6")(hx, train)

        # ------------------------------ decoder
        hx6up = PatchExpandND(512, (1,) * dim, output_dim=512,
                              name="patch_expand5d")(hx6)
        hx5d = _mini(_DEC_TABLE, "stage5d", 512, dim, "stage5d")(
            jnp.concatenate([hx6up, hx5], -1), train)
        up = PatchExpandND(512, scales[3], output_dim=256,
                           name="patch_expand4d")(hx5d)
        up = nn.Dense(256, name="concat_back_dim4d")(
            jnp.concatenate([pad_to_match(up, hx4.shape[1:-1]), hx4], -1))
        hx4d = _mini(_DEC_TABLE, "stage4d", 256, dim, "stage4d")(up, train)
        up = PatchExpandND(256, scales[2], output_dim=128,
                           name="patch_expand3d")(hx4d)
        up = nn.Dense(128, name="concat_back_dim3d")(
            jnp.concatenate([pad_to_match(up, hx3.shape[1:-1]), hx3], -1))
        hx3d = _mini(_DEC_TABLE, "stage3d", 128, dim, "stage3d")(up, train)
        up = PatchExpandND(128, scales[1], output_dim=64,
                           name="patch_expand2d")(hx3d)
        up = nn.Dense(64, name="concat_back_dim2d")(
            jnp.concatenate([pad_to_match(up, hx2.shape[1:-1]), hx2], -1))
        hx2d = _mini(_DEC_TABLE, "stage2d", 64, dim, "stage2d")(up, train)
        up = PatchExpandND(64, scales[0], output_dim=32,
                           name="patch_expand1d")(hx2d)
        up = nn.Dense(32, name="concat_back_dim1d")(
            jnp.concatenate([pad_to_match(up, hx1.shape[1:-1]), hx1], -1))
        hx1d = _mini(_DEC_TABLE, "stage1d", 32, dim, "stage1d")(up, train)

        # ------------------------------ heads (1x1 sides,
        # `mamba_nd2net.py:1796-1803`)
        feats = [hx1d, hx2d, hx3d, hx4d, hx5d, hx6]
        sides = [nn.Conv(self.num_classes, (1,) * dim, name=f"side{i + 1}")(f)
                 for i, f in enumerate(feats)]
        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            sides, full_res)
        outs = [o.astype(jnp.float32) for o in [d0] + sides]
        return outs if self.deep_supervision else [outs[0]]


def get_mamband2net_from_plans(plans_manager, dataset_json,
                               configuration_manager, num_input_channels,
                               deep_supervision=True, dtype=None):
    # the reference's small_mode (MambaND2NetP) raises NotImplementedError
    # (`mamba_nd2net.py:1925-1935`) — no P variant exists to replicate
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    return MambaND2Net(num_classes=label_manager.num_segmentation_heads,
                       spatial_dims=dim, deep_supervision=deep_supervision,
                       patch_size=tuple(configuration_manager.patch_size))


register_model("nnUNetTrainerMambaND2Net", get_mamband2net_from_plans)
