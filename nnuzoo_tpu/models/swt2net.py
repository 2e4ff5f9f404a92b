"""SwT2Net — the X2Net family member whose per-stage sub-networks are full
mini Swin-Unets (reference: `nnunetv2/nets/swt2net.py:743-1150`).

Each stage: conv patch embedding (patch 4/4/2/1 across the outer stages), four
Swin encoder levels with depths (2,2,4,2) and PatchMerging between them, a
mirrored Swin decoder with PatchExpanding + skip-concat Linears, a final
patch-size expand back to stage resolution, a bias-free 1x1 head, and a
depthwise-separable conv input residual (``add_last``). Stages 5/6 and 5d are
depthwise-separable RSU4F conv blocks (no dilation — the reference's
get_dwconv_layer drops it); the outer macro is the M2Net U with 1x1 side heads
and the fused d0 (sides at native resolutions + distributed outconv).

Robustness deviation: when inner PatchMerging truncates an odd dimension, the
reference's decoder concat crashes (`swt2net.py:833-841` only crops the larger
side); we zero-pad the upsampled map to the skip's spatial shape instead, so
non-power-of-two patch sizes (e.g. 224 = 4*56 -> ...7 -> 3) train fine.
"""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import resize_linear
from .m2net import _DistributedOutConv, _maxpool2_ceil
from .registry import register_model
from .swt import SwinStage
from .lm2net import DWRSU4F
from .vssm import PatchEmbed2D, PatchExpand, PatchMerging2D


class FinalPatchExpanding(nn.Module):
    """Linear(dim -> patch^2 * dim) + depth-to-space + LN — keeps the channel
    count across the final upsample (reference `swt2net.py:481-493`), unlike
    PatchExpand which halves it."""
    dim: int
    patch: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch
        x = nn.Dense(p * p * self.dim, use_bias=False, name="expand")(x)
        x = x.reshape(B, H, W, p, p, self.dim)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            B, H * p, W * p, self.dim)
        return nn.LayerNorm(name="norm")(x)


def _pad_or_crop_to(x, spatial):
    """Match x's spatial dims to ``spatial`` (zero-pad or crop per axis)."""
    H, W = x.shape[1], x.shape[2]
    th, tw = spatial
    if H > th or W > tw:
        x = x[:, :min(H, th), :min(W, tw)]
    ph, pw = th - x.shape[1], tw - x.shape[2]
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x


class MiniSwinUnet(nn.Module):
    """One SwT2Net stage (reference `swt2net.py:743-871`)."""
    out_ch: int
    embed_dim: int
    patch: int
    depths: Tuple[int, ...] = (2, 2, 4, 2)
    num_heads: Tuple[int, ...] = (2, 2, 4, 8)
    window: int = 7
    drop_path_rate: float = 0.1
    add_last: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = len(self.depths)
        dims = [self.embed_dim * 2 ** i for i in range(n)]
        if self.add_last:
            h = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                        feature_group_count=x.shape[-1], use_bias=False,
                        name="rebnconvin_dw")(x)
            last_add = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                               name="rebnconvin_pw")(h)

        h = PatchEmbed2D(self.patch, self.embed_dim, name="patch_embed")(x)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * j / max(1, total - 1)
               for j in range(total)]

        def stage_dpr(i):
            lo = sum(self.depths[:i])
            return tuple(dpr[lo:lo + self.depths[i]])

        # encoder: skips are the stage INPUTS (reference x_save,
        # `swt2net.py:845-849`)
        skips = []
        for i in range(n):
            skips.append(h)
            h = SwinStage(dims[i], self.depths[i], self.num_heads[i],
                          self.window, stage_dpr(i), name=f"enc{i}")(
                h, train=train)
            if i < n - 1:
                h = PatchMerging2D(dims[i], 2, name=f"down{i}")(h)

        h = PatchExpand(dims[-1], 2, output_dim=None, name="first_expand")(h)
        for i in range(n - 1):
            idx = n - 2 - i
            skip = skips[idx]
            h = _pad_or_crop_to(h, skip.shape[1:3])
            h = nn.Dense(dims[idx], name=f"concat_back{i}")(
                jnp.concatenate([h, skip], -1))
            h = SwinStage(dims[idx], self.depths[idx], self.num_heads[idx],
                          self.window, stage_dpr(idx), name=f"up{i}")(
                h, train=train)
            if i < n - 2:
                h = PatchExpand(dims[idx], 2, output_dim=None,
                                name=f"expand{i}")(h)

        h = nn.LayerNorm(name="norm_up")(h)
        h = FinalPatchExpanding(self.embed_dim, self.patch,
                                name="final_expand")(h)
        h = _pad_or_crop_to(h, x.shape[1:3])
        out = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="head")(h)
        if self.add_last:
            out = out + last_add
        return out


# (patch, embed_dim, depths, num_heads) per stage (reference
# `swt2net.py:916-1058`; the decoder mirrors the encoder table)
_SWT_TABLE = {
    "stage1": (4, 32, (2, 2, 4, 2), (2, 2, 4, 8)),
    "stage2": (4, 64, (2, 2, 4, 2), (2, 4, 8, 16)),
    "stage3": (2, 96, (2, 2, 4, 2), (3, 6, 12, 24)),
    "stage4": (1, 96, (2, 2, 4, 2), (3, 6, 12, 24)),
}


def _mini_swin(key, out_ch, name):
    p, e, d, h = _SWT_TABLE[key]
    return MiniSwinUnet(out_ch=out_ch, embed_dim=e, patch=p, depths=d,
                        num_heads=h, name=name)


class SwT2Net(nn.Module):
    num_classes: int
    deep_supervision: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        full_res = x.shape[1:3]

        hx1 = _mini_swin("stage1", 32, "stage1")(x, train)
        hx = PatchMerging2D(32, 2, name="patch_merging1")(hx1)          # 64
        hx2 = _mini_swin("stage2", 64, "stage2")(hx, train)
        hx = PatchMerging2D(64, 2, name="patch_merging2")(hx2)          # 128
        hx3 = _mini_swin("stage3", 128, "stage3")(hx, train)
        hx = PatchMerging2D(128, 2, name="patch_merging3")(hx3)         # 256
        hx4 = _mini_swin("stage4", 256, "stage4")(hx, train)
        hx = PatchMerging2D(256, 2, name="patch_merging4")(hx4)         # 512
        # dw-separable RSU4F (reference swt2net.py:346-358 REBNCONV
        # wraps get_dwconv_layer, like lm2net's)
        hx5 = DWRSU4F(256, 512, name="stage5")(hx)
        hx = _maxpool2_ceil(hx5)
        hx6 = DWRSU4F(256, 512, name="stage6")(hx)
        hx6up = resize_linear(hx6, hx5.shape[1:3], 2)

        hx5d = DWRSU4F(256, 512, name="stage5d")(
            jnp.concatenate([hx6up, hx5], -1))
        up = PatchExpand(512, 2, name="patch_expand4d")(hx5d)           # 256
        up = nn.Dense(256, name="concat_back_dim4d")(
            jnp.concatenate([up, hx4], -1))
        hx4d = _mini_swin("stage4", 256, "stage4d")(up, train)
        up = PatchExpand(256, 2, name="patch_expand3d")(hx4d)          # 128
        up = nn.Dense(128, name="concat_back_dim3d")(
            jnp.concatenate([up, hx3], -1))
        hx3d = _mini_swin("stage3", 128, "stage3d")(up, train)
        up = PatchExpand(128, 2, name="patch_expand2d")(hx3d)          # 64
        up = nn.Dense(64, name="concat_back_dim2d")(
            jnp.concatenate([up, hx2], -1))
        hx2d = _mini_swin("stage2", 64, "stage2d")(up, train)
        up = PatchExpand(64, 2, name="patch_expand1d")(hx2d)           # 32
        up = nn.Dense(32, name="concat_back_dim1d")(
            jnp.concatenate([up, hx1], -1))
        hx1d = _mini_swin("stage1", 32, "stage1d")(up, train)

        # 1x1 side heads (reference `swt2net.py:1060-1067`)
        feats = [hx1d, hx2d, hx3d, hx4d, hx5d, hx6]
        sides = [nn.Conv(self.num_classes, (1, 1), name=f"side{i + 1}")(f)
                 for i, f in enumerate(feats)]
        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            sides, full_res)
        outs = [o.astype(jnp.float32) for o in [d0] + sides]
        return outs if self.deep_supervision else [outs[0]]


def get_swt2net_from_plans(plans_manager, dataset_json, configuration_manager,
                           num_input_channels, deep_supervision=True,
                           dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    assert len(configuration_manager.patch_size) == 2, "SwT2Net is 2D-only"
    return SwT2Net(num_classes=label_manager.num_segmentation_heads,
                   deep_supervision=deep_supervision)


register_model("nnUNetTrainerSwT2Net", get_swt2net_from_plans)
