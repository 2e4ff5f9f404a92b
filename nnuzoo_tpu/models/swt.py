"""Swin-Transformer U-Nets.

- SwinTransformerUnet ("SwT", reference `nnunetv2/nets/swt.py:28-559`): Swin-Unet —
  patch-embed 4, [SwinBlock x2 -> PatchMerging] encoder, mirrored PatchExpand
  decoder with skip concat, final 4x expand + 1x1 head. 2D.
- SwinUNETR (reference uses monai `SwinUNETR` directly,
  `nnUNetTrainerSwUNETR.py:38-46`, feature_size 48): Swin encoder stages feeding a
  UNETR-style residual conv decoder. 2D here (the benchmark configs are 2d).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .attention import SwinBlock
from .layers import ConvNormAct, TransposedConvUp
from .registry import register_model
from .unetr import UnetrBasicBlock, UnetrUpBlock
from .vssm import PatchEmbed2D, PatchExpand, PatchMerging2D


class SwinStage(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window: int = 7
    drop_path: tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinBlock(self.num_heads, self.window,
                          shift=0 if i % 2 == 0 else self.window // 2,
                          drop_path=dp,
                          name=f"block{i}")(x, train=train)
        return x


class SwinTransformerUnet(nn.Module):
    num_classes: int
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    patch: int = 4
    deep_supervision: bool = False
    drop_path_rate: float = 0.1  # reference `swt.py:32` linspace schedule

    @nn.compact
    def __call__(self, x, train: bool = True):
        dims = [self.embed_dim * 2 ** i for i in range(len(self.depths))]
        h = PatchEmbed2D(self.patch, self.embed_dim, name="patch_embed")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * j / max(1, total - 1)
               for j in range(total)]

        def stage_dpr(i):
            lo = sum(self.depths[:i])
            return tuple(dpr[lo:lo + self.depths[i]])

        skips = []
        for i, depth in enumerate(self.depths):
            h = SwinStage(dims[i], depth, self.num_heads[i], self.window,
                          stage_dpr(i), name=f"enc{i}")(h, train=train)
            skips.append(h)
            if i < len(self.depths) - 1:
                h = PatchMerging2D(dims[i], 2, dims[i + 1], name=f"down{i}")(h)

        for i in range(len(self.depths) - 2, -1, -1):
            h = PatchExpand(dims[i + 1], 2, output_dim=dims[i + 1],
                            name=f"expand{i}")(h)
            h = jnp.concatenate([h, skips[i]], -1)
            h = nn.Dense(dims[i], name=f"concat_back{i}")(h)
            h = SwinStage(dims[i], self.depths[i], self.num_heads[i],
                          self.window, stage_dpr(i),
                          name=f"dec{i}")(h, train=train)

        # final patch-size upsample back to input resolution
        h = PatchExpand(dims[0], self.patch, output_dim=None, name="final_expand")(h)
        logits = nn.Conv(self.num_classes, (1, 1), name="out")(h)
        return [logits.astype(jnp.float32)]


class SwinStageND(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window: int = 7
    drop_path: tuple = ()

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .attention import SwinBlockND
        for i in range(self.depth):
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinBlockND(self.num_heads, self.window,
                            shift=0 if i % 2 == 0 else self.window // 2,
                            drop_path=dp,
                            name=f"block{i}")(x, train=train)
        return x


class SwinUNETR(nn.Module):
    """2D and 3D (monai SwinUNETR parity; 3D uses window 7^dim attention)."""
    num_classes: int
    spatial_dims: int = 2
    feature_size: int = 48
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .x2net import PatchMergingND
        sd = self.spatial_dims
        f = self.feature_size
        dims = [f * 2 ** i for i in range(4)]
        h = nn.Conv(f, (2,) * sd, strides=(2,) * sd, name="patch_embed_conv")(x)
        h = nn.LayerNorm(name="patch_embed_norm")(h)

        swin_feats = []
        for i, depth in enumerate(self.depths):
            h = SwinStageND(dims[i], depth, self.num_heads[i], self.window,
                            name=f"swin{i}")(h, train=train)
            swin_feats.append(h)
            if i < len(self.depths) - 1:
                h = PatchMergingND(dims[i], (2,) * sd, dims[i + 1],
                                   name=f"down{i}")(h)

        enc0 = UnetrBasicBlock(f, sd, name="encoder0")(x)              # /1
        enc1 = UnetrBasicBlock(f, sd, name="encoder1")(swin_feats[0])  # /2
        enc2 = UnetrBasicBlock(2 * f, sd, name="encoder2")(swin_feats[1])
        enc3 = UnetrBasicBlock(4 * f, sd, name="encoder3")(swin_feats[2])
        bottleneck = UnetrBasicBlock(8 * f, sd, name="encoder4")(swin_feats[3])

        d = UnetrUpBlock(4 * f, sd, name="decoder4")(bottleneck, enc3)
        d = UnetrUpBlock(2 * f, sd, name="decoder3")(d, enc2)
        d = UnetrUpBlock(f, sd, name="decoder2")(d, enc1)
        d = UnetrUpBlock(f, sd, name="decoder1")(d, enc0)
        logits = nn.Conv(self.num_classes, (1,) * sd, name="out")(d)
        return [logits.astype(jnp.float32)]


def get_swt_from_plans(plans_manager, dataset_json, configuration_manager,
                       num_input_channels, deep_supervision=False, dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    assert len(configuration_manager.patch_size) == 2, "SwT is 2D-only"
    return SwinTransformerUnet(num_classes=label_manager.num_segmentation_heads)


def get_swin_unetr_from_plans(plans_manager, dataset_json, configuration_manager,
                              num_input_channels, deep_supervision=False,
                              dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    return SwinUNETR(num_classes=label_manager.num_segmentation_heads,
                     spatial_dims=dim)


register_model("nnUNetTrainerSwinTransformerUnet", get_swt_from_plans)
register_model("nnUNetTrainerSwUNETR", get_swin_unetr_from_plans)
