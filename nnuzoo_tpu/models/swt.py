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
from .layers import ConvNormAct, TransposedConvUp, pad_to_match
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


class FinalPatchExpanding(nn.Module):
    """Linear(dim -> patch^2 * dim, no bias) + depth-to-space + LN — keeps the
    channel count across the final upsample (reference `swt.py:243-256`),
    unlike PatchExpand which halves it."""
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


class SwinTransformerUnet(nn.Module):
    """Swin-Unet (reference `swt.py:28-160`). Faithful topology: the skip
    saved for each decoder stage is the encoder stage's INPUT (`swt.py:131-135`
    appends x_save BEFORE the blocks), the decoder PatchExpands halve channels,
    the first expand precedes the first concat, expands come AFTER each
    decoder stage's blocks (`BasicBlockUp`, `swt.py:466-504`), and the final
    norm_up + channel-keeping FinalPatchExpanding feed a bias-free 1x1 head."""
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
        n = len(self.depths)
        dims = [self.embed_dim * 2 ** i for i in range(n)]
        h = PatchEmbed2D(self.patch, self.embed_dim, name="patch_embed")(x)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * j / max(1, total - 1)
               for j in range(total)]

        def stage_dpr(i):
            lo = sum(self.depths[:i])
            return tuple(dpr[lo:lo + self.depths[i]])

        # encoder: skips are the stage INPUTS (reference x_save)
        skips = []
        for i, depth in enumerate(self.depths):
            skips.append(h)
            h = SwinStage(dims[i], depth, self.num_heads[i], self.window,
                          stage_dpr(i), name=f"enc{i}")(h, train=train)
            if i < n - 1:
                h = PatchMerging2D(dims[i], 2, name=f"down{i}")(h)

        h = PatchExpand(dims[-1], 2, output_dim=None, name="first_expand")(h)
        for i in range(n - 1):
            idx = n - 2 - i
            skip = skips[idx]
            # reference `pad` crops the upsampled side to the skip's spatial
            # (its PatchMerging pads odd dims so crop suffices there; our
            # merging truncates, so also zero-pad when short)
            h = h[:, :skip.shape[1], :skip.shape[2]]
            h = pad_to_match(h, skip.shape[1:-1])
            h = nn.Dense(dims[idx], name=f"concat_back{i}")(
                jnp.concatenate([h, skip], -1))
            h = SwinStage(dims[idx], self.depths[idx], self.num_heads[idx],
                          self.window, stage_dpr(idx),
                          name=f"dec{i}")(h, train=train)
            if i < n - 2:
                h = PatchExpand(dims[idx], 2, output_dim=None,
                                name=f"expand{i}")(h)

        h = nn.LayerNorm(name="norm_up")(h)
        h = FinalPatchExpanding(self.embed_dim, self.patch,
                                name="final_expand")(h)
        h = h[:, :x.shape[1], :x.shape[2]]
        logits = nn.Conv(self.num_classes, (1, 1), use_bias=False,
                         name="head")(h)
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
    # reference production config (`swt.py:505-525`): depths (2,2,9,2),
    # embed 96, heads (3,6,12,24), window 7, patch 4, add_last=False
    return SwinTransformerUnet(num_classes=label_manager.num_segmentation_heads,
                               depths=(2, 2, 9, 2))


def get_swin_unetr_from_plans(plans_manager, dataset_json, configuration_manager,
                              num_input_channels, deep_supervision=False,
                              dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    return SwinUNETR(num_classes=label_manager.num_segmentation_heads,
                     spatial_dims=dim)


register_model("nnUNetTrainerSwinTransformerUnet", get_swt_from_plans)
register_model("nnUNetTrainerSwUNETR", get_swin_unetr_from_plans)
