"""SegMamba (reference: `nnunetv2/nets/seg_mamba/segmamba.py:69-426`).

Conv-stem 4-stage encoder (stride-2 stem + stride-2 downsamples); each stage is a
GSC gated conv followed by trimodal bidirectional MambaLayers (forward, backward
and slice-major scans over flattened tokens) and a channel MLP; UNETR-style
residual conv decoder. 2D and 3D, channels-last.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .light_munet import GSC
from .mamba import MambaBlock
from .registry import register_model
from .unetr import UnetrBasicBlock, UnetrUpBlock


class MambaLayer3Way(nn.Module):
    """norm -> trimodal Mamba over flattened tokens -> residual
    (reference `segmamba.py:69-110`)."""
    dim: int
    num_slices: int

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        flat = x.reshape(B, -1, C)
        # nslices must divide L; the slice-major branch reorders by that grouping
        L = flat.shape[1]
        ns = self.num_slices
        while L % ns != 0 and ns > 1:
            ns //= 2
        h = nn.LayerNorm(name="norm")(flat)
        h = MambaBlock(d_model=C, bimamba_type="v3", nslices=ns,
                       name="mamba")(h)
        return (flat + h).reshape(B, *spatial, C)


class MlpChannel(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(self.hidden, (1,) * (x.ndim - 2), name="fc1")(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU() is exact
        return nn.Conv(c, (1,) * (x.ndim - 2), name="fc2")(h)


class MambaEncoder(nn.Module):
    dim: int
    depths: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (48, 96, 192, 384)

    @nn.compact
    def __call__(self, x):
        num_slices = (64, 32, 16, 8)
        outs = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (7,) * self.dim, strides=(2,) * self.dim,
                            padding="SAME", name="stem")(x)
            else:
                x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                                 use_bias=False, use_scale=False,
                                 name=f"down_norm{i}")(x)
                x = nn.Conv(self.dims[i], (2,) * self.dim,
                            strides=(2,) * self.dim, name=f"down{i}")(x)
            x = GSC(self.dim, name=f"gsc{i}")(x)
            for d in range(self.depths[i]):
                x = MambaLayer3Way(self.dims[i], num_slices[i],
                                   name=f"stage{i}_block{d}")(x)
            out = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                               use_bias=False, use_scale=False,
                               name=f"out_norm{i}")(x)
            out = MlpChannel(2 * self.dims[i], name=f"mlp{i}")(out)
            outs.append(out)
        return outs


class SegMamba(nn.Module):
    num_classes: int
    dim: int = 2
    feat_size: Sequence[int] = (48, 96, 192, 384)
    hidden_size: int = 768
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.feat_size
        feats = MambaEncoder(self.dim, dims=f, name="vit")(x)

        enc1 = UnetrBasicBlock(f[0], self.dim, name="encoder1")(x)
        enc2 = UnetrBasicBlock(f[1], self.dim, name="encoder2")(feats[0])
        enc3 = UnetrBasicBlock(f[2], self.dim, name="encoder3")(feats[1])
        enc4 = UnetrBasicBlock(f[3], self.dim, name="encoder4")(feats[2])
        enc_hidden = UnetrBasicBlock(self.hidden_size, self.dim,
                                     name="encoder5")(feats[3])

        d3 = UnetrUpBlock(f[3], self.dim, name="decoder5")(enc_hidden, enc4)
        d2 = UnetrUpBlock(f[2], self.dim, name="decoder4")(d3, enc3)
        d1 = UnetrUpBlock(f[1], self.dim, name="decoder3")(d2, enc2)
        d0 = UnetrUpBlock(f[0], self.dim, name="decoder2")(d1, enc1)
        out = UnetrBasicBlock(f[0], self.dim, name="decoder1")(d0)
        logits = nn.Conv(self.num_classes, (1,) * self.dim, name="out")(out)
        return [logits.astype(jnp.float32)]


def get_segmamba_from_plans(plans_manager, dataset_json, configuration_manager,
                            num_input_channels, deep_supervision=False,
                            dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    return SegMamba(num_classes=label_manager.num_segmentation_heads, dim=dim)


register_model("nnUNetTrainerSegMamba", get_segmamba_from_plans)
