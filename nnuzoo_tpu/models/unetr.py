"""UNETR (reference: `nnunetv2/nets/unetr2net.py:1346-1566`): ViT encoder with
hidden states tapped at evenly spaced layers feeding a conv decoder
(UNETR, Hatamizadeh et al.). 2D and 3D, channels-last."""

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .attention import ViTBlock
from .layers import ConvNormAct, TransposedConvUp
from .registry import register_model


class UnetrBasicBlock(nn.Module):
    features: int
    dim: int

    @nn.compact
    def __call__(self, x):
        h = ConvNormAct(self.features, 3, 1, self.dim, name="conv1")(x)
        h = ConvNormAct(self.features, 3, 1, self.dim, name="conv2")(h)
        if x.shape[-1] != self.features:
            x = ConvNormAct(self.features, 1, 1, self.dim, name="skip")(x)
        return h + x


class UnetrPrUpBlock(nn.Module):
    """Progressive transpconv upsampling of a ViT feature map."""
    features: int
    num_upsamples: int
    dim: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_upsamples):
            x = TransposedConvUp(self.features, 2, self.dim, name=f"up{i}")(x)
            x = ConvNormAct(self.features, 3, 1, self.dim, name=f"conv{i}")(x)
        return x


class UnetrUpBlock(nn.Module):
    features: int
    dim: int

    @nn.compact
    def __call__(self, x, skip):
        x = TransposedConvUp(self.features, 2, self.dim, name="up")(x)
        x = jnp.concatenate([x, skip], -1)
        return UnetrBasicBlock(self.features, self.dim, name="block")(x)


class UNETR(nn.Module):
    num_classes: int
    dim: int = 2
    feature_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    patch: int = 16
    deep_supervision: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        p = self.patch
        feat_size = tuple(s // p for s in spatial)

        # patch embedding + learned position embedding
        tokens = nn.Conv(self.hidden_size, (p,) * self.dim, strides=(p,) * self.dim,
                         name="patch_embed")(x)
        tokens = tokens.reshape(B, -1, self.hidden_size)
        pos = self.param("pos_embed", nn.initializers.truncated_normal(0.02),
                         (1, tokens.shape[1], self.hidden_size))
        tokens = tokens + pos

        taps = [int(i) for i in np.linspace(self.num_layers // 4,
                                            self.num_layers - 1, 3)]
        hidden = {}
        for i in range(self.num_layers):
            tokens = ViTBlock(self.num_heads,
                              mlp_ratio=self.mlp_dim / self.hidden_size,
                              name=f"vit{i}")(tokens, train=train)
            if i in taps:
                hidden[i] = tokens

        def to_map(t):
            return t.reshape(B, *feat_size, self.hidden_size)

        f = self.feature_size
        enc1 = UnetrBasicBlock(f, self.dim, name="encoder1")(x)
        enc2 = UnetrPrUpBlock(f * 2, 3, self.dim, name="encoder2")(
            to_map(hidden[taps[0]]))
        enc3 = UnetrPrUpBlock(f * 4, 2, self.dim, name="encoder3")(
            to_map(hidden[taps[1]]))
        enc4 = UnetrPrUpBlock(f * 8, 1, self.dim, name="encoder4")(
            to_map(hidden[taps[2]]))

        dec4 = to_map(tokens)
        dec3 = UnetrUpBlock(f * 8, self.dim, name="decoder5")(dec4, enc4)
        dec2 = UnetrUpBlock(f * 4, self.dim, name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(f * 2, self.dim, name="decoder3")(dec2, enc2)
        out = UnetrUpBlock(f, self.dim, name="decoder2")(dec1, enc1)
        logits = nn.Conv(self.num_classes, (1,) * self.dim, name="out")(out)
        return [logits.astype(jnp.float32)]


def get_unetr_from_plans(plans_manager, dataset_json, configuration_manager,
                         num_input_channels, deep_supervision=False, dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    return UNETR(num_classes=label_manager.num_segmentation_heads, dim=dim)


register_model("nnUNetTrainerUNETR", get_unetr_from_plans)
