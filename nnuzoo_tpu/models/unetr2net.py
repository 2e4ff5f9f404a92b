"""UNETR2Net — the X2Net family member whose per-stage sub-networks are
patchified mini-UNETRs (reference: `nnunetv2/nets/unetr2net.py:1026-1344`).

Each stage embeds its input with a strided conv patch embedding (patch 16 at
full resolution down to patch 2 in the deep stages), runs a small ViT
(hidden 96/192/384, mlp 3072, 12 heads), taps three evenly spaced hidden
states into progressively-upsampling conv encoders, and decodes with
transposed-conv UnetrUpBlocks back to the stage resolution; a depthwise-
separable conv residual (``add_last``) bridges input to output. The outer
topology is the X2Net U: PatchMerging between encoder stages (stage5->6 keeps
resolution: merging scale 1), PatchExpand + concat-back Linear in the decoder,
1x1 side heads and the fused d0.

The decoder stages use DIFFERENT mini-UNETR tables from the encoder (patch
2/4/8/16 going up, reference `unetr2net.py:1162-1232`).

Note: the deepest side output (d6) is at 1/16 scale; the trainer's zero weight
on the deepest deep-supervision term means it is never matched against the
1/32 target (reference semantics, see `training/losses.py`).
"""

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .attention import ViTBlock
from .layers import TransposedConvUp
from .m2net import _DistributedOutConv
from .registry import register_model
from .x2net import PatchExpandND, PatchMergingND, get_stage_scales


class UnetResBlock(nn.Module):
    """MONAI UnetResBlock: conv-IN-lrelu-conv-IN + (1x1 conv-IN skip) -> lrelu
    (reference via `monai.networks.blocks.UnetrBasicBlock`, res_block=True)."""
    features: int
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        inorm = lambda name: nn.GroupNorm(num_groups=None, group_size=1,
                                          epsilon=1e-5, dtype=jnp.float32,
                                          name=name)
        h = nn.Conv(self.features, (3,) * self.dim, padding="SAME",
                    name="conv1")(x)
        h = nn.leaky_relu(inorm("norm1")(h), negative_slope=0.01)
        h = nn.Conv(self.features, (3,) * self.dim, padding="SAME",
                    name="conv2")(h)
        h = inorm("norm2")(h)
        if x.shape[-1] != self.features:
            x = inorm("norm3")(nn.Conv(self.features, (1,) * self.dim,
                                       name="conv3")(x))
        return nn.leaky_relu(h + x, negative_slope=0.01)


class PrUpBlock(nn.Module):
    """MONAI UnetrPrUpBlock (conv_block=True, res_block=True): one transposed
    conv, then ``num_layer`` x (transposed conv + UnetResBlock). Total
    upsampling = 2^(num_layer+1)."""
    features: int
    num_layer: int
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        x = TransposedConvUp(self.features, 2, self.dim, name="up_init")(x)
        for i in range(self.num_layer):
            x = TransposedConvUp(self.features, 2, self.dim, name=f"up{i}")(x)
            x = UnetResBlock(self.features, self.dim, name=f"block{i}")(x)
        return x


class UpBlock(nn.Module):
    """MONAI UnetrUpBlock: transposed conv (scale may be 1) + skip concat +
    UnetResBlock."""
    features: int
    scale: int
    dim: int = 2

    @nn.compact
    def __call__(self, x, skip):
        x = TransposedConvUp(self.features, self.scale, self.dim, name="up")(x)
        x = jnp.concatenate([x, skip], -1)
        return UnetResBlock(self.features, self.dim, name="block")(x)


class MambaNDStack(nn.Module):
    """The MambaND token core (reference `mamba_nd2net.py:565-1000`): a stack
    of Mamba blocks where the flattening AXIS ORDER rotates every two layers
    (2d: row-major / transposed; 3d: thw / twh / wht) and every odd layer
    scans the sequence REVERSED. Each block is post-norm-residual — the
    stream is replaced by its LayerNorm before the mixer residual
    (`mamba_nd2net.py:640-648`: ``h = LN(h); h = h + mixer(h)``, fused_add_norm
    disabled and rms_norm=False in `create_block`, `:714,846`). No position
    embeddings, no final norm (``final_norm=False``, `:1137`).

    Returns (final tokens, list of post-block hidden states), both row-major
    (B, L, C)."""
    hidden_size: int
    num_layers: int
    feat_size: Tuple[int, ...]
    d_state: int = 16

    @nn.compact
    def __call__(self, tokens, train: bool = True):
        from .mamba import MambaBlock
        B = tokens.shape[0]
        C = self.hidden_size
        fs = self.feat_size
        dim = len(fs)
        # spatial axis orders, rotated every 2 layers (reference `:972-982`)
        orders = [(0, 1), (1, 0)] if dim == 2 else [(0, 1, 2), (0, 2, 1),
                                                    (2, 1, 0)]
        outs = []
        for i in range(self.num_layers):
            perm = orders[(i // 2) % len(orders)]
            reverse = i % 2 == 1
            h = tokens.reshape(B, *fs, C)
            if perm != tuple(range(dim)):
                h = jnp.transpose(h, (0,) + tuple(p + 1 for p in perm) +
                                  (dim + 1,))
            seq = h.reshape(B, -1, C)
            if reverse:
                seq = jnp.flip(seq, 1)
            seq = nn.LayerNorm(name=f"norm{i}")(seq)
            seq = seq + MambaBlock(d_model=C, d_state=self.d_state,
                                   name=f"mamba{i}")(seq)
            if reverse:
                seq = jnp.flip(seq, 1)
            if perm != tuple(range(dim)):
                inv = [perm.index(a) for a in range(dim)]
                h = seq.reshape(B, *[fs[p] for p in perm], C)
                h = jnp.transpose(h, (0,) + tuple(a + 1 for a in inv) +
                                  (dim + 1,))
                seq = h.reshape(B, -1, C)
            tokens = seq
            outs.append(tokens)
        return tokens, outs


class MiniUNETR(nn.Module):
    """One UNETR2Net stage (reference `unetr2net.py:1346-1566`).

    ``core="mamba_nd"`` swaps the ViT stack for :class:`MambaNDStack` and
    drops the position embeddings, final LayerNorm, and ``add_last`` residual
    (the MambaND mini has none of the three, `mamba_nd2net.py:1055-1290`)."""
    out_ch: int
    feature_size: int
    hidden_size: int
    num_layers: int
    patch: int
    dim: int = 2
    encoder_layers: Tuple[int, ...] = (2, 1, 0)
    decoder_scale: Tuple[int, ...] = (2, 2, 2, 2)
    mlp_dim: int = 3072
    num_heads: int = 12
    add_last: bool = True
    core: str = "vit"

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        p = self.patch
        assert all(s % p == 0 for s in spatial), (
            f"MiniUNETR patch {p} must divide spatial {spatial}")
        feat_size = tuple(s // p for s in spatial)

        if self.add_last:
            # depthwise-separable conv residual (reference get_dwconv_layer,
            # `unetr2net.py:174-189`; hardcodes 2D there — generalized here)
            h = nn.Conv(x.shape[-1], (3,) * self.dim, padding="SAME",
                        feature_group_count=x.shape[-1], use_bias=False,
                        name="rebnconvin_dw")(x)
            last_add = nn.Conv(self.out_ch, (1,) * self.dim, use_bias=False,
                               name="rebnconvin_pw")(h)

        if self.core == "mamba_nd":
            # MambaNDCore patch embed is DEPTHWISE-SEPARABLE (reference
            # `mamba_nd2net.py:171-190,778-790`: get_dwconv_layer with
            # kernel=stride=patch, bias=True, no norm) — ~100x fewer params
            # than the dense ViT patch conv at the large patches
            t = nn.Conv(x.shape[-1], (p,) * self.dim, strides=(p,) * self.dim,
                        feature_group_count=x.shape[-1], use_bias=True,
                        name="patch_embed_depth")(x)
            tokens = nn.Conv(self.hidden_size, (1,) * self.dim, use_bias=True,
                             name="patch_embed_point")(t)
        else:
            tokens = nn.Conv(self.hidden_size, (p,) * self.dim,
                             strides=(p,) * self.dim, name="patch_embed")(x)
        tokens = tokens.reshape(B, -1, self.hidden_size)

        # hidden-state taps (reference `unetr2net.py:1414`)
        taps = [int(i) for i in np.linspace(2, self.num_layers - 1, 3)]
        if self.core == "mamba_nd":
            tokens, outs = MambaNDStack(self.hidden_size, self.num_layers,
                                        feat_size, name="core")(tokens,
                                                                train=train)
            hidden = {i: outs[i] for i in taps}
        else:
            pos = self.param("pos_embed",
                             nn.initializers.truncated_normal(0.02),
                             (1, tokens.shape[1], self.hidden_size))
            tokens = tokens + pos
            hidden = {}
            for i in range(self.num_layers):
                tokens = ViTBlock(self.num_heads,
                                  mlp_ratio=self.mlp_dim / self.hidden_size,
                                  name=f"vit{i}")(tokens, train=train)
                if i in taps:
                    hidden[i] = tokens
            tokens = nn.LayerNorm(name="vit_norm")(tokens)

        def to_map(t):
            return t.reshape(B, *feat_size, self.hidden_size)

        f = self.feature_size
        enc1 = UnetResBlock(f, self.dim, name="encoder1")(x)
        enc2 = PrUpBlock(f * 2, self.encoder_layers[0], self.dim,
                         name="encoder2")(to_map(hidden[taps[0]]))
        enc3 = PrUpBlock(f * 4, self.encoder_layers[1], self.dim,
                         name="encoder3")(to_map(hidden[taps[1]]))
        enc4 = PrUpBlock(f * 8, self.encoder_layers[2], self.dim,
                         name="encoder4")(to_map(hidden[taps[2]]))

        dec4 = to_map(tokens)
        dec3 = UpBlock(f * 8, self.decoder_scale[0], self.dim,
                       name="decoder5")(dec4, enc4)
        dec2 = UpBlock(f * 4, self.decoder_scale[1], self.dim,
                       name="decoder4")(dec3, enc3)
        dec1 = UpBlock(f * 2, self.decoder_scale[2], self.dim,
                       name="decoder3")(dec2, enc2)
        out = UpBlock(f, self.decoder_scale[3], self.dim,
                      name="decoder2")(dec1, enc1)
        out = nn.Conv(self.out_ch, (1,) * self.dim, name="out")(out)
        if self.add_last:
            out = out + last_add
        return out


# (feature_size, hidden, num_layers, patch, encoder_layers, decoder_scale)
_ENC_TABLE = {
    "stage1": (4, 96, 7, 16, (2, 1, 0), (2, 2, 2, 2)),
    "stage2": (4, 192, 6, 16, (2, 1, 0), (2, 2, 2, 2)),
    "stage3": (8, 384, 5, 8, (2, 1, 0), (2, 2, 2, 1)),
    "stage4": (8, 384, 4, 4, (1, 1, 0), (2, 2, 1, 1)),
    "stage5": (16, 384, 4, 2, (0, 0, 0), (2, 1, 1, 1)),
    "stage6": (16, 384, 4, 2, (0, 0, 0), (2, 1, 1, 1)),
}
# the decoder stages walk the patch sizes back up (`unetr2net.py:1162-1232`)
_DEC_TABLE = {
    "stage5d": (16, 384, 4, 2, (0, 0, 0), (2, 1, 1, 1)),
    "stage4d": (8, 384, 4, 2, (0, 0, 0), (2, 1, 1, 1)),
    "stage3d": (4, 384, 5, 4, (1, 1, 0), (2, 2, 1, 1)),
    "stage2d": (4, 192, 6, 8, (2, 1, 0), (2, 2, 2, 1)),
    "stage1d": (4, 96, 7, 16, (2, 1, 0), (2, 2, 2, 2)),
}


def _mini(table, key, out_ch, dim, name):
    f, hid, nl, p, enc, dec = table[key]
    return MiniUNETR(out_ch=out_ch, feature_size=f, hidden_size=hid,
                     num_layers=nl, patch=p, dim=dim, encoder_layers=enc,
                     decoder_scale=dec, name=name)


class UNETR2Net(nn.Module):
    num_classes: int
    spatial_dims: int = 2
    deep_supervision: bool = True
    spacing: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = self.spatial_dims
        full_res = x.shape[1:-1]
        scales = get_stage_scales(self.spacing, dim, 5)
        chans = [32, 64, 128, 256, 512]

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
        # stage5 -> stage6 keeps resolution (reference merging scale (1,1,1))
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
            jnp.concatenate([up, hx4], -1))
        hx4d = _mini(_DEC_TABLE, "stage4d", 256, dim, "stage4d")(up, train)
        up = PatchExpandND(256, scales[2], output_dim=128,
                           name="patch_expand3d")(hx4d)
        up = nn.Dense(128, name="concat_back_dim3d")(
            jnp.concatenate([up, hx3], -1))
        hx3d = _mini(_DEC_TABLE, "stage3d", 128, dim, "stage3d")(up, train)
        up = PatchExpandND(128, scales[1], output_dim=64,
                           name="patch_expand2d")(hx3d)
        up = nn.Dense(64, name="concat_back_dim2d")(
            jnp.concatenate([up, hx2], -1))
        hx2d = _mini(_DEC_TABLE, "stage2d", 64, dim, "stage2d")(up, train)
        up = PatchExpandND(64, scales[0], output_dim=32,
                           name="patch_expand1d")(hx2d)
        up = nn.Dense(32, name="concat_back_dim1d")(
            jnp.concatenate([up, hx1], -1))
        hx1d = _mini(_DEC_TABLE, "stage1d", 32, dim, "stage1d")(up, train)

        # ------------------------------ heads (1x1 side convs, reference
        # `unetr2net.py:1234-1241`)
        feats = [hx1d, hx2d, hx3d, hx4d, hx5d, hx6]
        sides = [nn.Conv(self.num_classes, (1,) * dim, name=f"side{i + 1}")(f)
                 for i, f in enumerate(feats)]
        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            sides, full_res)
        outs = [o.astype(jnp.float32) for o in [d0] + sides]
        return outs if self.deep_supervision else [outs[0]]


def get_unetr2net_from_plans(plans_manager, dataset_json, configuration_manager,
                             num_input_channels, deep_supervision=True,
                             dtype=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    assert dim == 2, "UNETR2Net supports 2D only (reference trains 2d plans)"
    return UNETR2Net(num_classes=label_manager.num_segmentation_heads,
                     spatial_dims=dim, deep_supervision=deep_supervision)


register_model("nnUNetTrainerUNETR2Net", get_unetr2net_from_plans)
