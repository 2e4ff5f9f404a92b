"""VSSM building blocks: patch embed/merge/expand and the mini VSSM U-Net ("MU")
used as the per-stage sub-network of the X2Net family
(reference: `nnunetv2/nets/m2net.py:228-513,598-768`).

Everything channels-last (B, H, W, C).
"""

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import pad_to_match
from .ss2d import VSSLayer
from .u2net import REBNCONV


class PatchEmbed2D(nn.Module):
    patch_size: int = 4
    embed_dim: int = 96
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), name="proj")(x)
        if self.use_norm:
            x = nn.LayerNorm(name="norm")(x)
        return x


class PatchMerging2D(nn.Module):
    """Space-to-depth (scale 2) + LN + Linear (reference `m2net.py:228-273`)."""
    input_dim: int
    scale: int = 2
    output_features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        s = self.scale
        out_features = self.output_features or self.input_dim * s
        # odd spatial dims are truncated to floor(dim/scale), reference
        # `m2net.py:249-265` SHAPE_FIX behavior
        H, W = x.shape[1], x.shape[2]
        fh, fw = H // s, W // s
        # same sub-patch order as the reference: (0,0), (1,0), (0,1), (1,1)
        parts = [x[:, 0::s, 0::s, :], x[:, 1::s, 0::s, :],
                 x[:, 0::s, 1::s, :], x[:, 1::s, 1::s, :]]
        if H % s or W % s:
            parts = [p[:, :fh, :fw, :] for p in parts]
        x = jnp.concatenate(parts, -1)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(out_features, use_bias=False, name="reduction")(x)


class PatchExpand(nn.Module):
    """Depth-to-space upsample (reference `m2net.py:276-322`).

    output_dim=None: Linear(dim -> scale*dim) THEN rearrange (channels become
    dim/scale) + LN. output_dim set: rearrange (channels become dim/scale^2) then
    Linear(-> output_dim) + LN.
    """
    dim: int
    scale: int = 2
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.scale
        if self.output_dim is None:
            x = nn.Dense(s * self.dim, use_bias=False, name="expand")(x)
            c_out = (s * self.dim) // (s * s)
            x = x.reshape(B, H, W, s, s, c_out)
            x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H * s, W * s, c_out)
            return nn.LayerNorm(name="norm")(x)
        c_out = C // (s * s)
        x = x.reshape(B, H, W, s, s, c_out)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H * s, W * s, c_out)
        x = nn.Dense(self.output_dim, use_bias=False, name="expand")(x)
        return nn.LayerNorm(name="norm")(x)


class VSSMEncoder(nn.Module):
    """PatchEmbed -> [VSSLayer -> PatchMerging]xL (reference `m2net.py:598-713`).
    Returns skips: [rebnconvin output (if add_last) else None, layer outputs...]."""
    patch_size: int
    depths: Sequence[int]
    dims: Sequence[int]
    d_state: int = 16
    skip_last_downsample: bool = False
    add_last: bool = False
    out_ch: Optional[int] = None
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        skips: List = []
        if self.add_last:
            x = REBNCONV(self.out_ch, 1, 2, name="rebnconvin")(x)
            skips.append(x)
        else:
            skips.append(None)

        x = PatchEmbed2D(self.patch_size, self.dims[0], name="patch_embed")(x)
        n = len(self.depths)
        # stochastic-depth decay: 0 -> rate over the encoder blocks
        # (reference `m2net.py:628`)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * j / max(1, total - 1) for j in range(total)]
        for i in range(n):
            lo = sum(self.depths[:i])
            x = VSSLayer(self.dims[i], self.depths[i], self.d_state,
                         tuple(dpr[lo:lo + self.depths[i]]),
                         name=f"layer{i}")(x, train=train)
            skips.append(x)
            is_last_down = i == n - 2
            if i < n - 1 and not (is_last_down and self.skip_last_downsample):
                x = PatchMerging2D(self.dims[i], 2, self.dims[i + 1],
                                   name=f"down{i}")(x)
        return skips


class VSSMDecoder(nn.Module):
    """PatchExpand + concat skip + Linear + VSSLayer per stage, final PatchExpand
    back to patch resolution + 1x1 seg conv (reference `m2net.py:359-484`)."""
    num_classes: int
    features_per_stage: Sequence[int]
    d_state: int = 16
    skip_first_expand: bool = False
    patch_size: int = 4
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, skips, train: bool = True):
        feats = self.features_per_stage
        n = len(feats)
        x = skips[-1]
        # decoder stochastic depth decays rate -> 0 toward full resolution
        # (reference `m2net.py:397`)
        dpr = [self.drop_path_rate * (n - 1 - s) / max(1, n - 2)
               for s in range(n - 1)] if n > 1 else []
        for s in range(1, n):
            below = feats[-s]
            skip_f = feats[-(s + 1)]
            if not (s == 1 and self.skip_first_expand):
                x = PatchExpand(below, 2, output_dim=below,
                                name=f"expand{s - 1}")(x)
            skip = skips[-(s + 1)]
            x = jnp.concatenate([pad_to_match(x, skip.shape[1:-1]), skip], -1)
            x = nn.Dense(skip_f, name=f"concat_back_dim{s - 1}")(x)
            x = VSSLayer(skip_f, 1, self.d_state, dpr[s - 1],
                         name=f"stage{s - 1}")(x, train=train)
        x = PatchExpand(feats[0], self.patch_size, output_dim=None,
                        name=f"expand{n - 1}")(x) if self.patch_size > 1 else \
            PatchExpand(feats[0], 1, output_dim=None, name=f"expand{n - 1}")(x)
        return nn.Conv(self.num_classes, (1, 1), name="seg")(x)


class MU(nn.Module):
    """Mini VSSM U-Net: the per-stage sub-network of M2Net
    (reference `m2net.py:713-768`)."""
    in_ch: int
    mid_ch: int
    out_ch: int
    n_layers: int
    skip_last_downsample: bool = True
    patch_size: int = 1
    add_last: bool = True
    d_state: int = 16
    drop_path_rate: float = 0.2  # reference `m2net.py:732,739`

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = [self.mid_ch] * self.n_layers
        skips = VSSMEncoder(
            patch_size=self.patch_size, depths=[1] * self.n_layers, dims=feats,
            d_state=self.d_state, skip_last_downsample=self.skip_last_downsample,
            add_last=self.add_last, out_ch=self.out_ch if self.add_last else None,
            drop_path_rate=self.drop_path_rate,
            name="vssm_encoder")(x, train=train)
        out = VSSMDecoder(
            num_classes=self.out_ch, features_per_stage=feats,
            d_state=self.d_state, skip_first_expand=self.skip_last_downsample,
            patch_size=self.patch_size, drop_path_rate=self.drop_path_rate,
            name="vssm_decoder")(skips[1:], train=train)
        if self.add_last:
            out = out + skips[0]
        return out
