"""Generic X2Net macro-topology and the non-M2Net family members.

The X2Net pattern (reference: UNETR2Net `unetr2net.py:1026`, SwT2Net
`swt2net.py:909`, LM2Net `lm2net.py:794`, LightMamba2Net `light_mamba2net.py:784`,
SSND2Net `ssnd2net.py:1143`, MambaND2Net `mamba_nd2net.py:1598`): the U2Net outer
U (6 stages, PatchMerging between encoder stages, PatchExpand + concat in the
decoder, RSU4F at stages 5/6, side heads at native resolutions + fused d0) with a
mini U-Net sub-network per stage whose layers use a per-family token mixer.

N-dimensional (2D/3D) and channels-last throughout. Anisotropy-aware stage scales
(`ssnd2net.py:1039` get_scales): axes whose spacing is > 2x the finest axis are
not downsampled at that stage.
"""

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import max_pool, pad_to_match, resize_linear
from .mixers import MixerLayer
from .registry import register_model
from .m2net import _DistributedOutConv
from .u2net import REBNCONV, RSU4F
from .vssm import PatchEmbed2D

# --------------------------------------------------------------------- ND patch ops


class PatchMergingND(nn.Module):
    """Space-to-depth with a per-axis scale vector + LN + Linear."""
    input_dim: int
    scales: Sequence[int]
    output_features: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        dims = len(self.scales)
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        new_spatial = [s // sc for s, sc in zip(spatial, self.scales)]
        # odd spatial dims are truncated (reference SHAPE_FIX semantics,
        # `nnunetv2/nets/m2net.py:249-265`); the decoder pads back
        if any(s % sc for s, sc in zip(spatial, self.scales)):
            sl = tuple([slice(None)] +
                       [slice(0, n * sc) for n, sc in
                        zip(new_spatial, self.scales)] + [slice(None)])
            x = x[sl]
        shape = [B]
        for s, sc in zip(new_spatial, self.scales):
            shape += [s, sc]
        x = x.reshape(*shape, C)
        # (B, s0, sc0, s1, sc1, ..., C) -> (B, s0, s1, ..., sc0, sc1, ..., C)
        perm = [0] + [1 + 2 * i for i in range(dims)] + \
            [2 + 2 * i for i in range(dims)] + [1 + 2 * dims]
        x = jnp.transpose(x, perm).reshape(
            B, *new_spatial, C * int(np.prod(self.scales)))
        x = nn.LayerNorm(name="norm")(x)
        out = self.output_features or self.input_dim * 2
        return nn.Dense(out, use_bias=False, name="reduction")(x)


class PatchExpandND(nn.Module):
    """Depth-to-space with a per-axis scale vector (PatchExpand generalized)."""
    dim: int
    scales: Sequence[int]
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        dims = len(self.scales)
        B = x.shape[0]
        spatial = x.shape[1:-1]
        prod = int(np.prod(self.scales))
        if self.output_dim is None:
            x = nn.Dense(2 * self.dim, use_bias=False, name="expand")(x)
            c_out = (2 * self.dim) // prod
        else:
            c_out = x.shape[-1] // prod
        C = x.shape[-1]
        assert C % prod == 0 and c_out > 0, (
            f"PatchExpandND: channels {C} must be divisible by the scale product "
            f"{prod} (scales {self.scales})")
        x = x.reshape(B, *spatial, *self.scales, c_out)
        # interleave: (B, s0.., sc0.., c) -> (B, s0, sc0, s1, sc1, ..., c)
        perm = [0]
        for i in range(dims):
            perm += [1 + i, 1 + dims + i]
        perm += [1 + 2 * dims]
        new_spatial = [s * sc for s, sc in zip(spatial, self.scales)]
        x = jnp.transpose(x, perm).reshape(B, *new_spatial, c_out)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=False, name="expand")(x)
        return nn.LayerNorm(name="norm")(x)


def get_stage_scales(spacing: Optional[Sequence[float]], dim: int,
                     num_downs: int) -> List[Tuple[int, ...]]:
    """Anisotropy-aware per-stage downsampling (reference `ssnd2net.py:1039`):
    don't downsample an axis while its accumulated spacing is > 2x the finest."""
    if spacing is None:
        return [(2,) * dim] * num_downs
    current = np.array(spacing, dtype=float)
    scales = []
    for _ in range(num_downs):
        s = []
        for ax in range(dim):
            if current[ax] / current.min() > 2:
                s.append(1)
            else:
                s.append(2)
                current[ax] *= 2
        # never a no-op stage: if nothing qualifies, downsample everything
        if all(v == 1 for v in s):
            s = [2] * dim
        scales.append(tuple(s))
    return scales


# --------------------------------------------------------------------- MU generic
class MUND(nn.Module):
    """Mini mixer U-Net: ND generalization of M2Net's MU
    (reference `m2net.py:713-768`), parameterized by the token mixer."""
    mid_ch: int
    out_ch: int
    n_layers: int
    mixer: str = "ss2d"
    spatial_dims: int = 2
    d_state: int = 16
    drop_path_rate: float = 0.2  # reference X2Net cores (`ssnd2net.py:533`)

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = self.spatial_dims
        feats = [self.mid_ch] * self.n_layers
        n = self.n_layers
        # stochastic depth: 0 -> rate over the encoder, rate -> 0 over the
        # decoder (same decay rule as the M2Net MU, `m2net.py:397,628`)
        enc_dpr = [self.drop_path_rate * i / max(1, n - 1) for i in range(n)]
        dec_dpr = [self.drop_path_rate * (n - 1 - s) / max(1, n - 2)
                   for s in range(1, n)]

        hxin = REBNCONV(self.out_ch, 1, dim, name="rebnconvin")(x)
        # patch embed (patch 1): 1x1 conv + LN
        h = nn.Conv(self.mid_ch, (1,) * dim, name="patch_embed")(hxin)
        h = nn.LayerNorm(name="patch_norm")(h)

        skips = []
        for i in range(n):
            h = MixerLayer(feats[i], 1, self.mixer, self.d_state, dim,
                           enc_dpr[i], name=f"layer{i}")(h, train=train)
            skips.append(h)
            if i < n - 2:  # skip_last_downsample
                h = PatchMergingND(feats[i], (2,) * dim, feats[i + 1],
                                   name=f"down{i}")(h)

        # decoder
        h = skips[-1]
        for s in range(1, n):
            if s > 1:
                h = PatchExpandND(feats[-s], (2,) * dim, output_dim=feats[-s],
                                  name=f"expand{s - 1}")(h)
            skip = skips[-(s + 1)]
            h = jnp.concatenate([pad_to_match(h, skip.shape[1:-1]), skip], -1)
            h = nn.Dense(feats[-(s + 1)], name=f"concat_back{s - 1}")(h)
            h = MixerLayer(feats[-(s + 1)], 1, self.mixer, self.d_state, dim,
                           dec_dpr[s - 1], name=f"dec{s - 1}")(h, train=train)
        out = nn.Dense(self.out_ch, name="head_dense")(nn.LayerNorm(
            name="head_norm")(h))
        out = nn.Conv(self.out_ch, (1,) * dim, name="seg")(out)
        return out + hxin


# --------------------------------------------------------------------- macro
class X2Net(nn.Module):
    """Outer U2Net with per-stage MUND sub-networks (see module docstring)."""
    num_classes: int
    mixer: str
    spatial_dims: int = 2
    deep_supervision: bool = True
    # M2Net channel plan (reference `m2net.py:809-880`)
    stage_out: Sequence[int] = (32, 64, 128, 256)
    stage_mid: Sequence[int] = (16, 32, 64, 128)
    bottleneck: int = 512
    bottleneck_mid: int = 256
    stage_layers: Sequence[int] = (7, 6, 5, 4)
    spacing: Optional[Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = self.spatial_dims
        full_res = x.shape[1:-1]
        so, sm, sl = self.stage_out, self.stage_mid, self.stage_layers
        merge_scales = get_stage_scales(self.spacing, dim, 5)

        # encoder
        skips = []
        h = x
        for i in range(4):
            h = MUND(sm[i], so[i], sl[i], self.mixer, dim,
                     name=f"stage{i + 1}")(h, train=train)
            skips.append(h)
            out_feats = so[i + 1] if i < 3 else self.bottleneck
            h = PatchMergingND(so[i], merge_scales[i], out_feats,
                               name=f"patch_merging{i + 1}")(h)
        hx5 = RSU4F(self.bottleneck_mid, self.bottleneck, dim, name="stage5")(h)
        h = max_pool(hx5, merge_scales[4], dim)
        hx6 = RSU4F(self.bottleneck_mid, self.bottleneck, dim, name="stage6")(h)
        hx6up = resize_linear(hx6, hx5.shape[1:-1], dim)

        # decoder
        hx5d = RSU4F(self.bottleneck_mid, self.bottleneck, dim, name="stage5d")(
            jnp.concatenate([hx6up, hx5], -1))
        dec_feats = [hx5d]
        h = hx5d
        for i in range(3, -1, -1):
            h = PatchExpandND(h.shape[-1], merge_scales[i],
                              output_dim=so[i], name=f"patch_expand{i + 1}d")(h)
            h = jnp.concatenate([pad_to_match(h, skips[i].shape[1:-1]),
                                 skips[i]], -1)
            h = nn.Dense(so[i], name=f"concat_back_dim{i + 1}d")(h)
            h = MUND(sm[i], so[i], sl[i], self.mixer, dim,
                     name=f"stage{i + 1}d")(h, train=train)
            dec_feats.append(h)

        # heads at native resolutions: d1 finest ... d5 bottleneck, d6 deepest
        sides = []
        feats = [dec_feats[4], dec_feats[3], dec_feats[2], dec_feats[1],
                 dec_feats[0], hx6]
        for i, f in enumerate(feats):
            sides.append(nn.Conv(self.num_classes, (3,) * dim, padding="SAME",
                                 name=f"side{i + 1}")(f))
        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            sides, full_res)

        outs = [d0] + sides
        outs = [o.astype(jnp.float32) for o in outs]
        return outs if self.deep_supervision else [outs[0]]


# --------------------------------------------------------------------- factories
# Every X2Net family member now registers from its own faithful per-family
# module: swt2net.py (mini Swin-Unets), unetr2net.py (mini-UNETRs),
# lm2net.py (mini LightMUNets; LM2Net + LightMamba2Net), ssnd2net.py (mini
# SSND VSSM U-Nets), mamba_nd2net.py (mini MambaND UNETR-skeletons). The
# generic MUND/X2Net scaffold stays as the shared building block and for
# experimentation via make_x2net_builder.


def make_x2net_builder(mixer: str, fixed_dim):
    def builder(plans_manager, dataset_json, configuration_manager,
                num_input_channels, deep_supervision=True, dtype=None):
        label_manager = plans_manager.get_label_manager(dataset_json)
        dim = len(configuration_manager.patch_size)
        if fixed_dim is not None:
            assert dim == fixed_dim, f"{mixer} X2Net supports {fixed_dim}D only"
        spacing = tuple(float(s) for s in configuration_manager.spacing) \
            if dim == 3 else None
        return X2Net(num_classes=label_manager.num_segmentation_heads,
                     mixer=mixer, spatial_dims=dim,
                     deep_supervision=deep_supervision, spacing=spacing)
    return builder
