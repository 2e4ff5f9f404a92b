"""LM2Net (AltM2Net) and LightMamba2Net X2Net families, faithful per-stage
tables (reference: `nnunetv2/nets/lm2net.py:794-1365`,
`nnunetv2/nets/light_mamba2net.py:784-1340`).

The per-stage sub-network is a mini **LightMUNet** (reference `lm2net.py:223`):
a SegResNet-style U with a depthwise-separable convInit, one ResMambaBlock per
down level (GSC + 2x [GroupNorm -> ReLU -> MambaLayer] with residual; axis-order
cycling = the "Alt" direction alternation), conv-only ResUpBlocks in the up
path (no mamba), nearest-neighbor upsampling with additive skips, and a
GroupNorm+ReLU+dwconv head — NOT a VSSM-style patch-merging U. LightMamba2Net
swaps the token mixer for **Mamba2** (chunked SSD, reference
`light_mamba2net.py:5,53-71`) and replaces the RSU4F bottleneck stages with
mini LightMUNets as well.

Stage-scale bookkeeping replicates the reference exactly, including
``get_scales``'s odd-axis and ``min_size`` gating (`lm2net.py:1034-1098`) and
the decoder stages whose ``input_patch_size`` the reference passes at the wrong
resolution (`lm2net.py:1199-1204` passes ``scales[:2]`` for stage2d/stage1d of
LM2NetP) — scale plans only gate pooling, so parameters are unaffected, but we
keep the same computed plans for behavioral parity.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import max_pool, pad_to_match
from .light_munet import (DWConv, ResMambaBlock, ResUpBlock, _ORDERS_2D,
                          _ORDERS_3D)
from .m2net import _DistributedOutConv, _maxpool2_ceil
from .registry import register_model
from .x2net import PatchExpandND, PatchMergingND


# ------------------------------------------------------------------ scale plans
def _get_scale(v):
    """Reference `lm2net.py:1034`: odd axes are not downsampled."""
    if v % 2 == 1:
        return 1, v
    return 2, v // 2


def ref_get_scales(sizes: Sequence[float], n_steps: int,
                   min_size: int = 1) -> list:
    """Reference `get_scales` (`lm2net.py:1057-1098`): per-axis halving with
    odd-axis and min-size gating; sizes may become floats (the reference
    divides without rounding)."""
    sizes = [float(s) for s in sizes]
    out = []
    for _ in range(n_steps):
        step = []
        for ax in range(len(sizes)):
            sc, nv = _get_scale(sizes[ax])
            if sc != 1 and nv >= min_size:
                sizes[ax] = nv
                step.append(sc)
            else:
                step.append(1)
        out.append(tuple(step))
    return out


def ref_scale_value(sizes: Sequence[float], scales) -> Tuple[float, ...]:
    """Reference `get_scale_value` (`lm2net.py:1042`)."""
    sizes = [float(s) for s in sizes]
    for sc in scales:
        sizes = [s / f for s, f in zip(sizes, sc)]
    return tuple(sizes)


# ------------------------------------------------------------ dw-sep RSU4F
class DWREBNCONV(nn.Module):
    """Depthwise-separable conv + norm + ReLU: the lm2net-local REBNCONV
    (reference `lm2net.py:463-477`) built on ``get_dwconv_layer`` — note the
    reference DROPS the dilation the u2net REBNCONV had (get_dwconv_layer has
    no dilation argument), so RSU4F's dirate ladder is all effective-rate 1.
    GroupNorm(group_size=1) stands in for BatchNorm2d (same param count,
    batch-size independent — the convention used throughout this package)."""
    out_ch: int
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        x = DWConv(self.out_ch, self.dim, 3, name="conv")(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="norm")(x)
        return nn.relu(x)


class DWRSU4F(nn.Module):
    """RSU4F with depthwise-separable convs (reference `lm2net.py:660-694`):
    the LM2Net bottleneck stages use this lighter local RSU4F, NOT u2net's
    dense one (~9x fewer params at 512 ch)."""
    mid_ch: int
    out_ch: int
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        hxin = DWREBNCONV(self.out_ch, self.dim, name="rebnconvin")(x)
        hx1 = DWREBNCONV(self.mid_ch, self.dim, name="rebnconv1")(hxin)
        hx2 = DWREBNCONV(self.mid_ch, self.dim, name="rebnconv2")(hx1)
        hx3 = DWREBNCONV(self.mid_ch, self.dim, name="rebnconv3")(hx2)
        hx4 = DWREBNCONV(self.mid_ch, self.dim, name="rebnconv4")(hx3)
        hx3d = DWREBNCONV(self.mid_ch, self.dim, name="rebnconv3d")(
            jnp.concatenate([hx4, hx3], -1))
        hx2d = DWREBNCONV(self.mid_ch, self.dim, name="rebnconv2d")(
            jnp.concatenate([hx3d, hx2], -1))
        hx1d = DWREBNCONV(self.out_ch, self.dim, name="rebnconv1d")(
            jnp.concatenate([hx2d, hx1], -1))
        return hx1d + hxin


# ------------------------------------------------------------------ mini U-Net
class MiniLightMUNet(nn.Module):
    """Per-stage sub-network (reference `lm2net.py:223-400`). With
    ``use_mamba2`` the structure follows `light_mamba2net.py:608-780` instead:
    TWO ResMambaBlocks per level below the first (``blocks_down=[1]+[2]*..``)
    and NO rebnconvin/add_last residual (its add_last branch is dead code,
    `light_mamba2net.py:771-774`)."""
    mid_ch: int
    out_ch: int
    n_layers: int
    dim: int = 2
    input_patch_size: Optional[Tuple[float, ...]] = None
    add_last: bool = False
    use_mamba2: bool = False
    min_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        orders = _ORDERS_3D if self.dim == 3 else _ORDERS_2D
        ips = self.input_patch_size or x.shape[1:-1]
        scales = [(1,) * self.dim] + ref_get_scales(
            ips, self.n_layers - 1, self.min_size)
        blocks_down = [1] + [2 if self.use_mamba2 else 1] * (self.n_layers - 1)

        add_last = self.add_last and not self.use_mamba2
        if add_last:
            last_add = DWConv(self.out_ch, self.dim, 3, name="rebnconvin")(x)
        h = DWConv(self.mid_ch, self.dim, 3, name="convInit")(x)

        down_x = []
        for i in range(self.n_layers):
            if int(np.prod(scales[i])) != 1:
                h = max_pool(h, scales[i], self.dim)
            for b in range(blocks_down[i]):
                h = ResMambaBlock(self.dim, orders[i % len(orders)],
                                  use_mamba2=self.use_mamba2,
                                  name=f"down{i}" if b == 0
                                  else f"down{i}_{b}")(h)
            down_x.append(h)

        down_x = down_x[::-1]
        h = down_x[0]
        for i in range(self.n_layers - 1):
            c = h.shape[-1]
            h = nn.Conv(c, (1,) * self.dim, use_bias=False,
                        name=f"up_conv{i}")(h)
            skip = down_x[i + 1]
            if h.shape[1:-1] != skip.shape[1:-1]:
                h = jax.image.resize(
                    h, (h.shape[0], *skip.shape[1:-1], c), "nearest")
            h = h + skip
            h = ResUpBlock(self.dim, name=f"up{i}")(h)

        h = nn.relu(nn.GroupNorm(num_groups=min(8, h.shape[-1]),
                                 name="final_norm")(h))
        out = DWConv(self.out_ch, self.dim, 1, use_bias=True,
                     name="conv_final")(h)
        if add_last:
            out = out + last_add
        return out


# ------------------------------------------------------------------ outer nets
_N_LAYERS = (7, 6, 5, 4)


class LM2NetBase(nn.Module):
    """Shared outer topology. ``small`` switches between the full table
    (reference `lm2net.py:794` / `light_mamba2net.py:784`) and the P table
    (`lm2net.py:1100` / `light_mamba2net.py:1011`); ``use_mamba2`` between
    Alt-direction Mamba1 minis and Mamba2 minis + mini bottleneck stages."""
    num_classes: int
    dim: int = 2
    deep_supervision: bool = True
    small: bool = False
    use_mamba2: bool = False
    patch_size: Optional[Tuple[int, ...]] = None
    side_kernel: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = self.dim
        full_res = x.shape[1:-1]
        ips = tuple(self.patch_size or full_res)
        m2 = self.use_mamba2
        scales = ref_get_scales(ips, 5, min_size=8)

        if self.small:
            # enc stage1 (mid 32, out 64), stages 2-4 (64 -> 64, mid 32);
            # mergings all 64; decoder concats directly (128-wide minis).
            # bneck5d mid: RSU4F(128, 64, 128) for LM2NetP (`lm2net.py:1146`)
            # but mini(128, 32, 128) for LightMamba2NetP
            # (`light_mamba2net.py:1038,1110`)
            enc = [(32, 64), (32, 64), (32, 64), (32, 64)]
            merge_out = [64, 64, 64, 64]
            dec = [(32, 128), (32, 128), (32, 128), (32, 128)]
            expand_out = [64, 64, 64, 64]
            concat_back = [None, None, None, None]
            bneck_mid, bneck_out = 32, 64
            bneck5d_mid, bneck5d_out = (32, 128) if m2 else (64, 128)
        else:
            st1_mid = 16 if m2 else 32
            enc = [(st1_mid, 32), (32, 64), (64, 128), (128, 256)]
            merge_out = [64, 128, 256, 512]
            dec = [(16, 32), (32, 64), (64, 128), (128, 256)]
            expand_out = [32, 64, 128, 256]
            concat_back = [32, 64, 128, 256]
            bneck_mid, bneck_out, bneck5d_mid, bneck5d_out = 256, 512, 256, 512

        def mini(mid, out, n, ipsize, name, add_last=True):
            return MiniLightMUNet(mid, out, n, dim, tuple(ipsize),
                                  add_last=add_last, use_mamba2=m2,
                                  name=name)

        # ------------------------------ encoder
        skips = []
        h = x
        stage_ips = [ref_scale_value(ips, scales[:i]) for i in range(5)]
        for i in range(4):
            h = mini(enc[i][0], enc[i][1], _N_LAYERS[i], stage_ips[i],
                     f"stage{i + 1}")(h, train=train)
            skips.append(h)
            h = PatchMergingND(h.shape[-1], scales[i], merge_out[i],
                               name=f"patch_merging{i + 1}")(h)

        if m2:
            # LightMamba2Net: mini-LightMUNet bottleneck stages + patch ops
            hx5 = mini(bneck_mid, bneck_out, 4, stage_ips[4],
                       "stage5")(h, train=train)
            h = PatchMergingND(hx5.shape[-1], scales[4], bneck_out,
                               name="patch_merging5")(hx5)
            hx6 = mini(bneck_mid, bneck_out, 4, ref_scale_value(ips, scales),
                       "stage6", add_last=False)(h, train=train)
            hx6up = PatchExpandND(hx6.shape[-1], scales[4],
                                  output_dim=bneck_out,
                                  name="patch_expand5d")(hx6)
            hx5d = mini(bneck5d_mid, bneck5d_out, 4, stage_ips[4], "stage5d")(
                jnp.concatenate([pad_to_match(hx6up, hx5.shape[1:-1]), hx5],
                                -1), train=train)
        else:
            # LM2Net: dw-separable RSU4F bottleneck (NOT u2net's dense one) +
            # fixed 2x pool (reference pool56, `lm2net.py:834,660-694`)
            hx5 = DWRSU4F(bneck_mid, bneck_out, dim, name="stage5")(h)
            h = _maxpool2_ceil(hx5) if dim == 2 else max_pool(
                jnp.pad(hx5, [(0, 0)] + [(0, s % 2) for s in hx5.shape[1:-1]] +
                        [(0, 0)], constant_values=-np.inf), 2, dim)
            hx6 = DWRSU4F(bneck_mid, bneck_out, dim, name="stage6")(h)
            from .layers import resize_linear
            hx6up = resize_linear(hx6, hx5.shape[1:-1], dim)
            hx5d = DWRSU4F(bneck5d_mid, bneck5d_out, dim, name="stage5d")(
                jnp.concatenate([hx6up, hx5], -1))

        # ------------------------------ decoder
        # reference decoder input_patch_size plans. LM2NetP (m1-small) has the
        # stage2d/stage1d `scales[:2]` quirk (`lm2net.py:1190-1204`);
        # LightMamba2NetP does NOT (`light_mamba2net.py:1125-1149`)
        if self.small and not m2:
            dec_ips = [stage_ips[3], stage_ips[2], stage_ips[2], stage_ips[2]]
        else:
            dec_ips = [stage_ips[3], stage_ips[2], stage_ips[1], stage_ips[0]]

        h = hx5d
        dec_feats = []
        for j, i in enumerate(range(3, -1, -1)):
            h = PatchExpandND(h.shape[-1], scales[i], output_dim=expand_out[i],
                              name=f"patch_expand{i + 1}d")(h)
            h = jnp.concatenate([pad_to_match(h, skips[i].shape[1:-1]),
                                 skips[i]], -1)
            if concat_back[i] is not None:
                h = nn.Dense(concat_back[i], name=f"concat_back_dim{i + 1}d")(h)
            h = mini(dec[i][0], dec[i][1], _N_LAYERS[i], dec_ips[j],
                     f"stage{i + 1}d")(h, train=train)
            dec_feats.append(h)

        hx4d, hx3d, hx2d, hx1d = dec_feats

        # ------------------------------ heads
        sides = []
        feats = [hx1d, hx2d, hx3d, hx4d, hx5d, hx6]
        for i, f in enumerate(feats):
            k = self.side_kernel
            sides.append(nn.Conv(self.num_classes, (k,) * dim,
                                 padding="SAME", name=f"side{i + 1}")(f))
        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            sides, full_res)
        outs = [d0] + sides
        outs = [o.astype(jnp.float32) for o in outs]
        return outs if self.deep_supervision else [outs[0]]


def _make_builder(use_mamba2: bool, small: bool = False):
    def builder(plans_manager, dataset_json, configuration_manager,
                num_input_channels, deep_supervision=True, dtype=None,
                small=small):
        label_manager = plans_manager.get_label_manager(dataset_json)
        dim = len(configuration_manager.patch_size)
        assert dim in (2, 3)
        # side kernel: 1x1 except LightMamba2NetP which uses 3x3
        # (`light_mamba2net.py:1233-1240`, `lm2net.py:896-901,1206-1212`)
        side_k = 3 if (use_mamba2 and small) else 1
        return LM2NetBase(num_classes=label_manager.num_segmentation_heads,
                          dim=dim, deep_supervision=deep_supervision,
                          small=small, use_mamba2=use_mamba2,
                          patch_size=tuple(configuration_manager.patch_size),
                          side_kernel=side_k)
    return builder


register_model("nnUNetTrainerLM2Net", _make_builder(False))
register_model("nnUNetTrainerLM2NetP", _make_builder(False, small=True))
register_model("nnUNetTrainerLightMamba2Net", _make_builder(True))
register_model("nnUNetTrainerLightMamba2NetP", _make_builder(True, small=True))
