"""SSND2Net — X2Net whose per-stage sub-networks are mini N-D cross-scan
(SSND) VSSM U-Nets, faithful stage tables (reference:
`nnunetv2/nets/ssnd2net.py:1070-1739`).

Differences from the generic MUND scaffold this replaces (all per the
reference): encoder mixer depth is 2 per level (`MU.depths = [2]*n_layers`,
`ssnd2net.py:1088`), per-mini internal downsampling follows the odd-axis-gated
`get_scales` plan of the mini's own input patch size (identity scales are
skipped and the downsample list is compacted, `ssnd2net.py:934-944`), the
bottleneck stages 5/6/5d are minis themselves (with NO internal downsampling —
they receive no input_patch_size, `ssnd2net.py:1193-1201`), the outer
patch_merging5/patch_expand5d pair uses scales[4], the decoder's final expand
is absent at patch_size=1 (`ssnd2net.py:614-623`, unlike the M2Net MU), and
side heads are 3x3 (`ssnd2net.py:1296-1303`).
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import pad_to_match
from .light_munet import DWConv
from .lm2net import ref_get_scales, ref_scale_value
from .m2net import _DistributedOutConv
from .mixers import MixerLayer
from .registry import register_model
from .x2net import PatchExpandND, PatchMergingND


class MUSSND(nn.Module):
    """Mini SSND VSSM U-Net (reference `ssnd2net.py:1070-1140`)."""
    mid_ch: int
    out_ch: int
    n_layers: int
    dim: int = 2
    input_patch_size: Optional[Tuple[float, ...]] = None
    add_last: bool = False
    d_state: int = 16
    drop_path_rate: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = True):
        n = self.n_layers
        dim = self.dim
        mid = self.mid_ch
        scales = ref_get_scales(self.input_patch_size, n - 1, 1) \
            if self.input_patch_size is not None else []
        # the reference compacts identity scales out of the downsample list
        # and indexes it by layer position (`ssnd2net.py:934-944,996-999`)
        downs = [s for s in scales if int(np.prod(s)) != 1]

        if self.add_last:
            # the reference embeds the REBNCONVIN OUTPUT, not the raw input
            # (`ssnd2net.py:977-985`: x = rebnconvin(x); x = patch_embed(x))
            last_add = DWConv(self.out_ch, dim, 3, name="rebnconvin")(x)
            x = last_add
        h = nn.Conv(mid, (1,) * dim, name="patch_embed")(x)
        h = nn.LayerNorm(name="patch_norm")(h)

        # encoder: depth-2 mixer layers, stochastic depth 0 -> rate
        total = 2 * n
        dpr = [self.drop_path_rate * j / max(1, total - 1) for j in range(total)]
        skips = []
        for i in range(n):
            h = MixerLayer(mid, 2, "ssnd", self.d_state, dim,
                           tuple(dpr[2 * i:2 * i + 2]),
                           name=f"layer{i}")(h, train=train)
            skips.append(h)
            if i < len(downs):
                h = PatchMergingND(mid, downs[i], mid, name=f"down{i}")(h)

        # decoder: depth-1 mixer per stage, rate -> 0; expand only where the
        # matching encoder scale was non-identity; concat-back Linear
        dprd = [self.drop_path_rate * (2 * (n - 1) - 1 - j) /
                max(1, 2 * (n - 1) - 1) for j in range(2 * (n - 1))]
        h = skips[-1]
        for s in range(1, n):
            scale_s = scales[-s] if scales else None
            if scale_s is not None and int(np.prod(scale_s)) != 1:
                h = PatchExpandND(mid, scale_s, output_dim=mid,
                                  name=f"expand{s - 1}")(h)
            skip = skips[-(s + 1)]
            h = jnp.concatenate([pad_to_match(h, skip.shape[1:-1]), skip], -1)
            h = nn.Dense(mid, name=f"concat_back_dim{s - 1}")(h)
            h = MixerLayer(mid, 1, "ssnd", self.d_state, dim,
                           dprd[2 * (s - 1)], name=f"stage{s - 1}")(
                h, train=train)
        # patch_size == 1: no final expand (reference `ssnd2net.py:614-623`)
        out = nn.Conv(self.out_ch, (1,) * dim, name="seg")(h)
        if self.add_last:
            out = out + last_add
        return out


_N_LAYERS = (7, 6, 5, 4)


class SSND2Net(nn.Module):
    """Outer net; ``small`` selects the P table (reference `ssnd2net.py:1446`)."""
    num_classes: int
    dim: int = 2
    deep_supervision: bool = True
    small: bool = False
    patch_size: Optional[Tuple[int, ...]] = None
    remat: bool = False  # per-stage recompute (canonical 2d needs ~48 GB without)

    @nn.compact
    def __call__(self, x, train: bool = True):
        dim = self.dim
        full_res = x.shape[1:-1]
        ips = tuple(self.patch_size or full_res)
        scales = ref_get_scales(ips, 5, 1)

        if self.small:
            enc = [(16, 64), (16, 64), (16, 64), (16, 64)]
            merge_out = [64, 64, 64, 64]
            dec = [(16, 128), (16, 128), (16, 128), (16, 128)]
            expand_out = [64, 64, 64, 64]
            concat_back = [128, 128, 128, 128]
            b_mid, b_out, b5d_mid, b5d_out = 16, 64, 16, 128
        else:
            enc = [(16, 32), (32, 64), (64, 128), (128, 256)]
            merge_out = [64, 128, 256, 512]
            dec = [(16, 32), (32, 64), (64, 128), (128, 256)]
            expand_out = [32, 64, 128, 256]
            concat_back = [32, 64, 128, 256]
            b_mid, b_out, b5d_mid, b5d_out = 256, 512, 256, 512

        stage_ips = [ref_scale_value(ips, scales[:i]) for i in range(4)]

        mini_cls = MUSSND
        if self.remat:
            # FULL recompute (unlike m2net._stage_blocks, no scan-output
            # saving): SSND2Net's 14-block full-res stages still need 21.4 GB
            # with the saved scan residuals (48 GB without remat) on a
            # 15.75 GB chip, so the scan forward re-runs in the backward
            mini_cls = nn.remat(MUSSND, static_argnums=(2,))

        def mini(mid, out, n, ipsize, name, add_last=True):
            return mini_cls(mid, out, n, dim, ipsize, add_last=add_last,
                            name=name)

        # ------------------------------ encoder
        skips = []
        h = x
        for i in range(4):
            h = mini(enc[i][0], enc[i][1], _N_LAYERS[i], stage_ips[i],
                     f"stage{i + 1}")(h, train)
            skips.append(h)
            h = PatchMergingND(h.shape[-1], scales[i], merge_out[i],
                               name=f"patch_merging{i + 1}")(h)
        # bottleneck minis: NO input_patch_size -> no internal downsampling
        hx5 = mini(b_mid, b_out, 4, None, "stage5")(h, train)
        h = PatchMergingND(b_out, scales[4], b_out, name="patch_merging5")(hx5)
        hx6 = mini(b_mid, b_out, 4, None, "stage6")(h, train)
        hx6up = PatchExpandND(b_out, scales[4], output_dim=b_out,
                              name="patch_expand5d")(hx6)
        hx5d = mini(b5d_mid, b5d_out, 4, None, "stage5d")(
            jnp.concatenate([pad_to_match(hx6up, hx5.shape[1:-1]), hx5], -1),
            train)

        # ------------------------------ decoder
        dec_ips = [stage_ips[3], stage_ips[2], stage_ips[1], stage_ips[0]]
        h = hx5d
        dec_feats = []
        for j, i in enumerate(range(3, -1, -1)):
            h = PatchExpandND(h.shape[-1], scales[i], output_dim=expand_out[i],
                              name=f"patch_expand{i + 1}d")(h)
            h = jnp.concatenate([pad_to_match(h, skips[i].shape[1:-1]),
                                 skips[i]], -1)
            h = nn.Dense(concat_back[i], name=f"concat_back_dim{i + 1}d")(h)
            h = mini(dec[i][0], dec[i][1], _N_LAYERS[i], dec_ips[j],
                     f"stage{i + 1}d")(h, train)
            dec_feats.append(h)
        hx4d, hx3d, hx2d, hx1d = dec_feats

        # ------------------------------ heads (3x3 sides)
        sides = []
        for i, f in enumerate([hx1d, hx2d, hx3d, hx4d, hx5d, hx6]):
            sides.append(nn.Conv(self.num_classes, (3,) * dim, padding="SAME",
                                 name=f"side{i + 1}")(f))
        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            sides, full_res)
        outs = [o.astype(jnp.float32) for o in [d0] + sides]
        return outs if self.deep_supervision else [outs[0]]


def get_ssnd2net_from_plans(plans_manager, dataset_json, configuration_manager,
                            num_input_channels, deep_supervision=True,
                            dtype=None, small=False):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    assert dim in (2, 3)
    return SSND2Net(num_classes=label_manager.num_segmentation_heads, dim=dim,
                    deep_supervision=deep_supervision, small=small,
                    patch_size=tuple(configuration_manager.patch_size))


register_model("nnUNetTrainerSSND2Net", get_ssnd2net_from_plans)
register_model("nnUNetTrainerSSND2NetP",
               lambda *a, **k: get_ssnd2net_from_plans(*a, **k, small=True))
