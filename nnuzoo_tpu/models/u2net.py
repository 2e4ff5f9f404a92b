"""U²-Net family (reference: `nnunetv2/nets/u2net.py:33-600`).

Nested-U architecture: six encoder stages of RSU blocks (mini U-Nets with residual
input connection, depth 7 down to 4), two dilated RSU4F stages at the bottom, a
mirrored decoder, and 7 outputs — fused ``d0`` plus six side heads, all upsampled
to full resolution. Deep-supervision targets are therefore full-res (scales all 1).

Channels-last Flax implementation; 2D (the reference U2NET/U2NETP is 2D-only; the
N-D generalization lives in u2net_multi).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import max_pool, resize_linear
from .registry import register_model


class REBNCONV(nn.Module):
    """conv3x3(dilate) -> InstanceNorm-free BN? reference uses BatchNorm; we use
    GroupNorm(all-channels) which is batch-size independent and TPU-friendly."""
    features: int
    dirate: int = 1
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3,) * self.dim,
                    kernel_dilation=(self.dirate,) * self.dim, padding="SAME",
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         name="norm")(x)
        return nn.relu(x)


class RSU(nn.Module):
    """RSU-L: input conv to out_ch, then an L-level U on mid_ch with a dilated
    bottom conv, residual-added to the input conv (reference RSU7..RSU4)."""
    levels: int  # 7 for RSU7 ... 4 for RSU4
    mid_ch: int
    out_ch: int
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, 1, self.dim, name="rebnconvin")(x)

        # encoder path: levels-1 convs with pooling between
        enc = []
        hx = hxin
        for i in range(self.levels - 1):
            hx = REBNCONV(self.mid_ch, 1, self.dim, name=f"enc{i + 1}")(hx)
            enc.append(hx)
            if i < self.levels - 2:
                hx = max_pool(hx, 2, self.dim)
        # bottom: dilated conv at the coarsest resolution
        hx = REBNCONV(self.mid_ch, 2, self.dim, name="bottom")(hx)

        # decoder path: every intermediate conv stays at mid_ch; only the
        # final one emits out_ch (reference RSU7 `u2net.py:46-56`)
        for i in range(self.levels - 2, 0, -1):
            hx = REBNCONV(self.mid_ch, 1, self.dim,
                          name=f"dec{i}")(jnp.concatenate([hx, enc[i]], -1))
            hx = resize_linear(hx, enc[i - 1].shape[1:-1], self.dim)
        hx = REBNCONV(self.out_ch, 1, self.dim, name="dec0")(
            jnp.concatenate([hx, enc[0]], -1))
        return hx + hxin


class RSU4F(nn.Module):
    """Dilated RSU without pooling (reference `u2net.py:284-318`):
    dilations 1,2,4,8 down, 4,2,1 up."""
    mid_ch: int
    out_ch: int
    dim: int = 2

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, 1, self.dim, name="rebnconvin")(x)
        hx1 = REBNCONV(self.mid_ch, 1, self.dim, name="conv1")(hxin)
        hx2 = REBNCONV(self.mid_ch, 2, self.dim, name="conv2")(hx1)
        hx3 = REBNCONV(self.mid_ch, 4, self.dim, name="conv3")(hx2)
        hx4 = REBNCONV(self.mid_ch, 8, self.dim, name="conv4")(hx3)
        hx3d = REBNCONV(self.mid_ch, 4, self.dim, name="conv3d")(
            jnp.concatenate([hx4, hx3], -1))
        hx2d = REBNCONV(self.mid_ch, 2, self.dim, name="conv2d")(
            jnp.concatenate([hx3d, hx2], -1))
        hx1d = REBNCONV(self.out_ch, 1, self.dim, name="conv1d")(
            jnp.concatenate([hx2d, hx1], -1))
        return hx1d + hxin


class U2Net(nn.Module):
    """Full-size (stage channels 64..512) or small 'P' (all 64) variant."""
    num_classes: int
    small: bool = False
    deep_supervision: bool = True
    dim: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.small:
            cfg_enc = [(7, 16, 64), (6, 16, 64), (5, 16, 64), (4, 16, 64)]
            f4, m4f = 64, 16
            cfg_dec = [(4, 16, 64), (5, 16, 64), (6, 16, 64), (7, 16, 64)]
        else:
            cfg_enc = [(7, 32, 64), (6, 32, 128), (5, 64, 256), (4, 128, 512)]
            f4, m4f = 512, 256
            cfg_dec = [(4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64)]

        full_res = x.shape[1:-1]
        skips = []
        hx = x
        for i, (lv, mid, out) in enumerate(cfg_enc):
            hx = RSU(lv, mid, out, self.dim, name=f"stage{i + 1}")(hx)
            skips.append(hx)
            hx = max_pool(hx, 2, self.dim)
        hx5 = RSU4F(m4f, f4, self.dim, name="stage5")(hx)
        hx = max_pool(hx5, 2, self.dim)
        hx6 = RSU4F(m4f, f4, self.dim, name="stage6")(hx)

        hx6up = resize_linear(hx6, hx5.shape[1:-1], self.dim)
        hx5d = RSU4F(m4f, f4, self.dim, name="stage5d")(
            jnp.concatenate([hx6up, hx5], -1))
        dec_feats = [hx5d]
        hx = hx5d
        for i, (lv, mid, out) in enumerate(cfg_dec):
            hx = resize_linear(hx, skips[3 - i].shape[1:-1], self.dim)
            hx = RSU(lv, mid, out, self.dim, name=f"stage{4 - i}d")(
                jnp.concatenate([hx, skips[3 - i]], -1))
            dec_feats.append(hx)

        # side heads: d1 (finest) .. d6, all upsampled to full res
        sides = []
        feats = [dec_feats[4], dec_feats[3], dec_feats[2], dec_feats[1],
                 dec_feats[0], hx6]
        for i, f in enumerate(feats):
            d = nn.Conv(self.num_classes, (3,) * self.dim, padding="SAME",
                        name=f"side{i + 1}")(f)
            if f.shape[1:-1] != tuple(full_res):
                d = resize_linear(d, full_res, self.dim)
            sides.append(d.astype(jnp.float32))
        d0 = nn.Conv(self.num_classes, (1,) * self.dim, name="outconv")(
            jnp.concatenate(sides, -1)).astype(jnp.float32)

        if self.deep_supervision:
            return [d0] + sides
        return [d0]


def get_u2net_from_plans(plans_manager, dataset_json, configuration_manager,
                         num_input_channels, deep_supervision=True,
                         dtype=jnp.float32, small=False):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    return U2Net(num_classes=label_manager.num_segmentation_heads, small=small,
                 deep_supervision=deep_supervision, dim=dim)


register_model("nnUNetTrainerU2Net", get_u2net_from_plans)
register_model("nnUNetTrainerU2NetP",
               lambda *a, **k: get_u2net_from_plans(*a, **k, small=True))
