"""M2Net / SS2D2Net — the flagship X2Net hybrid (reference:
`nnunetv2/nets/m2net.py:805-1251`).

U2Net macro-topology where stages 1-4 (encoder and decoder) are mini VSSM U-Nets
("MU") running 4-direction selective scans, stages 5/6 are dilated RSU4F conv
blocks; PatchMerging2D downsamples between encoder stages, PatchExpand +
concat-back Linear upsamples in the decoder; 6 side heads at their native stage
resolutions (d0/d1 full res, d2 1/2, ... d6 1/32 -- matching the trainer's x2net
deep-supervision scales) plus the fused d0 via a 1x1 conv over all upsampled sides.

M2NetP: 64/128-channel lightweight variant whose decoder concatenates skips
directly into wider MUs (no concat_back_dim linear).
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import pad_to_match, resize_linear
from .registry import register_model
from .u2net import RSU4F
from .vssm import MU, PatchExpand, PatchMerging2D


def _maxpool2_ceil(x):
    """2x2 stride-2 maxpool with ceil_mode (pad odd edges with -inf)."""
    B, H, W, C = x.shape
    ph, pw = H % 2, W % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _stage_blocks(remat: bool):
    """Optionally remat the per-stage sub-networks: with ``remat=True`` each
    MU / RSU4F stage's internal activations are recomputed in the backward
    pass (flash-style), cutting peak HBM by ~the stage depth — required to fit
    the canonical 256x224 b12 training step on a 16 GB v5e chip."""
    if not remat:
        return MU, RSU4F
    import jax
    # keep the selective-scan outputs + backward carries across the remat
    # boundary: the scan kernel's forward is NOT re-run during backward
    # (everything else in the stage is recomputed)
    policy = jax.checkpoint_policies.save_only_these_names(
        "scan_y", "scan_carries")
    return (nn.remat(MU, static_argnums=(2,), policy=policy),
            nn.remat(RSU4F, policy=policy))



class _DistributedOutConv(nn.Module):
    """The fused d0 head, computed distributively: ``outconv(cat(d1,
    upsample(d2..d6)))`` == ``sum_i upsample(d_i @ W_i) + b`` because the 1x1
    conv and the (channel-independent) bilinear resize are both linear and
    commute. Applying each W_i slice at the side's NATIVE resolution removes
    the (B, full_res, 6*nc) concat buffer — one of the largest allocations in
    the canonical program. Parameter layout (kernel/bias) is identical to the
    nn.Conv it replaces, so checkpoints are unaffected."""
    num_classes: int

    @nn.compact
    def __call__(self, sides, full_res):
        nc = self.num_classes
        dim = len(full_res)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*(1,) * dim, len(sides) * nc, nc))
        bias = self.param("bias", nn.initializers.zeros, (nc,))
        k2d = kernel.reshape(len(sides) * nc, nc)
        out = None
        for i, d in enumerate(sides):
            w = k2d[i * nc:(i + 1) * nc, :]
            e = jnp.einsum("...c,cd->...d", d, w)
            if tuple(d.shape[1:-1]) != tuple(full_res):
                e = resize_linear(e, full_res, dim)
            out = e if out is None else out + e
        return out + bias


class M2Net(nn.Module):
    num_classes: int
    deep_supervision: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        full_res = x.shape[1:3]
        MU, RSU4F = _stage_blocks(self.remat)

        # ------------------------------ encoder
        hx1 = MU(x.shape[-1], 16, 32, 7, name="stage1")(x, train)
        hx = PatchMerging2D(32, 2, name="patch_merging1")(hx1)         # 64 @ /2
        hx2 = MU(64, 32, 64, 6, name="stage2")(hx, train)
        hx = PatchMerging2D(64, 2, name="patch_merging2")(hx2)         # 128 @ /4
        hx3 = MU(128, 64, 128, 5, name="stage3")(hx, train)
        hx = PatchMerging2D(128, 2, name="patch_merging3")(hx3)        # 256 @ /8
        hx4 = MU(256, 128, 256, 4, name="stage4")(hx, train)
        hx = PatchMerging2D(256, 2, name="patch_merging4")(hx4)        # 512 @ /16
        hx5 = RSU4F(256, 512, name="stage5")(hx)
        hx = _maxpool2_ceil(hx5)                                        # 512 @ /32
        hx6 = RSU4F(256, 512, name="stage6")(hx)
        hx6up = resize_linear(hx6, hx5.shape[1:3], 2)

        # ------------------------------ decoder
        hx5d = RSU4F(256, 512, name="stage5d")(
            jnp.concatenate([hx6up, hx5], -1))
        up = PatchExpand(512, 2, name="patch_expand4d")(hx5d)           # 256 @ /8
        up = nn.Dense(256, name="concat_back_dim4d")(
            jnp.concatenate([pad_to_match(up, hx4.shape[1:-1]), hx4], -1))
        hx4d = MU(256, 128, 256, 4, name="stage4d")(up, train)
        up = PatchExpand(256, 2, name="patch_expand3d")(hx4d)          # 128 @ /4
        up = nn.Dense(128, name="concat_back_dim3d")(
            jnp.concatenate([pad_to_match(up, hx3.shape[1:-1]), hx3], -1))
        hx3d = MU(128, 64, 128, 5, name="stage3d")(up, train)
        up = PatchExpand(128, 2, name="patch_expand2d")(hx3d)          # 64 @ /2
        up = nn.Dense(64, name="concat_back_dim2d")(
            jnp.concatenate([pad_to_match(up, hx2.shape[1:-1]), hx2], -1))
        hx2d = MU(64, 32, 64, 6, name="stage2d")(up, train)
        up = PatchExpand(64, 2, name="patch_expand1d")(hx2d)           # 32 @ /1
        up = nn.Dense(32, name="concat_back_dim1d")(
            jnp.concatenate([pad_to_match(up, hx1.shape[1:-1]), hx1], -1))
        hx1d = MU(32, 16, 32, 7, name="stage1d")(up, train)

        # ------------------------------ heads (native resolutions)
        d1 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side1")(hx1d)
        d2 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side2")(hx2d)
        d3 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side3")(hx3d)
        d4 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side4")(hx4d)
        d5 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side5")(hx5d)
        d6 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side6")(hx6)

        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            [d1, d2, d3, d4, d5, d6], full_res)

        outs = [d0, d1, d2, d3, d4, d5, d6]
        outs = [o.astype(jnp.float32) for o in outs]
        return outs if self.deep_supervision else [outs[0]]


class M2NetP(nn.Module):
    num_classes: int
    deep_supervision: bool = True
    remat: bool = False
    # remat only the memory-dominant full/half-resolution stages; the /8-and-
    # deeper stages keep their activations (their recompute cost buys little)
    remat_deep_stages: bool = False
    # per-stage MU depths (reference `m2net.py:884-940`: 7/6/5/4). Override
    # only for resource-capped validation runs (e.g. the multi-chip dryrun on
    # virtual CPU devices, where XLA:CPU's 40 s collective-rendezvous kill
    # bounds per-device compute between collectives).
    stage_layers: Sequence[int] = (7, 6, 5, 4)

    @nn.compact
    def __call__(self, x, train: bool = True):
        full_res = x.shape[1:3]
        sl = self.stage_layers
        MU_r, RSU4F_r = _stage_blocks(self.remat)
        MU_s, RSU4F_s = (MU_r, RSU4F_r) if self.remat_deep_stages             else (MU, RSU4F)

        hx1 = MU_r(x.shape[-1], 16, 64, sl[0], name="stage1")(x, train)
        hx = PatchMerging2D(64, 2, output_features=64, name="patch_merging1")(hx1)
        hx2 = MU_r(64, 16, 64, sl[1], name="stage2")(hx, train)
        hx = PatchMerging2D(64, 2, output_features=64, name="patch_merging2")(hx2)
        hx3 = MU_s(64, 16, 64, sl[2], name="stage3")(hx, train)
        hx = PatchMerging2D(64, 2, output_features=64, name="patch_merging3")(hx3)
        hx4 = MU_s(64, 16, 64, sl[3], name="stage4")(hx, train)
        hx = PatchMerging2D(64, 2, output_features=64, name="patch_merging4")(hx4)
        hx5 = RSU4F_s(16, 64, name="stage5")(hx)
        hx = _maxpool2_ceil(hx5)
        hx6 = RSU4F_s(16, 64, name="stage6")(hx)
        hx6up = resize_linear(hx6, hx5.shape[1:3], 2)

        hx5d = RSU4F_s(16, 128, name="stage5d")(jnp.concatenate([hx6up, hx5], -1))
        up = PatchExpand(128, 2, name="patch_expand4d")(hx5d)          # 64 ch
        hx4d = MU_s(128, 16, 128, sl[3], name="stage4d")(
            jnp.concatenate([pad_to_match(up, hx4.shape[1:-1]), hx4], -1), train)
        up = PatchExpand(128, 2, name="patch_expand3d")(hx4d)
        hx3d = MU_s(128, 16, 128, sl[2], name="stage3d")(
            jnp.concatenate([pad_to_match(up, hx3.shape[1:-1]), hx3], -1), train)
        up = PatchExpand(128, 2, name="patch_expand2d")(hx3d)
        hx2d = MU_r(128, 16, 128, sl[1], name="stage2d")(
            jnp.concatenate([pad_to_match(up, hx2.shape[1:-1]), hx2], -1), train)
        up = PatchExpand(128, 2, name="patch_expand1d")(hx2d)
        hx1d = MU_r(128, 16, 128, sl[0], name="stage1d")(
            jnp.concatenate([pad_to_match(up, hx1.shape[1:-1]), hx1], -1), train)

        d1 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side1")(hx1d)
        d2 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side2")(hx2d)
        d3 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side3")(hx3d)
        d4 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side4")(hx4d)
        d5 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side5")(hx5d)
        d6 = nn.Conv(self.num_classes, (3, 3), padding="SAME", name="side6")(hx6)

        d0 = _DistributedOutConv(self.num_classes, name="outconv")(
            [d1, d2, d3, d4, d5, d6], full_res)

        outs = [d0, d1, d2, d3, d4, d5, d6]
        outs = [o.astype(jnp.float32) for o in outs]
        return outs if self.deep_supervision else [outs[0]]


def get_m2net_from_plans(plans_manager, dataset_json, configuration_manager,
                         num_input_channels, deep_supervision=True,
                         dtype=None, small=False, remat=None):
    label_manager = plans_manager.get_label_manager(dataset_json)
    assert len(configuration_manager.patch_size) == 2, "M2Net is 2D-only"
    cls = M2NetP if small else M2Net
    if remat is None:
        # auto: remat the stages when the per-step activation volume is large
        # enough to threaten 16 GB HBM (canonical 256x224 b12 needs it)
        import os
        env = os.environ.get("NNUZOO_REMAT", "auto")
        if env in ("0", "1"):
            remat = env == "1"
        else:
            import numpy as _np
            voxels = configuration_manager.batch_size * int(
                _np.prod(configuration_manager.patch_size))
            remat = voxels >= 300_000
    return cls(num_classes=label_manager.num_segmentation_heads,
               deep_supervision=deep_supervision, remat=remat)


register_model("nnUNetTrainerM2Net", get_m2net_from_plans)
register_model("nnUNetTrainerM2NetP",
               lambda *a, **k: get_m2net_from_plans(*a, **k, small=True))
# fine-tuning trainer uses the M2Net architecture (reference
# nnUNetTrainerFineTuneDecoderWarmUp builds M2Net)
register_model("nnUNetTrainerFineTuneDecoderWarmUp", get_m2net_from_plans)
