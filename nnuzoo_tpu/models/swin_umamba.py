"""SwinUMamba / SwinUMambaD (reference: `nnunetv2/nets/SwinUMamba.py:456-717`,
`nnunetv2/nets/SwinUMambaD.py:530-780`).

Conv stem (7x7 stride 2) -> VSSM encoder (patch 2, depths 2/2/9/2, dims
96/192/384/768 of SS2D blocks with PatchMerging) -> UNETR-style residual conv
decoder (SwinUMamba) or a Mamba-based decoder (SwinUMambaD). Deep supervision at
/1, /2, /4, /8. 2D.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .registry import register_model
from .ss2d import VSSLayer
from .unetr import UnetrBasicBlock, UnetrUpBlock
from .vssm import PatchEmbed2D, PatchExpand, PatchMerging2D


class _VSSMBackbone(nn.Module):
    depths: Sequence[int] = (2, 2, 9, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    patch_size: int = 2
    drop_path_rate: float = 0.2  # reference `SwinUMamba.py:369`
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        layer_cls = VSSLayer
        if self.remat:
            # recompute each VSS layer's internals in the backward (the SS2D
            # in_proj/conv/scan-glue residuals dominate activation memory at
            # canonical scale) but keep the scan kernel outputs + carries so
            # its forward is not re-run (same policy as m2net._stage_blocks)
            import jax
            policy = jax.checkpoint_policies.save_only_these_names(
                "scan_y", "scan_carries")
            layer_cls = nn.remat(VSSLayer, static_argnums=(2,), policy=policy)
        outs = [x]
        h = PatchEmbed2D(self.patch_size, self.dims[0], name="patch_embed")(x)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * j / max(1, total - 1)
               for j in range(total)]
        for i, depth in enumerate(self.depths):
            lo = sum(self.depths[:i])
            h = layer_cls(self.dims[i], depth,
                          drop_path=tuple(dpr[lo:lo + depth]),
                          name=f"layer{i}")(h, train)
            outs.append(h)
            if i < len(self.depths) - 1:
                h = PatchMerging2D(self.dims[i], 2, self.dims[i + 1],
                                   name=f"down{i}")(h)
        return outs


class SwinUMamba(nn.Module):
    num_classes: int
    feat_size: Sequence[int] = (48, 96, 192, 384, 768)
    deep_supervision: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.feat_size
        stem = nn.Conv(f[0], (7, 7), strides=(2, 2), padding="SAME",
                       name="stem_conv")(x)
        stem = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                            name="stem_norm")(stem)
        vss_outs = _VSSMBackbone(remat=self.remat,
                                 name="vssm_encoder")(stem, train=train)

        enc1 = UnetrBasicBlock(f[0], 2, name="encoder1")(x)            # /1
        enc2 = UnetrBasicBlock(f[1], 2, name="encoder2")(vss_outs[0])  # /2
        enc3 = UnetrBasicBlock(f[2], 2, name="encoder3")(vss_outs[1])  # /4
        enc4 = UnetrBasicBlock(f[3], 2, name="encoder4")(vss_outs[2])  # /8
        enc5 = UnetrBasicBlock(f[4], 2, name="encoder5")(vss_outs[3])  # /16
        enc_hidden = vss_outs[4]                                       # /32 768

        dec4 = UnetrUpBlock(f[4], 2, name="decoder6")(enc_hidden, enc5)
        dec3 = UnetrUpBlock(f[3], 2, name="decoder5")(dec4, enc4)
        dec2 = UnetrUpBlock(f[2], 2, name="decoder4")(dec3, enc3)
        dec1 = UnetrUpBlock(f[1], 2, name="decoder3")(dec2, enc2)
        dec0 = UnetrUpBlock(f[0], 2, name="decoder2")(dec1, enc1)
        dec_out = UnetrBasicBlock(f[0], 2, name="decoder1")(dec0)

        # heads at /1, /2, /4, /8 (reference `SwinUMamba.py:598-620`)
        feat_out = [dec_out, dec1, dec2, dec3]
        outs = []
        n = 4 if self.deep_supervision else 1
        for i in range(4):
            if i < n:
                outs.append(nn.Conv(self.num_classes, (1, 1),
                                    name=f"out{i}")(feat_out[i])
                            .astype(jnp.float32))
        return outs


class SwinUMambaD(nn.Module):
    """Same encoder; decoder built from VSS (mamba) blocks with PatchExpand
    upsampling (reference `SwinUMambaD.py:530-641` UNetResDecoder)."""
    num_classes: int
    feat_size: Sequence[int] = (48, 96, 192, 384, 768)
    deep_supervision: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.feat_size
        stem = nn.Conv(f[0], (7, 7), strides=(2, 2), padding="SAME",
                       name="stem_conv")(x)
        stem = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                            name="stem_norm")(stem)
        vss_outs = _VSSMBackbone(remat=self.remat,
                                 name="vssm_encoder")(stem, train=train)

        skips = [stem, vss_outs[1], vss_outs[2], vss_outs[3]]  # /2 /4 /8 /16
        h = vss_outs[4]  # /32
        dims = (96, 192, 384, 768)
        dec_feats = []
        for i in range(3, -1, -1):
            target_c = dims[i - 1] if i > 0 else f[0]
            h = PatchExpand(h.shape[-1], 2, output_dim=skips[i].shape[-1],
                            name=f"expand{i}")(h)
            h = jnp.concatenate([h, skips[i]], -1)
            h = nn.Dense(skips[i].shape[-1], name=f"concat_back{i}")(h)
            h = VSSLayer(skips[i].shape[-1], 1, name=f"dec_vss{i}")(h, train=train)
            dec_feats.append(h)

        # final upsample to input resolution
        out_full = PatchExpand(h.shape[-1], 2, output_dim=f[0],
                               name="final_expand")(h)
        feat_out = [out_full, dec_feats[-1], dec_feats[-2], dec_feats[-3]]
        outs = []
        n = 4 if self.deep_supervision else 1
        for i in range(n):
            outs.append(nn.Conv(self.num_classes, (1, 1),
                                name=f"out{i}")(feat_out[i]).astype(jnp.float32))
        return outs


def get_swin_umamba_from_plans(plans_manager, dataset_json, configuration_manager,
                               num_input_channels, deep_supervision=True,
                               dtype=None, mamba_decoder=False):
    label_manager = plans_manager.get_label_manager(dataset_json)
    assert len(configuration_manager.patch_size) == 2, "SwinUMamba is 2D-only"
    cls = SwinUMambaD if mamba_decoder else SwinUMamba
    return cls(num_classes=label_manager.num_segmentation_heads,
               deep_supervision=deep_supervision)


register_model("nnUNetTrainerSwinUMamba", get_swin_umamba_from_plans)
register_model("nnUNetTrainerSwinUMambaD",
               lambda *a, **k: get_swin_umamba_from_plans(*a, **k,
                                                          mamba_decoder=True))


def load_vmamba_pretrained(params: dict, ckpt_path: str, verbose: bool = True):
    """Transfer ImageNet-pretrained VMamba weights into the SwinUMamba(D)
    vssm_encoder (reference `SwinUMamba.py:637-668` ``load_pretrained_ckpt``).

    Maps torch ``layers.{i}.blocks.{j}.*`` / ``layers.{i}.downsample.*`` keys
    onto the flax ``vssm_encoder/layer{i}/block{j}`` / ``down{i}`` tree with
    layout conversion (Linear transpose, depthwise-conv HWIO). Skips
    patch_embed / final norm / head like the reference. Returns (new_params,
    number of transferred tensors).
    """
    import numpy as np
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)

    inner = params["params"] if "params" in params else params
    enc = inner.get("vssm_encoder")
    assert enc is not None, "params has no vssm_encoder subtree"

    skip_prefixes = ("patch_embed.", "norm.", "head.")

    def to_np(t):
        return np.asarray(t.detach().cpu().numpy())

    n_loaded = 0

    def put(dst: dict, leaf: str, value, key: str):
        nonlocal n_loaded
        assert leaf in dst, f"{key}: flax leaf {leaf} missing"
        assert dst[leaf].shape == value.shape, (
            f"{key}: shape mismatch {value.shape} vs {dst[leaf].shape}")
        dst[leaf] = value.astype(dst[leaf].dtype)
        n_loaded += 1

    import copy
    enc = copy.deepcopy(enc)
    for key, v in sd.items():
        if any(key.startswith(p) for p in skip_prefixes):
            continue
        parts = key.split(".")
        if parts[0] != "layers":
            if verbose:
                print(f"passing: {key}")
            continue
        i = int(parts[1])
        v = to_np(v)
        if parts[2] == "downsample":
            down = enc.get(f"down{i}")
            if down is None:
                continue
            if parts[3] == "norm":
                put(down["norm"], "scale" if parts[4] == "weight" else "bias",
                    v, key)
            elif parts[3] == "reduction":
                put(down["reduction"], "kernel", v.T, key)
            continue
        if parts[2] != "blocks":
            if verbose:
                print(f"passing: {key}")
            continue
        j = int(parts[3])
        blk = enc.get(f"layer{i}", {}).get(f"block{j}")
        if blk is None:
            continue
        rest = parts[4:]
        if rest[0] == "ln_1":
            put(blk["ln_1"], "scale" if rest[1] == "weight" else "bias", v, key)
        elif rest[0] == "self_attention":
            sa = blk["self_attention"]
            sub = rest[1]
            if sub == "in_proj":
                put(sa["in_proj"], "kernel", v.T, key)
            elif sub == "out_proj":
                put(sa["out_proj"], "kernel", v.T, key)
            elif sub == "conv2d":
                if rest[2] == "weight":
                    # torch depthwise (D, 1, kh, kw) -> flax HWIO (kh, kw, 1, D)
                    put(sa["conv2d"], "kernel", v.transpose(2, 3, 1, 0), key)
                else:
                    put(sa["conv2d"], "bias", v, key)
            elif sub == "out_norm":
                put(sa["out_norm"], "scale" if rest[2] == "weight" else "bias",
                    v, key)
            elif sub in ("x_proj_weight", "dt_projs_weight", "dt_projs_bias",
                         "A_logs", "Ds"):
                put(sa, sub, v, key)
            elif verbose:
                print(f"passing: {key}")
        elif verbose:
            print(f"passing: {key}")

    new_inner = dict(inner)
    new_inner["vssm_encoder"] = enc
    out = dict(params)
    if "params" in params:
        out["params"] = new_inner
        return out, n_loaded
    return new_inner, n_loaded
