"""Load torch reference nets from the read-only `/root/reference` tree with
param-faithful stubs for the packages absent in this container (`mamba_ssm`,
`monai`, `timm`, `dynamic_network_architectures`) and for the CUDA-only
extensions.

The stubs replicate the exact PARAMETER STRUCTURE of the real packages (shapes,
bias flags, norm affine-ness) so instantiated reference nets have the true
parameter counts, and — for the pure-torch execution paths (Mamba1 recurrence,
monai ViT attention, interpolating UpSample) — the true forward semantics, so
weight-transfer logit-parity tests can run without CUDA. No reference code is
copied; modules are executed from the reference tree.

Stub fidelity sources (public API of the pinned upstream packages):
  mamba_ssm.Mamba      — in/out proj, dw-conv1d, x_proj/dt_proj, A_log/D
  mamba_ssm Mamba2     — fused in_proj(2*d_inner+2*ngroups*d_state+nheads),
                         conv over (d_inner+2*ngroups*d_state), per-head
                         dt_bias/A_log/D, gated RMSNorm, out_proj
  monai Convolution    — conv_only call sites only (all the reference uses)
  monai UpSample       — NONTRAINABLE (interpolate) call sites only
  monai ViT            — conv PatchEmbedding + pos emb, SABlock(qkv fused),
                         MLPBlock, per-block LN pairs, final LN
"""

import importlib.util
import math
import sys
import types

import numpy as np

REF_ROOT = "/root/reference"


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def build_stub_modules():
    """Return {module_name: module} covering every third-party import of the
    reference `nets/` files (verified by grep over `/root/reference`)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # ------------------------------------------------------------- timm
    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # parity tests run in eval mode
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    timm = _mod("timm")
    timm.layers = _mod("timm.layers", DropPath=DropPath,
                       trunc_normal_=trunc_normal_)

    # ------------------------------------------------------------- dyn-arch
    def init_last_bn_before_add_to_0(module):
        return module

    dna = _mod("dynamic_network_architectures")
    dna_init = _mod("dynamic_network_architectures.initialization")
    dna_wi = _mod("dynamic_network_architectures.initialization.weight_init",
                  init_last_bn_before_add_to_0=init_last_bn_before_add_to_0)

    # ------------------------------------------------------------- monai
    def _same_padding(kernel_size, dilation=1):
        ks = np.atleast_1d(kernel_size)
        dl = np.atleast_1d(dilation)
        pad = (ks - 1) / 2 * dl
        out = tuple(int(p) for p in pad)
        return out if len(out) > 1 else out[0]

    class Convolution(nn.Sequential):
        """conv_only=True call sites only (every reference use)."""

        def __init__(self, spatial_dims, in_channels, out_channels, strides=1,
                     kernel_size=3, adn_ordering="NDA", act="PRELU",
                     norm="INSTANCE", dropout=None, dropout_dim=1, dilation=1,
                     groups=1, bias=True, conv_only=False, is_transposed=False,
                     padding=None, output_padding=None):
            super().__init__()
            assert conv_only, "stub covers the reference's conv_only usage only"
            if padding is None:
                padding = _same_padding(kernel_size, dilation)
            if is_transposed:
                if output_padding is None:
                    pad = np.atleast_1d(padding)
                    st = np.atleast_1d(strides)
                    op = 2 * pad + np.atleast_1d(st) - np.atleast_1d(
                        kernel_size) - (np.atleast_1d(dilation) - 1) * 0
                    output_padding = tuple(int(v) for v in op)
                    if len(output_padding) == 1:
                        output_padding = output_padding[0]
                tconv_type = (nn.ConvTranspose1d, nn.ConvTranspose2d,
                              nn.ConvTranspose3d)[spatial_dims - 1]
                self.add_module("conv", tconv_type(
                    in_channels, out_channels, kernel_size, strides, padding,
                    output_padding, groups, bias, dilation))
                return
            conv_type = (nn.Conv1d, nn.Conv2d, nn.Conv3d)[spatial_dims - 1]
            self.add_module("conv", conv_type(
                in_channels, out_channels, kernel_size, strides, padding,
                dilation, groups, bias))

    class UpSample(nn.Module):
        """NONTRAINABLE (param-free interpolate) call sites only."""

        def __init__(self, spatial_dims=None, in_channels=None,
                     out_channels=None, scale_factor=2, size=None,
                     mode="nontrainable", interp_mode="linear",
                     align_corners=False, **_kw):
            super().__init__()
            m = str(getattr(mode, "value", mode)).lower()
            assert m == "nontrainable", m
            self.size = tuple(int(s) for s in size) if size is not None else None
            self.scale = scale_factor
            self.align = align_corners

        def forward(self, x):
            interp = {1: "linear", 2: "bilinear", 3: "trilinear"}[x.dim() - 2]
            return F.interpolate(
                x, size=self.size,
                scale_factor=None if self.size is not None else self.scale,
                mode=interp, align_corners=self.align)

    def get_conv_layer(spatial_dims, in_channels, out_channels, kernel_size=3,
                       stride=1, bias=False):
        return Convolution(spatial_dims, in_channels, out_channels,
                           strides=stride, kernel_size=kernel_size, bias=bias,
                           conv_only=True)

    def get_upsample_layer(spatial_dims, in_channels,
                           upsample_mode="nontrainable", scale_factor=2):
        return UpSample(spatial_dims, in_channels, in_channels,
                        scale_factor=scale_factor, mode=upsample_mode)

    from enum import Enum

    class UpsampleMode(str, Enum):  # real Enum: `UpsampleMode(x)` and
        NONTRAINABLE = "nontrainable"   # `UpsampleMode | str` must both work
        DECONV = "deconv"
        PIXELSHUFFLE = "pixelshuffle"

    class InterpolateMode(str, Enum):
        NEAREST = "nearest"
        LINEAR = "linear"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"
        TRILINEAR = "trilinear"
        AREA = "area"

    def ensure_tuple_rep(val, dim):
        if isinstance(val, (tuple, list)):
            assert len(val) == dim
            return tuple(val)
        return (val,) * dim

    def get_act_layer(name):
        if isinstance(name, (tuple, list)):
            nm, args = name[0], dict(name[1]) if len(name) > 1 else {}
        else:
            nm, args = name, {}
        table = {"RELU": nn.ReLU, "PRELU": nn.PReLU, "GELU": nn.GELU,
                 "LEAKYRELU": nn.LeakyReLU, "SILU": nn.SiLU,
                 "SWISH": nn.SiLU}
        return table[str(nm).upper()](**args)

    def get_norm_layer(name, spatial_dims=1, channels=1):
        if isinstance(name, (tuple, list)):
            nm, args = name[0], dict(name[1]) if len(name) > 1 else {}
        else:
            nm, args = name, {}
        nm = str(nm).upper()
        if nm == "GROUP":
            return nn.GroupNorm(num_channels=channels, **args)
        if nm == "INSTANCE":
            t = (nn.InstanceNorm1d, nn.InstanceNorm2d,
                 nn.InstanceNorm3d)[spatial_dims - 1]
            return t(channels, **args)
        if nm == "BATCH":
            t = (nn.BatchNorm1d, nn.BatchNorm2d,
                 nn.BatchNorm3d)[spatial_dims - 1]
            return t(channels, **args)
        raise KeyError(nm)

    class _DropoutFactory:
        DROPOUT = "dropout"
        ALPHADROPOUT = "alphadropout"

        def __getitem__(self, key):
            kind, dim = key
            assert kind == self.DROPOUT
            return (nn.Dropout, nn.Dropout2d, nn.Dropout3d)[dim - 1]

    # monai ViT (classification=False path), param- and forward-faithful
    class _SABlock(nn.Module):
        def __init__(self, hidden_size, num_heads, dropout_rate=0.0,
                     qkv_bias=False, save_attn=False):
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = hidden_size // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(hidden_size, hidden_size * 3, bias=qkv_bias)
            self.out_proj = nn.Linear(hidden_size, hidden_size)
            self.drop_weights = nn.Dropout(dropout_rate)
            self.drop_output = nn.Dropout(dropout_rate)

        def forward(self, x):
            b, n, c = x.shape
            qkv = self.qkv(x).reshape(b, n, 3, self.num_heads,
                                      self.head_dim).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            att = (q @ k.transpose(-2, -1)) * self.scale
            att = self.drop_weights(att.softmax(dim=-1))
            x = (att @ v).transpose(1, 2).reshape(b, n, c)
            return self.drop_output(self.out_proj(x))

    class _MLPBlock(nn.Module):
        def __init__(self, hidden_size, mlp_dim, dropout_rate=0.0):
            super().__init__()
            self.linear1 = nn.Linear(hidden_size, mlp_dim)
            self.linear2 = nn.Linear(mlp_dim, hidden_size)
            self.fn = nn.GELU()
            self.drop1 = nn.Dropout(dropout_rate)
            self.drop2 = nn.Dropout(dropout_rate)

        def forward(self, x):
            return self.drop2(self.linear2(self.drop1(self.fn(
                self.linear1(x)))))

    class _TransformerBlock(nn.Module):
        def __init__(self, hidden_size, mlp_dim, num_heads, dropout_rate,
                     qkv_bias, save_attn):
            super().__init__()
            self.attn = _SABlock(hidden_size, num_heads, dropout_rate,
                                 qkv_bias, save_attn)
            self.mlp = _MLPBlock(hidden_size, mlp_dim, dropout_rate)
            self.norm1 = nn.LayerNorm(hidden_size)
            self.norm2 = nn.LayerNorm(hidden_size)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class ViT(nn.Module):
        def __init__(self, in_channels, img_size, patch_size, hidden_size=768,
                     mlp_dim=3072, num_layers=12, num_heads=12,
                     proj_type="conv", pos_embed_type="learnable",
                     classification=False, num_classes=2, dropout_rate=0.0,
                     spatial_dims=3, post_activation="Tanh", qkv_bias=False,
                     save_attn=False, **_kw):
            super().__init__()
            assert not classification and proj_type == "conv"
            img_size = ensure_tuple_rep(img_size, spatial_dims)
            patch_size = ensure_tuple_rep(patch_size, spatial_dims)
            n_patches = int(np.prod([i // p for i, p
                                     in zip(img_size, patch_size)]))
            conv_type = (nn.Conv1d, nn.Conv2d, nn.Conv3d)[spatial_dims - 1]

            class _PatchEmbed(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.patch_embeddings = conv_type(
                        in_channels, hidden_size, kernel_size=patch_size,
                        stride=patch_size)
                    self.position_embeddings = nn.Parameter(
                        torch.zeros(1, n_patches, hidden_size))
                    self.dropout = nn.Dropout(dropout_rate)

                def forward(self, x):
                    x = self.patch_embeddings(x)
                    x = x.flatten(2).transpose(-1, -2)
                    return self.dropout(x + self.position_embeddings)

            self.patch_embedding = _PatchEmbed()
            self.blocks = nn.ModuleList([
                _TransformerBlock(hidden_size, mlp_dim, num_heads,
                                  dropout_rate, qkv_bias, save_attn)
                for _ in range(num_layers)])
            self.norm = nn.LayerNorm(hidden_size)

        def forward(self, x):
            x = self.patch_embedding(x)
            hidden_states_out = []
            for blk in self.blocks:
                x = blk(x)
                hidden_states_out.append(x)
            return self.norm(x), hidden_states_out

    # monai dynunet/UNETR blocks (param-faithful; monai defaults bias=False,
    # instance norm affine=True as monai's get_norm_layer("instance") passes
    # affine via the dynunet norm_name tuple; monai's own default is
    # affine=False for plain "instance" — the reference passes the plain
    # string, so no-affine here)
    def _dyn_conv(sd, cin, cout, k, s, bias=False, transposed=False):
        return Convolution(sd, cin, cout, strides=s, kernel_size=k, bias=bias,
                           conv_only=True, is_transposed=transposed)

    class UnetBasicBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, stride, norm_name, act_name=None,
                     dropout=None):
            super().__init__()
            self.conv1 = _dyn_conv(spatial_dims, in_channels, out_channels,
                                   kernel_size, stride)
            self.conv2 = _dyn_conv(spatial_dims, out_channels, out_channels,
                                   kernel_size, 1)
            self.norm1 = get_norm_layer(norm_name, spatial_dims, out_channels)
            self.norm2 = get_norm_layer(norm_name, spatial_dims, out_channels)
            self.lrelu = nn.LeakyReLU(0.01, inplace=True)

        def forward(self, inp):
            out = self.lrelu(self.norm1(self.conv1(inp)))
            return self.lrelu(self.norm2(self.conv2(out)))

    class UnetResBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, stride, norm_name, act_name=None,
                     dropout=None):
            super().__init__()
            self.conv1 = _dyn_conv(spatial_dims, in_channels, out_channels,
                                   kernel_size, stride)
            self.conv2 = _dyn_conv(spatial_dims, out_channels, out_channels,
                                   kernel_size, 1)
            self.norm1 = get_norm_layer(norm_name, spatial_dims, out_channels)
            self.norm2 = get_norm_layer(norm_name, spatial_dims, out_channels)
            self.lrelu = nn.LeakyReLU(0.01, inplace=True)
            self.downsample = (in_channels != out_channels) or \
                (np.atleast_1d(stride) != 1).any()
            if self.downsample:
                self.conv3 = _dyn_conv(spatial_dims, in_channels,
                                       out_channels, 1, stride)
                self.norm3 = get_norm_layer(norm_name, spatial_dims,
                                            out_channels)

        def forward(self, inp):
            residual = inp
            out = self.lrelu(self.norm1(self.conv1(inp)))
            out = self.norm2(self.conv2(out))
            if self.downsample:
                residual = self.norm3(self.conv3(residual))
            return self.lrelu(out + residual)

    class UnetrBasicBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, stride, norm_name, res_block=False):
            super().__init__()
            cls = UnetResBlock if res_block else UnetBasicBlock
            self.layer = cls(spatial_dims, in_channels, out_channels,
                             kernel_size, stride, norm_name)

        def forward(self, inp):
            return self.layer(inp)

    class UnetrUpBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     kernel_size, upsample_kernel_size, norm_name,
                     res_block=False):
            super().__init__()
            self.transp_conv = _dyn_conv(spatial_dims, in_channels,
                                         out_channels, upsample_kernel_size,
                                         upsample_kernel_size,
                                         transposed=True)
            cls = UnetResBlock if res_block else UnetBasicBlock
            self.conv_block = cls(spatial_dims, out_channels + out_channels,
                                  out_channels, kernel_size, 1, norm_name)

        def forward(self, inp, skip):
            out = torch.cat((self.transp_conv(inp), skip), dim=1)
            return self.conv_block(out)

    class UnetrPrUpBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels, num_layer,
                     kernel_size, stride, upsample_kernel_size, norm_name,
                     conv_block=False, res_block=False):
            super().__init__()
            self.transp_conv_init = _dyn_conv(
                spatial_dims, in_channels, out_channels,
                upsample_kernel_size, upsample_kernel_size, transposed=True)
            blocks = []
            for _ in range(num_layer):
                tc = _dyn_conv(spatial_dims, out_channels, out_channels,
                               upsample_kernel_size, upsample_kernel_size,
                               transposed=True)
                if conv_block:
                    cls = UnetResBlock if res_block else UnetBasicBlock
                    blocks.append(nn.Sequential(tc, cls(
                        spatial_dims, out_channels, out_channels, kernel_size,
                        stride, norm_name)))
                else:
                    blocks.append(tc)
            self.blocks = nn.ModuleList(blocks)

        def forward(self, x):
            x = self.transp_conv_init(x)
            for blk in self.blocks:
                x = blk(x)
            return x

    class UnetOutBlock(nn.Module):
        def __init__(self, spatial_dims, in_channels, out_channels,
                     dropout=None):
            super().__init__()
            self.conv = _dyn_conv(spatial_dims, in_channels, out_channels,
                                  1, 1, bias=True)

        def forward(self, inp):
            return self.conv(inp)

    monai = _mod("monai")
    monai_utils = _mod("monai.utils", UpsampleMode=UpsampleMode,
                       InterpolateMode=InterpolateMode,
                       ensure_tuple_rep=ensure_tuple_rep)
    m_networks = _mod("monai.networks")
    m_blocks = _mod("monai.networks.blocks", Convolution=Convolution,
                    UpSample=UpSample, UnetrBasicBlock=UnetrBasicBlock,
                    UnetrUpBlock=UnetrUpBlock, UnetrPrUpBlock=UnetrPrUpBlock)
    m_blocks_dyn = _mod("monai.networks.blocks.dynunet_block",
                        UnetOutBlock=UnetOutBlock, UnetResBlock=UnetResBlock,
                        UnetBasicBlock=UnetBasicBlock)
    m_blocks_unetr = _mod("monai.networks.blocks.unetr_block",
                          UnetrBasicBlock=UnetrBasicBlock,
                          UnetrUpBlock=UnetrUpBlock,
                          UnetrPrUpBlock=UnetrPrUpBlock)
    m_blocks_conv = _mod("monai.networks.blocks.convolutions",
                         Convolution=Convolution)
    m_blocks_seg = _mod("monai.networks.blocks.segresnet_block",
                        get_conv_layer=get_conv_layer,
                        get_upsample_layer=get_upsample_layer)
    m_blocks_up = _mod("monai.networks.blocks.upsample", UpSample=UpSample)
    m_layers = _mod("monai.networks.layers")
    m_layers_fact = _mod("monai.networks.layers.factories",
                         Dropout=_DropoutFactory())
    m_layers_utils = _mod("monai.networks.layers.utils",
                          get_act_layer=get_act_layer,
                          get_norm_layer=get_norm_layer)
    m_nets = _mod("monai.networks.nets", swin_unetr=_mod(
        "monai.networks.nets.swin_unetr"))
    m_nets_vit = _mod("monai.networks.nets.vit", ViT=ViT)

    # ------------------------------------------------------------- mamba_ssm
    class Mamba(nn.Module):
        """Param- and forward-faithful Mamba1 (sequential torch recurrence)."""

        def __init__(self, d_model, d_state=16, d_conv=4, expand=2,
                     dt_rank="auto", conv_bias=True, bias=False, **_kw):
            super().__init__()
            d_inner = int(expand * d_model)
            self.d_state, self.d_conv, self.d_inner = d_state, d_conv, d_inner
            self.dt_rank = math.ceil(d_model / 16) if dt_rank == "auto" \
                else dt_rank
            self.in_proj = nn.Linear(d_model, 2 * d_inner, bias=bias)
            self.conv1d = nn.Conv1d(d_inner, d_inner, d_conv, groups=d_inner,
                                    padding=d_conv - 1, bias=conv_bias)
            self.x_proj = nn.Linear(d_inner, self.dt_rank + 2 * d_state,
                                    bias=False)
            self.dt_proj = nn.Linear(self.dt_rank, d_inner, bias=True)
            self.A_log = nn.Parameter(torch.log(torch.arange(
                1, d_state + 1, dtype=torch.float32).repeat(d_inner, 1)))
            self.D = nn.Parameter(torch.ones(d_inner))
            self.out_proj = nn.Linear(d_inner, d_model, bias=bias)

        def forward(self, hidden_states):
            b, L, _ = hidden_states.shape
            xz = self.in_proj(hidden_states)
            x, z = xz.chunk(2, dim=-1)
            x = x.transpose(1, 2)
            x = F.silu(self.conv1d(x)[..., :L])
            x_dbl = self.x_proj(x.transpose(1, 2))
            dt, B, C = torch.split(
                x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1)
            dt = F.softplus(self.dt_proj(dt))                 # (b, L, d)
            A = -torch.exp(self.A_log)                        # (d, N)
            dA = torch.exp(dt.unsqueeze(-1) * A)              # (b, L, d, N)
            dBx = dt.unsqueeze(-1) * B.unsqueeze(2) * \
                x.transpose(1, 2).unsqueeze(-1)
            h = torch.zeros(b, self.d_inner, self.d_state,
                            dtype=x.dtype, device=x.device)
            ys = []
            for t in range(L):
                h = dA[:, t] * h + dBx[:, t]
                ys.append((h * C[:, t].unsqueeze(1)).sum(-1))
            y = torch.stack(ys, dim=1)                        # (b, L, d)
            y = y + x.transpose(1, 2) * self.D
            y = y * F.silu(z)
            return self.out_proj(y)

    class Mamba2(nn.Module):
        """Param-faithful Mamba2 (forward unimplemented — used for counts)."""

        def __init__(self, d_model, d_state=128, d_conv=4, expand=2,
                     headdim=64, ngroups=1, conv_bias=True, bias=False,
                     **_kw):
            super().__init__()
            d_inner = int(expand * d_model)
            assert d_inner % headdim == 0
            nheads = d_inner // headdim
            d_in_proj = 2 * d_inner + 2 * ngroups * d_state + nheads
            conv_dim = d_inner + 2 * ngroups * d_state
            self.in_proj = nn.Linear(d_model, d_in_proj, bias=bias)
            self.conv1d = nn.Conv1d(conv_dim, conv_dim, d_conv,
                                    groups=conv_dim, padding=d_conv - 1,
                                    bias=conv_bias)
            self.dt_bias = nn.Parameter(torch.ones(nheads))
            self.A_log = nn.Parameter(torch.zeros(nheads))
            self.D = nn.Parameter(torch.ones(nheads))
            self.norm = nn.Module()
            self.norm.weight = nn.Parameter(torch.ones(d_inner))
            self.out_proj = nn.Linear(d_inner, d_model, bias=bias)

        def forward(self, *a, **k):
            raise NotImplementedError("Mamba2 stub is param-count-only")

    mamba_ssm = _mod("mamba_ssm", Mamba=Mamba)
    mamba_mod = _mod("mamba_ssm.modules")
    mamba_m2 = _mod("mamba_ssm.modules.mamba2", Mamba2=Mamba2)
    mamba_ops = _mod("mamba_ssm.ops")
    mamba_osi = _mod("mamba_ssm.ops.selective_scan_interface",
                     selective_scan_fn=None, mamba_inner_fn=None,
                     selective_scan_ref=None)
    prettytable = _mod("prettytable", PrettyTable=object)
    mamba_tri = _mod("mamba_ssm.ops.triton")
    mamba_ln = _mod("mamba_ssm.ops.triton.layer_norm", RMSNorm=None,
                    layer_norm_fn=None, rms_norm_fn=None)

    # ------------------------------------------------------- nnunetv2-internal
    class InitWeights_He:
        def __init__(self, neg_slope=1e-2):
            self.neg_slope = neg_slope

        def __call__(self, module):
            return module

    nnu = _mod("nnunetv2")
    nnu_nets = _mod("nnunetv2.nets")
    nnu_util = _mod("nnunetv2.utilities")
    nnu_ni = _mod("nnunetv2.utilities.network_initialization",
                  InitWeights_He=InitWeights_He)
    nnu_ph_pkg = _mod("nnunetv2.utilities.plans_handling")
    nnu_ph = _mod("nnunetv2.utilities.plans_handling.plans_handler",
                  ConfigurationManager=object, PlansManager=object)
    # torchinfo (LightMUNet imports `summary` at module level)
    torchinfo = _mod("torchinfo", summary=lambda *a, **k: None)

    return {
        "timm": timm, "timm.layers": timm.layers,
        "dynamic_network_architectures": dna,
        "dynamic_network_architectures.initialization": dna_init,
        "dynamic_network_architectures.initialization.weight_init": dna_wi,
        "monai": monai, "monai.utils": monai_utils,
        "monai.networks": m_networks,
        "monai.networks.blocks": m_blocks,
        "monai.networks.blocks.convolutions": m_blocks_conv,
        "monai.networks.blocks.dynunet_block": m_blocks_dyn,
        "monai.networks.blocks.unetr_block": m_blocks_unetr,
        "monai.networks.blocks.segresnet_block": m_blocks_seg,
        "monai.networks.blocks.upsample": m_blocks_up,
        "monai.networks.layers": m_layers,
        "monai.networks.layers.factories": m_layers_fact,
        "monai.networks.layers.utils": m_layers_utils,
        "monai.networks.nets": m_nets,
        "monai.networks.nets.vit": m_nets_vit,
        "mamba_ssm": mamba_ssm,
        "mamba_ssm.modules": mamba_mod,
        "mamba_ssm.modules.mamba2": mamba_m2,
        "mamba_ssm.ops": mamba_ops,
        "mamba_ssm.ops.selective_scan_interface": mamba_osi,
        "mamba_ssm.ops.triton": mamba_tri,
        "mamba_ssm.ops.triton.layer_norm": mamba_ln,
        "selective_scan_cuda": _mod("selective_scan_cuda"),
        "causal_conv1d": _mod("causal_conv1d", causal_conv1d_fn=None),
        "causal_conv1d_cuda": _mod("causal_conv1d_cuda"),
        "prettytable": prettytable,
        "nnunetv2": nnu, "nnunetv2.nets": nnu_nets,
        "nnunetv2.utilities": nnu_util,
        "nnunetv2.utilities.network_initialization": nnu_ni,
        "nnunetv2.utilities.plans_handling": nnu_ph_pkg,
        "nnunetv2.utilities.plans_handling.plans_handler": nnu_ph,
        "torchinfo": torchinfo,
    }


_LOADED = {}


def import_reference_net(relpath, modname=None):
    """Execute a reference module with the stub suite installed. Stubs stay in
    sys.modules only for the duration of the exec; repeated loads are cached."""
    modname = modname or "_ref_" + relpath.replace("/", "_").rstrip(".py")
    if modname in _LOADED:
        return _LOADED[modname]
    stubs = build_stub_modules()
    # mask_funcs is a real (self-contained, pure-torch) reference module some
    # nets import; execute it for real under the stub package name
    inserted = []
    for name, mod in stubs.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            inserted.append(name)
    try:
        if "nnunetv2.nets.mask_funcs" not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                "nnunetv2.nets.mask_funcs",
                f"{REF_ROOT}/nnunetv2/nets/mask_funcs.py")
            mf = importlib.util.module_from_spec(spec)
            sys.modules["nnunetv2.nets.mask_funcs"] = mf
            inserted.append("nnunetv2.nets.mask_funcs")
            spec.loader.exec_module(mf)
        spec = importlib.util.spec_from_file_location(
            modname, f"{REF_ROOT}/{relpath}")
        module = importlib.util.module_from_spec(spec)
        sys.modules[modname] = module
        spec.loader.exec_module(module)
        _LOADED[modname] = module
        return module
    finally:
        for name in inserted:
            sys.modules.pop(name, None)
