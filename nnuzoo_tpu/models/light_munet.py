"""LightMUNet / LightUMamba (reference: `nnunetv2/nets/LightMUNet.py:32-501`).

SegResNet-style encoder/decoder where residual blocks run a Mamba over the
flattened spatial tokens (with per-stage axis-order cycling) and a GSC gated
spatial conv; depthwise-separable convs throughout. Also the SS2D variant
(LightSS2DMambaUNet, reference `nnunetv2/nets/LightSS2DMambaUNet.py`) which swaps
the token Mamba for a 4-direction SS2D cross-scan.

Channels-last (B, *spatial, C); 2D and 3D.
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import max_pool, resize_linear
from .mamba import MambaBlock
from .registry import register_model
from .ss2d import SS2D

_ORDERS_3D = ((0, 1, 2), (0, 2, 1), (2, 1, 0))
_ORDERS_2D = ((0, 1), (1, 0))




class DWConv(nn.Module):
    features: int
    dim: int
    kernel: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (self.kernel,) * self.dim, padding="SAME",
                    feature_group_count=x.shape[-1], use_bias=self.use_bias,
                    name="depth")(x)
        return nn.Conv(self.features, (1,) * self.dim, use_bias=self.use_bias,
                       name="point")(x)


def _instance_norm(x, name):
    return nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                        use_bias=False, use_scale=False, name=name)(x)


class GSC(nn.Module):
    """Gated spatial conv (reference `LightMUNet.py:386-428`)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        residual = x
        c = x.shape[-1]
        x1 = _instance_norm(x, "norm1")
        x1 = nn.relu(DWConv(c, self.dim, 3, use_bias=True, name="proj")(x1))
        x2 = _instance_norm(x, "norm2")
        x2 = nn.relu(nn.Conv(c, (1,) * self.dim, name="proj2")(x2))
        x3 = _instance_norm(x1 + x2, "norm3")
        x3 = nn.relu(DWConv(c, self.dim, 3, use_bias=True, name="proj3")(x3))
        return x3 + residual


def mamba2_headdim(d_model: int, expand: int = 2) -> int:
    """Reference `light_mamba2net.py:53-58`: largest i < d_model*expand/8 with
    (d_model*expand / i) % 8 == 0."""
    nheaddim = 1
    for i in range(1, int(d_model * expand / 8)):
        if (d_model * expand / i) % 8 == 0:
            nheaddim = i
    return nheaddim


class MambaLayer(nn.Module):
    """LN -> Mamba over flattened tokens -> skip-scaled residual -> LN -> proj
    (reference `LightMUNet.py:32-59`). ``use_mamba2`` swaps in a Mamba2/SSD
    block with the reference head-dim rule (`light_mamba2net.py:60-71`)."""
    output_dim: int
    use_ss2d: bool = False
    use_mamba2: bool = False

    @nn.compact
    def __call__(self, x, order: Optional[Tuple[int, ...]] = None):
        # x channels-last (B, *spatial, C); optional axis permutation before flatten
        spatial = x.shape[1:-1]
        dim = len(spatial)
        if order is not None and tuple(order) != tuple(range(dim)):
            perm = (0,) + tuple(o + 1 for o in order) + (dim + 1,)
            xp = jnp.transpose(x, perm)
        else:
            xp = x
        p_spatial = xp.shape[1:-1]
        B = xp.shape[0]
        C = xp.shape[-1]
        flat = xp.reshape(B, -1, C)
        norm = nn.LayerNorm(name="norm")  # applied twice, shared params (reference)
        normed = norm(flat)
        if self.use_ss2d:
            assert dim == 2 and order is None
            mix = SS2D(d_model=C, name="ss2d")(normed.reshape(B, *p_spatial, C)
                                               ).reshape(B, -1, C)
        elif self.use_mamba2:
            from .mamba import Mamba2Block
            # d_state=16: the reference MambaLayer default, passed through to
            # Mamba2 (`light_mamba2net.py:65-72`)
            mix = Mamba2Block(d_model=C, d_state=16,
                              headdim=mamba2_headdim(C), name="mamba")(normed)
        else:
            mix = MambaBlock(d_model=C, name="mamba")(normed)
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        out = norm(mix + skip_scale * flat)
        out = nn.Dense(self.output_dim, name="proj")(out)
        out = out.reshape(B, *p_spatial, self.output_dim)
        if order is not None and tuple(order) != tuple(range(dim)):
            inv = [0] * dim
            for i, o in enumerate(order):
                inv[o] = i
            perm_back = (0,) + tuple(i + 1 for i in inv) + (dim + 1,)
            out = jnp.transpose(out, perm_back)
        return out


class ResMambaBlock(nn.Module):
    dim: int
    order: Tuple[int, ...]
    use_ss2d: bool = False
    use_mamba2: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = GSC(self.dim, name="gsc")(x)
        identity = x
        h = nn.relu(nn.GroupNorm(num_groups=min(8, c), name="norm1")(x))
        h = MambaLayer(c, self.use_ss2d, self.use_mamba2, name="mamba1")(
            h, None if self.use_ss2d else self.order)
        h = nn.relu(nn.GroupNorm(num_groups=min(8, c), name="norm2")(h))
        h = MambaLayer(c, self.use_ss2d, self.use_mamba2, name="mamba2")(
            h, None if self.use_ss2d else self.order)
        return h + identity


class ResUpBlock(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        identity = x
        h = nn.relu(nn.GroupNorm(num_groups=min(8, c), name="norm1")(x))
        h = DWConv(c, self.dim, 3, name="conv")(h)
        skip_scale = self.param("skip_scale", nn.initializers.ones, (1,))
        h = h + skip_scale * identity
        return nn.relu(nn.GroupNorm(num_groups=min(8, c), name="norm2")(h))


class LightMUNet(nn.Module):
    num_classes: int
    dim: int = 2
    init_filters: int = 32
    blocks_down: Sequence[int] = (1, 2, 2, 4)
    blocks_up: Sequence[int] = (1, 1, 1)
    use_ss2d: bool = False
    deep_supervision: bool = False  # reference trainer runs LightMUNet without DS
    remat: bool = False  # per-block recompute (canonical 2d SS2D variant: 24 GB without)

    @nn.compact
    def __call__(self, x, train: bool = True):
        res_cls, mamba_cls = ResMambaBlock, MambaLayer
        if self.remat:
            import jax
            policy = jax.checkpoint_policies.save_only_these_names(
                "scan_y", "scan_carries")
            res_cls = nn.remat(ResMambaBlock, policy=policy)
            mamba_cls = nn.remat(MambaLayer, static_argnums=(2,),
                                 policy=policy)
        orders = _ORDERS_3D if self.dim == 3 else _ORDERS_2D
        f = self.init_filters
        x = DWConv(f, self.dim, 3, name="convInit")(x)

        skips = []
        for i, n_blocks in enumerate(self.blocks_down):
            ch = f * 2 ** i
            if i > 0:
                x = mamba_cls(ch, self.use_ss2d, name=f"down_mamba{i}")(
                    x, None if self.use_ss2d else orders[i % len(orders)])
                x = max_pool(x, 2, self.dim)
            for b in range(n_blocks):
                x = res_cls(self.dim, orders[i % len(orders)],
                            self.use_ss2d, name=f"down{i}_block{b}")(x)
            skips.append(x)

        skips = skips[::-1]
        for i, n_blocks in enumerate(self.blocks_up):
            ch = x.shape[-1] // 2
            x = nn.Conv(ch, (1,) * self.dim, name=f"up_conv{i}")(x)
            x = resize_linear(x, skips[i + 1].shape[1:-1], self.dim)
            x = x + skips[i + 1]
            for b in range(n_blocks):
                x = ResUpBlock(self.dim, name=f"up{i}_block{b}")(x)

        x = nn.relu(nn.GroupNorm(num_groups=min(8, x.shape[-1]),
                                 name="final_norm")(x))
        out = DWConv(self.num_classes, self.dim, 1, use_bias=True,
                     name="conv_final")(x)
        return [out.astype(jnp.float32)]


def get_light_munet_from_plans(plans_manager, dataset_json, configuration_manager,
                               num_input_channels, deep_supervision=False,
                               dtype=None, use_ss2d=False):
    label_manager = plans_manager.get_label_manager(dataset_json)
    dim = len(configuration_manager.patch_size)
    if use_ss2d:
        assert dim == 2, "LightSS2DMambaUNet is 2D-only"
    return LightMUNet(num_classes=label_manager.num_segmentation_heads, dim=dim,
                      use_ss2d=use_ss2d)


register_model("nnUNetTrainerLightMUNet", get_light_munet_from_plans)
register_model("nnUNetTrainerLightSS2DMambaUNet",
               lambda *a, **k: get_light_munet_from_plans(*a, **k, use_ss2d=True))
