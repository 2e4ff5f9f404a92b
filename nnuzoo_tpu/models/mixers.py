"""Stage mixers for the X2Net family.

Each X2Net variant keeps the same macro-topology (U2Net outer U, mini-U-Net
sub-networks per stage, RSU4F bottleneck) and differs only in the token mixer of
its sub-network layers:

- 'ss2d'     : 4-direction selective scan (M2Net, reference `m2net.py:515`)
- 'ssnd'     : N-D cross scan (SSND2Net, reference `ssnd2net.py:73`)
- 'swin'     : shifted-window attention (SwT2Net, reference `swt2net.py:518`)
- 'vit'      : full attention over tokens (UNETR2Net, reference `unetr2net.py:568`)
- 'mamba_alt': plain Mamba, direction alternating per block (LM2Net / AltM2Net,
               reference `lm2net.py:223`)
- 'mamba2'   : Mamba2/SSD blocks (LightMamba2Net, reference `light_mamba2net.py:5`)
- 'mamba_nd' : Mamba with per-layer sequence reversal + RMSNorm residual
               (MambaND2Net, reference `mamba_nd2net.py:565-844`)
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import SwinBlock, ViTBlock
from .layers import DropPath
from .mamba import Mamba2Block, MambaBlock, RMSNorm
from .ss2d import VSSBlock
from .ssnd import SSND


class _TokenBlock(nn.Module):
    """LN -> token mixer over flattened spatial -> DropPath -> residual."""
    mixer: str
    dim: int
    block_index: int = 0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        flat = x.reshape(B, -1, C)
        dp = DropPath(self.drop_path, name="drop_path")
        if self.mixer == "vit":
            out = ViTBlock(num_heads=max(1, C // 32),
                           drop_path=self.drop_path, name="vit")(flat,
                                                                 train=train)
            return out.reshape(B, *spatial, C)
        if self.mixer == "mamba_alt":
            h = nn.LayerNorm(name="norm")(flat)
            reverse = self.block_index % 2 == 1
            if reverse:
                h = jnp.flip(h, 1)
            h = MambaBlock(d_model=C, name="mamba")(h)
            if reverse:
                h = jnp.flip(h, 1)
            return (flat + dp(h, deterministic=not train)).reshape(
                B, *spatial, C)
        if self.mixer == "mamba2":
            h = nn.LayerNorm(name="norm")(flat)
            h = Mamba2Block(d_model=C, headdim=min(64, C), name="mamba2")(h)
            return (flat + dp(h, deterministic=not train)).reshape(
                B, *spatial, C)
        if self.mixer == "mamba_nd":
            h = RMSNorm(name="norm")(flat)
            reverse = self.block_index % 2 == 1
            if reverse:
                h = jnp.flip(h, 1)
            h = MambaBlock(d_model=C, name="mamba")(h)
            if reverse:
                h = jnp.flip(h, 1)
            return (flat + dp(h, deterministic=not train)).reshape(
                B, *spatial, C)
        raise ValueError(f"unknown token mixer {self.mixer}")


class MixerLayer(nn.Module):
    """Depth x mixer blocks on a channels-last feature map (drop-in for the
    VSSLayer slot in the MU scaffold). ``drop_path`` = stochastic-depth rate
    for every block in this layer (the reference X2Net cores all use DropPath:
    `ssnd2net.py:533` rate 0.2, `swt2net.py:436` linspace, `mamba_nd2net.py`
    Block drop_path)."""
    dim: int
    depth: int
    mixer: str = "ss2d"
    d_state: int = 16
    spatial_dims: int = 2
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.depth):
            # per-block stochastic-depth rate: callers may pass one float for
            # all blocks or a per-block tuple (the reference's linspace slices)
            dp = self.drop_path[i] if isinstance(self.drop_path, (tuple, list)) \
                else self.drop_path
            if self.mixer == "ss2d":
                x = VSSBlock(self.dim, self.d_state, dp,
                             name=f"block{i}")(x, train=train)
            elif self.mixer == "ssnd":
                # reference SSND VSSBlock (`ssnd2net.py:758-786`):
                # input = GSC(input); x = input + DropPath(SSND(LN(input)))
                from .light_munet import GSC
                x = GSC(self.spatial_dims, name=f"gsc{i}")(x)
                branch = SSND(self.dim, spatial_dims=self.spatial_dims,
                              d_state=self.d_state, name=f"block{i}")(
                    nn.LayerNorm(epsilon=1e-6, name=f"ln{i}")(x), train=train)
                x = x + DropPath(dp, name=f"drop_path{i}")(
                    branch, deterministic=not train)
            elif self.mixer == "swin":
                window = 7
                x = SwinBlock(num_heads=max(1, self.dim // 32), window=window,
                              shift=0 if i % 2 == 0 else window // 2,
                              drop_path=dp,
                              name=f"block{i}")(x, train=train)
            else:
                x = _TokenBlock(self.mixer, self.dim, block_index=i,
                                drop_path=dp,
                                name=f"block{i}")(x, train=train)
        return x
