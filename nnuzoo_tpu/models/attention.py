"""Transformer primitives: ViT blocks and Swin windowed attention.

TPU-native: attention via jnp.einsum on the MXU; windows partitioned by reshape
(static shapes). References: `nnunetv2/nets/unetr2net.py:568` (ViT Block),
`nnunetv2/nets/swt.py:280-460` (WindowAttention / SwinTransformerBlock).
"""

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import DropPath


class MLP(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        # exact (erf) GELU: torch nn.GELU() default, needed for logit parity
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_dim, name="fc2")(x)
        return x


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, L, 3, self.num_heads, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # (B, heads, L, hd)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * head_dim ** -0.5
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, C)
        return nn.Dense(C, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-LN transformer block (reference `unetr2net.py:568`; drop_path =
    stochastic depth on both residual branches, timm convention)."""
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        C = x.shape[-1]
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(Attention(self.num_heads, self.qkv_bias, name="attn")(
            nn.LayerNorm(name="norm1")(x)), deterministic=not train)
        x = x + dp(MLP(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(name="norm2")(x), train=train), deterministic=not train)
        return x


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, window*window, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def window_reverse(wins, window: int, H: int, W: int):
    B = wins.shape[0] // ((H // window) * (W // window))
    x = wins.reshape(B, H // window, W // window, window, window, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class WindowAttention(nn.Module):
    """Windowed MHSA with relative position bias (reference `swt.py:280`)."""
    window: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        Bn, L, C = x.shape  # L = window^2
        head_dim = C // self.num_heads
        w = self.window

        rel_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) * (2 * w - 1), self.num_heads))
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                      indexing="ij")).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0) + (w - 1)
        rel_index = rel[..., 0] * (2 * w - 1) + rel[..., 1]  # (L, L)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(Bn, L, 3, self.num_heads, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * head_dim ** -0.5
        bias = rel_bias_table[jnp.asarray(rel_index.reshape(-1))].reshape(
            L, L, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.num_heads, L, L) + \
                mask[None, :, None]
            attn = attn.reshape(Bn, self.num_heads, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, L, C)
        return nn.Dense(C, name="proj")(out)


def _shift_attn_mask_nd(spatial, window, shift):
    """Attention mask for N-D shifted windows (Swin): partition each shifted
    axis into (body, window-shift, shift) bands -> up to 3^dims regions; window
    positions from different regions must not attend to each other. Built with
    numpy at trace time (static shapes), so it constant-folds under jit."""
    import itertools

    dims = len(spatial)
    img_mask = np.zeros((1, *spatial, 1))
    bands = []
    for w, s in zip(window, shift):
        if s > 0:
            bands.append((slice(0, -w), slice(-w, -s), slice(-s, None)))
        else:
            bands.append((slice(None),))
    for cnt, region in enumerate(itertools.product(*bands)):
        img_mask[(slice(None), *region, slice(None))] = cnt

    # numpy window partition (same layout as window_partition_nd)
    shape = [1]
    for s, w in zip(spatial, window):
        shape += [s // w, w]
    m = img_mask.reshape(*shape, 1)
    perm = [0] + [1 + 2 * i for i in range(dims)] + \
        [2 + 2 * i for i in range(dims)] + [1 + 2 * dims]
    m = m.transpose(perm).reshape(-1, int(np.prod(window)))
    diff = m[:, None, :] - m[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0), jnp.float32)


def _shift_attn_mask(H, W, window, shift):
    """2D shifted-window mask (kept as the historical entry point)."""
    return _shift_attn_mask_nd((H, W), (window, window), (shift, shift))


class SwinBlock(nn.Module):
    """(Shifted-)window transformer block (reference `swt.py:384`)."""
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        B, H, W, C = x.shape
        window = min(self.window, H, W)
        # the reference keeps the shifted roll+mask even when the window spans
        # the whole feature map (`swt.py:355-362` never disables shift); only
        # drop it when the window had to be CLAMPED below its nominal size
        shift = self.shift if window == self.window else 0
        # pad to window multiples
        pad_h = (-H) % window
        pad_w = (-W) % window
        shortcut = x
        h = nn.LayerNorm(name="norm1")(x)
        if pad_h or pad_w:
            h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        if shift > 0:
            h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
            mask = _shift_attn_mask(Hp, Wp, window, shift)
        else:
            mask = None
        wins = window_partition(h, window)
        wins = WindowAttention(window, self.num_heads, name="attn")(wins, mask)
        h = window_reverse(wins, window, Hp, Wp)
        if shift > 0:
            h = jnp.roll(h, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            h = h[:, :H, :W]
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(h, deterministic=not train)
        x = x + dp(MLP(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(name="norm2")(x), train=train), deterministic=not train)
        return x


def window_partition_nd(x, window: Tuple[int, ...]):
    """(B, *spatial, C) -> (B*nW, prod(window), C) for 2D or 3D windows."""
    B = x.shape[0]
    spatial = x.shape[1:-1]
    C = x.shape[-1]
    dims = len(spatial)
    shape = [B]
    for s, w in zip(spatial, window):
        shape += [s // w, w]
    x = x.reshape(*shape, C)
    perm = [0] + [1 + 2 * i for i in range(dims)] + \
        [2 + 2 * i for i in range(dims)] + [1 + 2 * dims]
    x = jnp.transpose(x, perm)
    return x.reshape(-1, int(np.prod(window)), C)


def window_reverse_nd(wins, window: Tuple[int, ...], spatial: Tuple[int, ...]):
    dims = len(spatial)
    nw = [s // w for s, w in zip(spatial, window)]
    B = wins.shape[0] // int(np.prod(nw))
    x = wins.reshape(B, *nw, *window, -1)
    perm = [0]
    for i in range(dims):
        perm += [1 + i, 1 + dims + i]
    perm += [1 + 2 * dims]
    x = jnp.transpose(x, perm)
    return x.reshape(B, *spatial, x.shape[-1])


class WindowAttentionND(nn.Module):
    """Windowed MHSA with N-D relative position bias (3D Swin for SwinUNETR)."""
    window: Tuple[int, ...]
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        Bn, L, C = x.shape
        head_dim = C // self.num_heads
        w = self.window
        dims = len(w)

        table_size = int(np.prod([2 * wi - 1 for wi in w]))
        rel_bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_size, self.num_heads))
        coords = np.stack(np.meshgrid(*[np.arange(wi) for wi in w],
                                      indexing="ij")).reshape(dims, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.transpose(1, 2, 0)
        for i in range(dims):
            rel[..., i] += w[i] - 1
        index = np.zeros(rel.shape[:2], dtype=np.int64)
        stride = 1
        for i in range(dims - 1, -1, -1):
            index += rel[..., i] * stride
            stride *= 2 * w[i] - 1

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(Bn, L, 3, self.num_heads, head_dim)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * head_dim ** -0.5
        bias = rel_bias_table[jnp.asarray(index.reshape(-1))].reshape(
            L, L, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, self.num_heads, L, L) + \
                mask[None, :, None]
            attn = attn.reshape(Bn, self.num_heads, L, L)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return nn.Dense(C, name="proj")(out.transpose(0, 2, 1, 3)
                                        .reshape(Bn, L, C))


class SwinBlockND(nn.Module):
    """N-D (shifted-)window transformer block with full N-D cyclic-shift masks
    (reference monai SwinUNETR 3D shifted windows via
    `nnUNetTrainerSwUNETR.py:38-46`)."""
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        B = x.shape[0]
        spatial = x.shape[1:-1]
        C = x.shape[-1]
        dims = len(spatial)
        if dims == 2:
            return SwinBlock(self.num_heads, self.window, self.shift,
                             self.mlp_ratio, self.drop_path,
                             name="block2d")(x, train=train)
        window = tuple(min(self.window, s) for s in spatial)
        # per-axis shift: no shift along axes the window fully covers
        shift = tuple(self.shift if w < s else 0
                      for w, s in zip(window, spatial))
        pads = [(-s) % w for s, w in zip(spatial, window)]

        shortcut = x
        h = nn.LayerNorm(name="norm1")(x)
        if any(pads):
            h = jnp.pad(h, [(0, 0)] + [(0, p) for p in pads] + [(0, 0)])
        padded_spatial = tuple(s + p for s, p in zip(spatial, pads))
        if any(shift):
            h = jnp.roll(h, tuple(-s for s in shift),
                         axis=tuple(range(1, dims + 1)))
            mask = _shift_attn_mask_nd(padded_spatial, window, shift)
        else:
            mask = None
        wins = window_partition_nd(h, window)
        wins = WindowAttentionND(window, self.num_heads, name="attn")(wins, mask)
        h = window_reverse_nd(wins, window, padded_spatial)
        if any(shift):
            h = jnp.roll(h, shift, axis=tuple(range(1, dims + 1)))
        if any(pads):
            h = h[tuple([slice(None)] + [slice(0, s) for s in spatial])]
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(h, deterministic=not train)
        x = x + dp(MLP(int(C * self.mlp_ratio), C, name="mlp")(
            nn.LayerNorm(name="norm2")(x), train=train), deterministic=not train)
        return x
