"""Common Flax building blocks for the model zoo.

TPU-native conventions: channels-last activations ((B, *spatial, C)) so convs map
directly onto the MXU; InstanceNorm as per-channel GroupNorm; parameters created in
fp32, compute optionally bf16 via the module dtype.
"""

from typing import Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def _tup(x, dim):
    if isinstance(x, (tuple, list)):
        assert len(x) == dim
        return tuple(int(i) for i in x)
    return (int(x),) * dim


class ConvNormAct(nn.Module):
    """conv -> InstanceNorm -> LeakyReLU, the nnU-Net unit
    (dynamic_network_architectures ConvDropoutNormReLU)."""
    features: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    dim: int = 2
    use_norm: bool = True
    act: Optional[Callable] = None  # default LeakyReLU(0.01)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _tup(self.kernel_size, self.dim)
        s = _tup(self.strides, self.dim)
        x = nn.Conv(self.features, k, strides=s, padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        if self.use_norm:
            x = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                             dtype=jnp.float32, name="norm")(x)
        act = self.act if self.act is not None else (
            lambda v: nn.leaky_relu(v, negative_slope=0.01))
        return act(x)


class StackedConvBlocks(nn.Module):
    """n convs; the first carries the stage stride."""
    num_convs: int
    features: int
    kernel_size: Union[int, Sequence[int]]
    first_stride: Union[int, Sequence[int]] = 1
    dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = ConvNormAct(self.features, self.kernel_size,
                            self.first_stride if i == 0 else 1, dim=self.dim,
                            dtype=self.dtype, name=f"conv{i}")(x)
        return x


class ResidualBlock(nn.Module):
    """Basic residual block (dynamic_network_architectures BasicBlockD):
    conv-norm-act -> conv-norm, skip (1x1 conv if shape changes), act."""
    features: int
    kernel_size: Union[int, Sequence[int]]
    first_stride: Union[int, Sequence[int]] = 1
    dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = _tup(self.kernel_size, self.dim)
        s = _tup(self.first_stride, self.dim)
        residual = x
        y = nn.Conv(self.features, k, strides=s, padding="SAME", dtype=self.dtype,
                    name="conv1")(x)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         dtype=jnp.float32, name="norm1")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = nn.Conv(self.features, k, strides=1, padding="SAME", dtype=self.dtype,
                    name="conv2")(y)
        y = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                         dtype=jnp.float32, name="norm2")(y)
        if any(si != 1 for si in s) or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1,) * self.dim, strides=s,
                               dtype=self.dtype, name="skip")(x)
            residual = nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5,
                                    dtype=jnp.float32, name="skip_norm")(residual)
        return nn.leaky_relu(y + residual, negative_slope=0.01)


class TransposedConvUp(nn.Module):
    features: int
    strides: Sequence[int]
    dim: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = _tup(self.strides, self.dim)
        return nn.ConvTranspose(self.features, s, strides=s, dtype=self.dtype,
                                name="transpconv")(x)


def resize_linear(x, new_spatial, dim):
    """Bilinear/trilinear resize of (B, *spatial, C), align_corners=False
    (jax.image 'linear' matches)."""
    new_shape = (x.shape[0], *new_spatial, x.shape[-1])
    return jax.image.resize(x, new_shape, method="linear")


def max_pool(x, window, dim):
    w = _tup(window, dim)
    return nn.max_pool(x, window_shape=w, strides=w)


def pad_to_match(x, target_spatial):
    """Zero-pad (B, *spatial, C) at the bottom/right so spatial dims equal
    ``target_spatial``. Patch-merging layers floor odd spatial dims (reference
    SHAPE_FIX, `nnunetv2/nets/m2net.py:249-265`), so a decoder's re-expanded map
    can be up to scale-1 voxels smaller than its skip; the reference crashes on
    such inputs (its decoder concatenates without any shape handling,
    `m2net.py:467`) — we pad instead, which is a no-op whenever the reference
    would have worked."""
    spatial = x.shape[1:-1]
    if tuple(spatial) == tuple(target_spatial):
        return x
    pads = [(0, 0)] + [(0, t - s) for s, t in zip(spatial, target_spatial)] + \
        [(0, 0)]
    assert all(p[1] >= 0 for p in pads), (spatial, target_spatial)
    return jnp.pad(x, pads)


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual-branch drop, reference timm DropPath
    used throughout the zoo's VSS/Swin/ViT blocks with linearly decayed rates).
    Active only in train mode AND when the caller supplies a "dropout" rng
    (the trainer does; forward-only smoke calls without rngs run the identity)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic or not self.has_rng("dropout"):
            return x
        key = self.make_rng("dropout")
        keep_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(key, 1.0 - self.rate, keep_shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)
