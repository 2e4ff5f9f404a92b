"""Plans-driven dynamic U-Nets (PlainConvUNet / ResidualEncoderUNet).

The reference builds these via the external dynamic_network_architectures package
from plans ``arch_kwargs`` (`nnunetv2/utilities/get_network_from_plans.py:18-62`).
Same config surface here — n_stages, features_per_stage, kernel_sizes, strides,
n_conv_per_stage(_decoder) — as Flax modules with channels-last activations.

Returns a list of deep-supervision logits, highest resolution first, at the
encoder skip resolutions (multi-scale, like the reference's UNetDecoder heads).
"""

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import ResidualBlock, StackedConvBlocks, TransposedConvUp


class PlainConvEncoder(nn.Module):
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence
    strides: Sequence
    n_conv_per_stage: Sequence[int]
    dim: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        block_cls = nn.remat(StackedConvBlocks) if self.remat \
            else StackedConvBlocks
        skips = []
        for s in range(self.n_stages):
            x = block_cls(self.n_conv_per_stage[s],
                                  self.features_per_stage[s],
                                  self.kernel_sizes[s], self.strides[s],
                                  dim=self.dim, dtype=self.dtype,
                                  name=f"stage{s}")(x)
            skips.append(x)
        return skips


class ResidualEncoder(nn.Module):
    n_stages: int
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence
    strides: Sequence
    n_blocks_per_stage: Sequence[int]
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = []
        for s in range(self.n_stages):
            for b in range(self.n_blocks_per_stage[s]):
                x = ResidualBlock(self.features_per_stage[s],
                                  self.kernel_sizes[s],
                                  self.strides[s] if b == 0 else 1,
                                  dim=self.dim, dtype=self.dtype,
                                  name=f"stage{s}_block{b}")(x)
            skips.append(x)
        return skips


class UNetDecoder(nn.Module):
    features_per_stage: Sequence[int]
    kernel_sizes: Sequence
    strides: Sequence
    n_conv_per_stage_decoder: Sequence[int]
    num_classes: int
    dim: int
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, skips: List[jnp.ndarray]):
        block_cls = nn.remat(StackedConvBlocks) if self.remat \
            else StackedConvBlocks
        n_stages = len(skips)
        x = skips[-1]
        seg_outputs = []
        for i, s in enumerate(range(n_stages - 2, -1, -1)):
            x = TransposedConvUp(self.features_per_stage[s], self.strides[s + 1],
                                 dim=self.dim, dtype=self.dtype,
                                 name=f"up{i}")(x)
            x = jnp.concatenate([x, skips[s]], axis=-1)
            x = block_cls(self.n_conv_per_stage_decoder[i],
                                  self.features_per_stage[s],
                                  self.kernel_sizes[s], 1, dim=self.dim,
                                  dtype=self.dtype, name=f"dec{i}")(x)
            if self.deep_supervision or s == 0:
                seg = nn.Conv(self.num_classes, (1,) * self.dim, dtype=self.dtype,
                              name=f"seg{i}")(x)
                seg_outputs.append(seg.astype(jnp.float32))
        seg_outputs = seg_outputs[::-1]  # highest resolution first
        return seg_outputs if self.deep_supervision else [seg_outputs[0]]


class PlainConvUNet(nn.Module):
    arch_kwargs: Dict[str, Any]
    num_classes: int
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # per-stage recompute (large 3d_fullres workloads)

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = self.arch_kwargs
        dim = len(kw["strides"][0]) if isinstance(kw["strides"][0], (list, tuple)) \
            else len(kw["kernel_sizes"][0])
        skips = PlainConvEncoder(
            kw["n_stages"], kw["features_per_stage"], kw["kernel_sizes"],
            kw["strides"], kw["n_conv_per_stage"], dim=dim, dtype=self.dtype,
            remat=self.remat, name="encoder")(x)
        return UNetDecoder(
            kw["features_per_stage"], kw["kernel_sizes"], kw["strides"],
            kw["n_conv_per_stage_decoder"], self.num_classes, dim=dim,
            deep_supervision=self.deep_supervision, dtype=self.dtype,
            remat=self.remat, name="decoder")(skips)


class ResidualEncoderUNet(nn.Module):
    arch_kwargs: Dict[str, Any]
    num_classes: int
    deep_supervision: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = self.arch_kwargs
        dim = len(kw["strides"][0]) if isinstance(kw["strides"][0], (list, tuple)) \
            else len(kw["kernel_sizes"][0])
        n_blocks = kw.get("n_blocks_per_stage", kw.get("n_conv_per_stage"))
        skips = ResidualEncoder(
            kw["n_stages"], kw["features_per_stage"], kw["kernel_sizes"],
            kw["strides"], n_blocks, dim=dim, dtype=self.dtype,
            name="encoder")(x)
        return UNetDecoder(
            kw["features_per_stage"], kw["kernel_sizes"], kw["strides"],
            kw["n_conv_per_stage_decoder"], self.num_classes, dim=dim,
            deep_supervision=self.deep_supervision, dtype=self.dtype,
            name="decoder")(skips)
