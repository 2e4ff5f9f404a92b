"""Sliding-window tiling math (reference:
`nnunetv2/inference/sliding_window_prediction.py:10-56`)."""

from functools import lru_cache
from typing import List, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter


@lru_cache(maxsize=4)
def compute_gaussian(tile_size: Tuple[int, ...], sigma_scale: float = 1.0 / 8,
                     value_scaling_factor: float = 10.0) -> np.ndarray:
    """Gaussian importance map: unit impulse at the center filtered with
    sigma = tile/8, scaled so max == value_scaling_factor, zero-clamped to the
    smallest nonzero value (reference `:10-29`)."""
    tmp = np.zeros(tile_size)
    center = tuple(i // 2 for i in tile_size)
    sigmas = [i * sigma_scale for i in tile_size]
    tmp[center] = 1
    gaussian = gaussian_filter(tmp, sigmas, 0, mode="constant", cval=0)
    gaussian = gaussian / gaussian.max() * value_scaling_factor
    gaussian = gaussian.astype(np.float32)
    nonzero_min = gaussian[gaussian != 0].min()
    gaussian[gaussian == 0] = nonzero_min
    return gaussian


def compute_steps_for_sliding_window(image_size, tile_size,
                                     tile_step_size: float) -> List[List[int]]:
    assert all(i >= j for i, j in zip(image_size, tile_size)), \
        "image size must be >= tile size"
    assert 0 < tile_step_size <= 1
    target = [i * tile_step_size for i in tile_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1
                 for i, j, k in zip(image_size, target, tile_size)]
    steps = []
    for dim in range(len(tile_size)):
        max_step_value = image_size[dim] - tile_size[dim]
        actual = max_step_value / (num_steps[dim] - 1) if num_steps[dim] > 1 else 1e11
        steps.append([int(np.round(actual * i)) for i in range(num_steps[dim])])
    return steps


def pad_nd_image(image: np.ndarray, new_shape, mode: str = "constant",
                 value: float = 0.0):
    """Pad the trailing spatial dims of (c, *spatial) to at least new_shape,
    centered; returns (padded, slicer-to-revert)."""
    spatial = image.shape[-len(new_shape):]
    pad_amounts = [max(0, int(ns) - s) for s, ns in zip(spatial, new_shape)]
    pad_lower = [p // 2 for p in pad_amounts]
    pad_upper = [p - lo for p, lo in zip(pad_amounts, pad_lower)]
    lead = image.ndim - len(new_shape)
    pads = [(0, 0)] * lead + list(zip(pad_lower, pad_upper))
    kwargs = {"constant_values": value} if mode == "constant" else {}
    padded = np.pad(image, pads, mode=mode, **kwargs)
    slicer = tuple([slice(None)] * lead +
                   [slice(lo, lo + s) for lo, s in zip(pad_lower, spatial)])
    return padded, slicer


def get_sliding_window_slicers(image_size, patch_size, tile_step_size: float = 0.5):
    """All tile slicers over a (possibly 3D) image for a 2D or 3D patch
    (reference `predict_from_raw_data.py:515-547`: a 2D configuration slides per
    z-slice)."""
    slicers = []
    if len(patch_size) < len(image_size):
        # 2d config on 3d volume: slide within each slice
        steps = compute_steps_for_sliding_window(image_size[1:], patch_size,
                                                 tile_step_size)
        for d in range(image_size[0]):
            for sx in steps[0]:
                for sy in steps[1]:
                    slicers.append((slice(None), d,
                                    slice(sx, sx + patch_size[0]),
                                    slice(sy, sy + patch_size[1])))
    else:
        steps = compute_steps_for_sliding_window(image_size, patch_size,
                                                 tile_step_size)
        if len(patch_size) == 3:
            for sx in steps[0]:
                for sy in steps[1]:
                    for sz in steps[2]:
                        slicers.append((slice(None),
                                        slice(sx, sx + patch_size[0]),
                                        slice(sy, sy + patch_size[1]),
                                        slice(sz, sz + patch_size[2])))
        else:
            for sx in steps[0]:
                for sy in steps[1]:
                    slicers.append((slice(None),
                                    slice(sx, sx + patch_size[0]),
                                    slice(sy, sy + patch_size[1])))
    return slicers
