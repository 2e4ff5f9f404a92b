"""Spline resampling with anisotropy-aware separate-z handling.

Numerically equivalent to the reference
(`nnunetv2/preprocessing/resampling/default_resampling.py:77-213`), which uses
``skimage.transform.resize(order, mode='edge', anti_aliasing=False, clip=True)``.
skimage isn't available here, so we implement the identical math directly with
``scipy.ndimage.map_coordinates``: target coordinate of output voxel i along an axis
with scale s = old/new is ``s * (i + 0.5) - 0.5`` (skimage's convention), spline
order ``order``, edge padding, output clipped to the input range.

Segmentations are resized label-by-label on binarized masks (threshold 0.5), the
batchgenerators ``resize_segmentation`` semantics.
"""

from typing import List, Optional, Tuple, Union

import numpy as np
from scipy.ndimage import map_coordinates

from ..configuration import ANISO_THRESHOLD


def get_do_separate_z(spacing, anisotropy_threshold=ANISO_THRESHOLD) -> bool:
    return (np.max(spacing) / np.min(spacing)) > anisotropy_threshold


def get_lowres_axis(new_spacing) -> np.ndarray:
    return np.where(max(new_spacing) / np.array(new_spacing) == 1)[0]


def compute_new_shape(old_shape, old_spacing, new_spacing) -> np.ndarray:
    assert len(old_spacing) == len(old_shape) == len(new_spacing)
    return np.array([int(round(i / j * k))
                     for i, j, k in zip(old_spacing, new_spacing, old_shape)])


def _resize_coords(old_shape, new_shape):
    """skimage-convention coordinate map: scale * (i + 0.5) - 0.5 per axis."""
    grids = np.meshgrid(*[np.arange(n) for n in new_shape], indexing="ij")
    coords = []
    for g, o, n in zip(grids, old_shape, new_shape):
        scale = float(o) / float(n)
        coords.append(scale * (g.astype(np.float64) + 0.5) - 0.5)
    return np.array(coords)


def resize_image(image: np.ndarray, new_shape, order: int = 3, clip: bool = True
                 ) -> np.ndarray:
    """Equivalent of skimage.transform.resize(image, new_shape, order=order,
    mode='edge', anti_aliasing=False, clip=True)."""
    new_shape = tuple(int(i) for i in new_shape)
    if tuple(image.shape) == new_shape:
        return image.astype(np.float64, copy=False)
    image = np.asarray(image, dtype=np.float64)
    coords = _resize_coords(image.shape, new_shape)
    out = map_coordinates(image, coords, order=order, mode="nearest")
    if clip and order > 1:
        out = np.clip(out, image.min(), image.max())
    return out


def resize_segmentation(segmentation: np.ndarray, new_shape, order: int = 3
                        ) -> np.ndarray:
    """One-hot per label, spline-resize each mask, argmax-by-threshold 0.5.
    Order 0 resizes the labelmap directly."""
    dtype = segmentation.dtype
    if order == 0:
        return resize_image(segmentation.astype(np.float64), new_shape, order=0,
                            clip=False).astype(dtype)
    unique_labels = np.unique(segmentation)
    reshaped = np.zeros(tuple(int(i) for i in new_shape), dtype=dtype)
    for c in unique_labels:
        mask = (segmentation == c).astype(np.float64)
        resized = resize_image(mask, new_shape, order=order)
        reshaped[resized >= 0.5] = c
    return reshaped


def resample_data_or_seg(data: np.ndarray, new_shape, is_seg: bool = False,
                         axis: Optional[np.ndarray] = None, order: int = 3,
                         do_separate_z: bool = False, order_z: int = 0) -> np.ndarray:
    """Core resampler over (c, x, y, z) arrays (reference `:125-213`)."""
    assert data.ndim == 4, "data must be (c, x, y, z)"
    assert len(new_shape) == data.ndim - 1

    resize_fn = resize_segmentation if is_seg else resize_image
    dtype_data = data.dtype
    shape = np.array(data[0].shape)
    new_shape = np.array([int(i) for i in new_shape])
    if np.all(shape == new_shape):
        return data

    data = data.astype(np.float64, copy=False)
    if do_separate_z:
        assert len(axis) == 1, "only one anisotropic axis supported"
        ax = int(axis[0])
        new_shape_2d = np.delete(new_shape, ax)

        reshaped_final = []
        for c in range(data.shape[0]):
            slices = [resize_fn(np.take(data[c], s, axis=ax), new_shape_2d, order)
                      for s in range(shape[ax])]
            reshaped = np.stack(slices, axis=ax)
            if shape[ax] != new_shape[ax]:
                coords = _resize_coords(reshaped.shape, new_shape)
                if not is_seg or order_z == 0:
                    reshaped_final.append(
                        map_coordinates(reshaped, coords, order=order_z,
                                        mode="nearest")[None])
                else:
                    out = np.zeros(tuple(new_shape), dtype=dtype_data)
                    for cl in np.sort(np.unique(reshaped)):
                        multihot = np.round(map_coordinates(
                            (reshaped == cl).astype(np.float64), coords,
                            order=order_z, mode="nearest"))
                        out[multihot > 0.5] = cl
                    reshaped_final.append(out[None])
            else:
                reshaped_final.append(reshaped[None])
        return np.vstack(reshaped_final).astype(dtype_data)

    return np.vstack([resize_fn(data[c], new_shape, order)[None]
                      for c in range(data.shape[0])]).astype(dtype_data)


def _determine_separate_z_and_axis(current_spacing, new_spacing,
                                   force_separate_z: Union[bool, None],
                                   separate_z_anisotropy_threshold: float):
    if force_separate_z is not None:
        do_separate_z = force_separate_z
        axis = get_lowres_axis(current_spacing) if force_separate_z else None
    elif get_do_separate_z(current_spacing, separate_z_anisotropy_threshold):
        do_separate_z, axis = True, get_lowres_axis(current_spacing)
    elif get_do_separate_z(new_spacing, separate_z_anisotropy_threshold):
        do_separate_z, axis = True, get_lowres_axis(new_spacing)
    else:
        do_separate_z, axis = False, None
    # 2 or 3 axes sharing the max spacing -> nothing is "the" anisotropic axis
    if axis is not None and len(axis) != 1:
        do_separate_z = False
    return do_separate_z, axis


def resample_data_or_seg_to_shape(data: np.ndarray, new_shape, current_spacing,
                                  new_spacing, is_seg: bool = False, order: int = 3,
                                  order_z: int = 0,
                                  force_separate_z: Union[bool, None] = False,
                                  separate_z_anisotropy_threshold: float = ANISO_THRESHOLD
                                  ) -> np.ndarray:
    """Main entry used by plans (reference `:77-122`)."""
    do_separate_z, axis = _determine_separate_z_and_axis(
        current_spacing, new_spacing, force_separate_z, separate_z_anisotropy_threshold)
    return resample_data_or_seg(data, new_shape, is_seg, axis, order, do_separate_z,
                                order_z=order_z)


def resample_data_or_seg_to_spacing(data: np.ndarray, current_spacing, new_spacing,
                                    is_seg: bool = False, order: int = 3,
                                    order_z: int = 0,
                                    force_separate_z: Union[bool, None] = False,
                                    separate_z_anisotropy_threshold: float = ANISO_THRESHOLD
                                    ) -> np.ndarray:
    do_separate_z, axis = _determine_separate_z_and_axis(
        current_spacing, new_spacing, force_separate_z, separate_z_anisotropy_threshold)
    new_shape = compute_new_shape(np.array(data[0].shape), current_spacing, new_spacing)
    return resample_data_or_seg(data, new_shape, is_seg, axis, order, do_separate_z,
                                order_z=order_z)


_RESAMPLING_FNS = {
    "resample_data_or_seg_to_shape": resample_data_or_seg_to_shape,
    "resample_data_or_seg_to_spacing": resample_data_or_seg_to_spacing,
}


def get_resampling_fn_by_name(name: str):
    if name not in _RESAMPLING_FNS:
        raise RuntimeError(f"Unknown resampling fn {name!r}. Known: {sorted(_RESAMPLING_FNS)}")
    return _RESAMPLING_FNS[name]
