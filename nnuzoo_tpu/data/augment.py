"""Device-side jitted data augmentation.

TPU-native replacement for the reference's batchgeneratorsv2 CPU pipeline
(`nnunetv2/training/nnUNetTrainer/nnUNetTrainer.py:824-1008`): the same transforms —
SpatialTransform (rotation p=0.2, scaling 0.7-1.4 p=0.2), GaussianNoise p=0.1,
GaussianBlur p=0.2, Brightness p=0.15, Contrast p=0.15, SimulateLowRes p=0.25,
Gamma (inverted p=0.1 / plain p=0.3), Mirror, MaskImage, RemoveLabel(-1->0),
regions conversion and DownsampleSegForDS — expressed as one jit-compiled function
vmapped over the batch with per-sample PRNG keys. No worker processes, no host
bottleneck: the accelerator augments while the host fetches the next batch.

All shapes are static; random gating selects between transformed and identity
results with jnp.where.
"""

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------- init patch
def rotate_coords_2d(coords, angle):
    rot = np.array([[np.cos(angle), -np.sin(angle)],
                    [np.sin(angle), np.cos(angle)]])
    return rot @ np.asarray(coords, dtype=float)


def rotate_coords_3d(coords, ax, ay, az):
    rx = np.array([[1, 0, 0],
                   [0, np.cos(ax), -np.sin(ax)],
                   [0, np.sin(ax), np.cos(ax)]])
    ry = np.array([[np.cos(ay), 0, np.sin(ay)],
                   [0, 1, 0],
                   [-np.sin(ay), 0, np.cos(ay)]])
    rz = np.array([[np.cos(az), -np.sin(az), 0],
                   [np.sin(az), np.cos(az), 0],
                   [0, 0, 1]])
    return rz @ ry @ rx @ np.asarray(coords, dtype=float)


def get_patch_size(final_patch_size, rot_x, rot_y, rot_z, scale_range) -> np.ndarray:
    """Patch inflation for rotation+scaling (reference:
    `nnunetv2/training/data_augmentation/compute_initial_patch_size.py:4-25`)."""
    if isinstance(rot_x, (tuple, list)):
        rot_x = max(np.abs(rot_x))
    if isinstance(rot_y, (tuple, list)):
        rot_y = max(np.abs(rot_y))
    if isinstance(rot_z, (tuple, list)):
        rot_z = max(np.abs(rot_z))
    rot_x = min(np.pi / 2, rot_x)
    rot_y = min(np.pi / 2, rot_y)
    rot_z = min(np.pi / 2, rot_z)
    coords = np.array(final_patch_size)
    final_shape = np.copy(coords)
    if len(coords) == 3:
        final_shape = np.max(np.vstack(
            (np.abs(rotate_coords_3d(coords, rot_x, 0, 0)), final_shape)), 0)
        final_shape = np.max(np.vstack(
            (np.abs(rotate_coords_3d(coords, 0, rot_y, 0)), final_shape)), 0)
        final_shape = np.max(np.vstack(
            (np.abs(rotate_coords_3d(coords, 0, 0, rot_z)), final_shape)), 0)
    elif len(coords) == 2:
        final_shape = np.max(np.vstack(
            (np.abs(rotate_coords_2d(coords, rot_x)), final_shape)), 0)
    final_shape /= min(scale_range)
    return final_shape.astype(int)


# --------------------------------------------------------------------- config
@dataclass(frozen=True)
class AugmentConfig:
    """Static (hashable) augmentation configuration; one jit cache entry per config."""
    patch_size: Tuple[int, ...]              # final patch size fed to the network
    initial_patch_size: Tuple[int, ...]      # inflated sampling patch size
    rotation: float                          # max |angle| in radians
    mirror_axes: Tuple[int, ...] = ()
    do_dummy_2d: bool = False                # 3D volume, rotate in-plane only
    use_mask_for_norm: Tuple[bool, ...] = ()
    deep_supervision_scales: Optional[Tuple[Tuple[float, ...], ...]] = None
    regions: Optional[Tuple[Tuple[int, ...], ...]] = None  # incl. ignore as last
    p_rotation: float = 0.2
    p_scaling: float = 0.2
    scale_range: Tuple[float, float] = (0.7, 1.4)
    # cascade: seg channel 1 is the previous-stage prediction, moved into the data
    # as one-hot fg channels (reference MoveSegAsOneHotToDataTransform), then
    # noised: random binary morphology (dilate/erode/close/open with a random
    # ball, p=0.4/sample) and random connected-component removal (p=0.2/sample)
    # - reference `cascade_transforms.py:40-137`, config
    # `nnUNetTrainer.py:941-959`. Both run in-jit: morphology as ball-kernel
    # convolutions, CC extraction as a radius-capped flood fill.
    is_cascaded: bool = False
    p_cascade_binary_op: float = 0.4
    p_cascade_remove_component: float = 0.2
    cascade_strel_max: int = 8
    foreground_labels: Tuple[int, ...] = ()
    # 'segmentation' (int labels, nearest sampling, -1 fill + RemoveLabel) or
    # 'translation' (float regression target: linear sampling, 0 fill, no label
    # transforms, linear DS downsampling)
    target_type: str = "segmentation"

    @property
    def dim(self):
        return len(self.patch_size)


def _bg_contrast(key, low, high):
    """batchgenerators BGContrast sampling: 50% U(low,1), 50% U(1,high)."""
    k1, k2, k3 = jax.random.split(key, 3)
    below = jax.random.uniform(k1, (), minval=low, maxval=1.0)
    above = jax.random.uniform(k2, (), minval=1.0, maxval=high)
    return jnp.where(jax.random.bernoulli(k3), below, above)


# --------------------------------------------------------------------- spatial
def _affine_sample(vol, matrix, in_shape, out_shape, order: int, fill: float):
    """Sample vol (C, *in_shape) at out-grid coords mapped through `matrix` (d x d),
    both grids centered. order 0 (nearest) or 1 (linear)."""
    dim = len(out_shape)
    grids = jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in out_shape],
                         indexing="ij")
    out_center = jnp.array([(s - 1) / 2.0 for s in out_shape], dtype=jnp.float32)
    in_center = jnp.array([(s - 1) / 2.0 for s in in_shape], dtype=jnp.float32)
    coords = jnp.stack([g - c for g, c in zip(grids, out_center)])  # (d, *out)
    flat = coords.reshape(dim, -1)
    mapped = matrix @ flat + in_center[:, None]
    mapped = mapped.reshape(dim, *out_shape)

    def sample_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, list(mapped), order=order,
                                                 mode="constant", cval=fill)

    return jax.vmap(sample_channel)(vol)


def _rotation_matrix(cfg: AugmentConfig, key):
    dim = cfg.dim
    if dim == 2:
        angle = jax.random.uniform(key, (), minval=-cfg.rotation, maxval=cfg.rotation)
        c, s = jnp.cos(angle), jnp.sin(angle)
        return jnp.array([[c, -s], [s, c]])
    kx, ky, kz = jax.random.split(key, 3)
    if cfg.do_dummy_2d:
        # in-plane rotation only (around axis 0)
        angle = jax.random.uniform(kx, (), minval=-cfg.rotation, maxval=cfg.rotation)
        c, s = jnp.cos(angle), jnp.sin(angle)
        one, zero = jnp.float32(1), jnp.float32(0)
        return jnp.array([[one, zero, zero], [zero, c, -s], [zero, s, c]])
    ax, ay, az = (jax.random.uniform(k, (), minval=-cfg.rotation, maxval=cfg.rotation)
                  for k in (kx, ky, kz))
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one, zero = jnp.float32(1), jnp.float32(0)
    rx = jnp.array([[one, zero, zero], [zero, cx, -sx], [zero, sx, cx]])
    ry = jnp.array([[cy, zero, sy], [zero, one, zero], [-sy, zero, cy]])
    rz = jnp.array([[cz, -sz, zero], [sz, cz, zero], [zero, zero, one]])
    return rz @ ry @ rx


def _spatial_transform(cfg: AugmentConfig, key, data, seg):
    """Rotation+scale crop from initial to final patch size. data (C,*ips), seg
    (S,*ips) or None. Returns (C,*ps), (S,*ps)."""
    k_prot, k_rot, k_pscale, k_scale = jax.random.split(key, 4)
    dim = cfg.dim

    rot = _rotation_matrix(cfg, k_rot)
    do_rot = jax.random.bernoulli(k_prot, cfg.p_rotation)
    rot = jnp.where(do_rot, rot, jnp.eye(dim))

    scale = _bg_contrast(k_scale, cfg.scale_range[0], cfg.scale_range[1])
    do_scale = jax.random.bernoulli(k_pscale, cfg.p_scaling)
    scale = jnp.where(do_scale, scale, 1.0)
    if cfg.do_dummy_2d:
        scale_vec = jnp.array([1.0] + [1.0] * (dim - 1)) * scale
        scale_vec = scale_vec.at[0].set(1.0)
    else:
        scale_vec = jnp.full((dim,), scale)

    # output coord -> input coord: rotate then scale (zoom-out for scale>1)
    matrix = rot * scale_vec[None, :]

    out = _affine_sample(data, matrix, cfg.initial_patch_size, cfg.patch_size,
                         order=1, fill=0.0)
    seg_out = None
    if seg is not None:
        is_translation = cfg.target_type == "translation"
        seg_out = _affine_sample(seg.astype(jnp.float32), matrix,
                                 cfg.initial_patch_size, cfg.patch_size,
                                 order=1 if is_translation else 0,
                                 fill=0.0 if is_translation else -1.0)
    return out, seg_out


# --------------------------------------------------------------------- intensity
def _gaussian_kernel1d(sigma, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-8)) ** 2)
    return k / jnp.sum(k)


def _blur_axis(x, kernel, axis):
    # x: (*spatial); depthwise 1D conv along axis via correlation with edge padding
    radius = kernel.shape[0] // 2
    moved = jnp.moveaxis(x, axis, -1)
    padded = jnp.pad(moved, [(0, 0)] * (moved.ndim - 1) + [(radius, radius)],
                     mode="edge")
    windows = jnp.stack([padded[..., i:i + moved.shape[-1]]
                         for i in range(2 * radius + 1)], axis=-1)
    out = jnp.sum(windows * kernel, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def _gaussian_blur(key, data, p_channel=0.5, sigma_range=(0.5, 1.0)):
    """Per-channel gaussian blur, sigma per channel+axis (synchronize off)."""
    C = data.shape[0]
    dim = data.ndim - 1
    out = []
    for c in range(C):
        ch = data[c]
        apply = jax.random.bernoulli(jax.random.fold_in(key, c), p_channel)
        blurred = ch
        for ax in range(dim):
            sigma = jax.random.uniform(jax.random.fold_in(key, c * 17 + ax + 1),
                                       (), minval=sigma_range[0], maxval=sigma_range[1])
            kernel = _gaussian_kernel1d(sigma, radius=3)
            blurred = _blur_axis(blurred, kernel, ax)
        out.append(jnp.where(apply, blurred, ch))
    return jnp.stack(out)


def _simulate_lowres(key, data, ignore_axes: Tuple[int, ...], p_channel=0.5,
                     scale_range=(0.5, 1.0)):
    """Nearest-downsample + linear-upsample with a traced scale, static shapes.
    Axes synchronized (one scale per channel), reference
    SimulateLowResolutionTransform semantics."""
    C = data.shape[0]
    dim = data.ndim - 1
    out = []
    for c in range(C):
        kc = jax.random.fold_in(key, c)
        apply = jax.random.bernoulli(jax.random.fold_in(kc, 0), p_channel)
        scale = jax.random.uniform(jax.random.fold_in(kc, 1),
                                   (), minval=scale_range[0], maxval=scale_range[1])
        ch = data[c]
        low = ch
        for ax in range(dim):
            if ax in ignore_axes:
                continue
            n = ch.shape[ax]
            m = jnp.maximum(jnp.round(n * scale), 1.0)
            # upsample coords (align_corners=False): v = (i+0.5)*m/n - 0.5
            i = jnp.arange(n, dtype=jnp.float32)
            v = (i + 0.5) * m / n - 0.5
            j0 = jnp.clip(jnp.floor(v), 0, m - 1)
            j1 = jnp.clip(j0 + 1, 0, m - 1)
            w = jnp.clip(v - j0, 0.0, 1.0)
            # nearest-downsample index for low-res cell j: floor((j+0.5)*n/m)
            src0 = jnp.clip(jnp.floor((j0 + 0.5) * n / m), 0, n - 1).astype(jnp.int32)
            src1 = jnp.clip(jnp.floor((j1 + 0.5) * n / m), 0, n - 1).astype(jnp.int32)
            g0 = jnp.take(low, src0, axis=ax)
            g1 = jnp.take(low, src1, axis=ax)
            shape = [1] * low.ndim
            shape[ax] = n
            w = w.reshape(shape)
            low = g0 * (1 - w) + g1 * w
        out.append(jnp.where(apply, low, ch))
    return jnp.stack(out)


def _gamma(key, data, invert: bool, gamma_range=(0.7, 1.5)):
    """Gamma with retain_stats (reference GammaTransform, p_retain_stats=1)."""
    C = data.shape[0]
    out = []
    for c in range(C):
        kc = jax.random.fold_in(key, c)
        g = _bg_contrast(kc, gamma_range[0], gamma_range[1])
        ch = data[c]
        x = -ch if invert else ch
        mean, std = x.mean(), x.std()
        mn = x.min()
        rng = x.max() - mn
        y = jnp.power((x - mn) / jnp.maximum(rng, 1e-7), g) * rng + mn
        # retain stats
        y = (y - y.mean()) / jnp.maximum(y.std(), 1e-8) * std + mean
        y = -y if invert else y
        out.append(y)
    return jnp.stack(out)


def _intensity_chain(cfg: AugmentConfig, key, data):
    keys = jax.random.split(key, 8)
    dim = cfg.dim
    ignore_axes = (0,) if (cfg.do_dummy_2d and dim == 3) else ()

    # gaussian noise (synchronized channels, sigma^2 ~ U(0, 0.1))
    variance = jax.random.uniform(jax.random.fold_in(keys[0], 1), (),
                                  minval=0.0, maxval=0.1)
    noise = jax.random.normal(jax.random.fold_in(keys[0], 2), data.shape) * \
        jnp.sqrt(variance)
    data = jnp.where(jax.random.bernoulli(keys[0], 0.1), data + noise, data)

    # gaussian blur
    data = jnp.where(jax.random.bernoulli(keys[1], 0.2),
                     _gaussian_blur(jax.random.fold_in(keys[1], 1), data), data)

    # multiplicative brightness, per channel
    mult = jnp.stack([_bg_contrast(jax.random.fold_in(keys[2], c), 0.75, 1.25)
                      for c in range(data.shape[0])])
    mult = mult.reshape((-1,) + (1,) * dim)
    data = jnp.where(jax.random.bernoulli(keys[2], 0.15), data * mult, data)

    # contrast (preserve range), per channel
    def contrast_one(c, d):
        f = _bg_contrast(jax.random.fold_in(keys[3], c), 0.75, 1.25)
        mean = d.mean()
        stretched = (d - mean) * f + mean
        return jnp.clip(stretched, d.min(), d.max())
    contrasted = jnp.stack([contrast_one(c, data[c]) for c in range(data.shape[0])])
    data = jnp.where(jax.random.bernoulli(keys[3], 0.15), contrasted, data)

    # simulate low resolution
    data = jnp.where(jax.random.bernoulli(keys[4], 0.25),
                     _simulate_lowres(jax.random.fold_in(keys[4], 1), data,
                                      ignore_axes), data)

    # gamma inverted then plain
    data = jnp.where(jax.random.bernoulli(keys[5], 0.1),
                     _gamma(jax.random.fold_in(keys[5], 1), data, invert=True), data)
    data = jnp.where(jax.random.bernoulli(keys[6], 0.3),
                     _gamma(jax.random.fold_in(keys[6], 1), data, invert=False), data)
    return data


def _mirror(cfg: AugmentConfig, key, data, seg):
    for i, ax in enumerate(cfg.mirror_axes):
        flip = jax.random.bernoulli(jax.random.fold_in(key, i))
        data = jnp.where(flip, jnp.flip(data, axis=ax + 1), data)
        if seg is not None:
            seg = jnp.where(flip, jnp.flip(seg, axis=ax + 1), seg)
    return data, seg


# --------------------------------------------------------------------- seg targets
def _nearest_downsample(seg, out_shape):
    """Nearest-neighbor downsample of (S, *spatial) to (S, *out_shape) using the
    align_corners=False convention (matches torch interpolate 'nearest')."""
    idx = []
    for n, m in zip(seg.shape[1:], out_shape):
        # nearest source index for output j: floor(j * n / m)
        idx.append((np.floor(np.arange(m) * n / m)).astype(np.int32))
    out = seg
    for ax, indices in enumerate(idx):
        out = jnp.take(out, jnp.asarray(indices), axis=ax + 1)
    return out


def convert_seg_to_regions(seg, regions, ignore_label):
    """(1, *spatial) labelmap -> (num_regions, *spatial) binary region masks
    (reference ConvertSegmentationToRegionsTransform)."""
    masks = []
    for region in regions:
        if isinstance(region, (tuple, list)):
            m = jnp.zeros(seg.shape[1:], dtype=bool)
            for r in region:
                m = m | (seg[0] == r)
        else:
            m = seg[0] == region
        masks.append(m)
    return jnp.stack(masks).astype(seg.dtype)


def make_seg_targets(cfg: AugmentConfig, seg):
    """RemoveLabel(-1->0), region conversion, deep-supervision downsampling.
    Translation targets skip the label transforms and downsample linearly."""
    is_translation = cfg.target_type == "translation"
    if not is_translation:
        seg = jnp.where(seg == -1, 0, seg)
        if cfg.regions is not None:
            seg = convert_seg_to_regions(seg, cfg.regions, None)
    if cfg.deep_supervision_scales is None:
        return [seg]
    targets = []
    for scale in cfg.deep_supervision_scales:
        if all(s == 1 for s in scale):
            targets.append(seg)
        else:
            out_shape = [int(round(n * s)) for n, s in zip(cfg.patch_size, scale)]
            if is_translation:
                targets.append(jax.image.resize(
                    seg, (seg.shape[0], *out_shape), method="linear"))
            else:
                targets.append(_nearest_downsample(seg, out_shape))
    return targets


# --------------------------------------------------------------------- entry points
def _augment_sample(cfg: AugmentConfig, key, data, seg):
    k_spatial, k_intensity, k_mirror, k_cascade = jax.random.split(key, 4)
    data, seg = _spatial_transform(cfg, k_spatial, data, seg)
    data = _intensity_chain(cfg, k_intensity, data)
    data, seg = _mirror(cfg, k_mirror, data, seg)

    if any(cfg.use_mask_for_norm) and seg is not None:
        mask = seg[0:1] >= 0
        chans = []
        for c in range(data.shape[0]):
            chans.append(jnp.where(cfg.use_mask_for_norm[c],
                                   jnp.where(mask[0], data[c], 0.0), data[c]))
        data = jnp.stack(chans)

    data, seg = _cascade_move(cfg, data, seg, key=k_cascade)
    targets = make_seg_targets(cfg, seg) if seg is not None else None
    return data, targets


def _cascade_move(cfg: AugmentConfig, data, seg, key=None):
    """Move the prev-stage seg (channel 1) into the data as one-hot fg channels
    (reference MoveSegAsOneHotToDataTransform); with a key (train path), apply
    the reference's cascade noise to the one-hot channels."""
    if not cfg.is_cascaded or seg is None:
        return data, seg
    prev = seg[1]
    onehot = jnp.stack([(prev == l).astype(data.dtype)
                        for l in cfg.foreground_labels])
    if key is not None:
        onehot = _cascade_onehot_noise(cfg, key, onehot)
    return jnp.concatenate([data, onehot], axis=0), seg[0:1]


# ------------------------------------------------------------- cascade noise
def _ball_mask(r, radius_max: int, dim: int):
    """0/1 ball footprint of traced radius r inside a static
    (2*radius_max+1)^dim grid (skimage.morphology.ball semantics)."""
    coords = np.stack(np.meshgrid(
        *([np.arange(-radius_max, radius_max + 1)] * dim), indexing="ij"))
    dist = np.sqrt((coords.astype(np.float64) ** 2).sum(0))
    return (jnp.asarray(dist, jnp.float32) <= r).astype(jnp.float32)


def _binary_conv(x, kernel):
    """SAME convolution of a 0/1 volume with a 0/1 kernel (counts neighbors)."""
    dim = x.ndim
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, *x.shape), (1, 1, *kernel.shape),
        ("NC" + "DHW"[-dim:], "OI" + "DHW"[-dim:], "NC" + "DHW"[-dim:]))
    y = jax.lax.conv_general_dilated(
        x[None, None], kernel[None, None], (1,) * dim, "SAME",
        dimension_numbers=dn)
    return y[0, 0]


def _dilate(x, kernel):
    return (_binary_conv(x, kernel) > 0.5).astype(x.dtype)


def _erode(x, kernel):
    return (_binary_conv(x, kernel) > jnp.sum(kernel) - 0.5).astype(x.dtype)


def _random_binary_operation(key, x, radius_max: int):
    """One of dilate/erode/close/open with a random ball radius in [1, max]
    (reference ApplyRandomBinaryOperatorTransform, `cascade_transforms.py:89-137`)."""
    k_op, k_r = jax.random.split(key)
    kernel = _ball_mask(jax.random.uniform(k_r, (), minval=1.0,
                                           maxval=float(radius_max)),
                        radius_max, x.ndim)
    return jax.lax.switch(
        jax.random.randint(k_op, (), 0, 4),
        [lambda v: _dilate(v, kernel),
         lambda v: _erode(v, kernel),
         lambda v: _erode(_dilate(v, kernel), kernel),    # closing
         lambda v: _dilate(_erode(v, kernel), kernel)],   # opening
        x)


def _remove_random_component(key, x, max_frac: float = 0.15):
    """Remove the connected component containing a random foreground voxel if
    it covers < max_frac of the volume (reference
    RemoveRandomConnectedComponentFromOneHotEncodingTransform,
    `cascade_transforms.py:40-86`). The component is extracted EXACTLY by a
    flood fill (3^d dilate-and-mask) iterated to its fixpoint with a
    ``lax.while_loop``, matching scipy's exact labeling regardless of the
    component's geodesic radius. Each dilation grows the frontier by >=1 voxel
    until convergence, so the loop runs component-radius iterations."""
    has_fg = jnp.sum(x) > 0
    flat = x.reshape(-1)
    seed_idx = jax.random.categorical(
        key, jnp.where(flat > 0, 0.0, -jnp.inf))
    seed = jnp.zeros_like(flat).at[seed_idx].set(1.0).reshape(x.shape)
    seed = jnp.minimum(seed, x)  # empty-fg: start (and stay) all-zero
    box = jnp.ones((3,) * x.ndim, jnp.float32)

    def cond(state):
        comp, prev_n = state
        return jnp.sum(comp) > prev_n

    def body(state):
        comp, _ = state
        return jnp.minimum(_dilate(comp, box), x), jnp.sum(comp)

    comp, _ = jax.lax.while_loop(cond, body,
                                 (seed, jnp.asarray(-1.0, seed.dtype)))
    small = jnp.sum(comp) < max_frac * x.size
    return jnp.where(has_fg & small, x * (1.0 - comp), x)


def _cascade_onehot_noise(cfg: AugmentConfig, key, onehot):
    """Reference train-time cascade noise on the prev-stage one-hot channels
    (`nnUNetTrainer.py:941-959`): binary morphology on every channel in random
    order with p=0.4 per sample (voxels a channel GAINS are cleared from the
    other channels to keep the encoding one-hot), then random component removal
    with p=0.2 per sample."""
    F = onehot.shape[0]
    k_doop, k_perm, k_ops, k_docc, k_cc = jax.random.split(key, 5)
    do_op = jax.random.bernoulli(k_doop, cfg.p_cascade_binary_op)
    perm = jax.random.permutation(k_perm, F)
    op_keys = jax.random.split(k_ops, F)

    def per_channel(j, oh):
        c = perm[j]
        workon = jnp.take(oh, c, axis=0)
        res = _random_binary_operation(op_keys[j], workon,
                                       cfg.cascade_strel_max)
        res = jnp.where(jnp.sum(workon) > 0, res, workon)  # ref: skip empty
        added = ((res - workon) > 0).astype(oh.dtype)
        # clear added voxels from all channels, then write the result back
        oh = oh * (1.0 - added[None])
        return jax.lax.dynamic_update_index_in_dim(oh, res, c, axis=0)

    noised = jax.lax.fori_loop(0, F, per_channel, onehot)
    onehot = jnp.where(do_op, noised, onehot)

    do_cc = jax.random.bernoulli(k_docc, cfg.p_cascade_remove_component)
    cc_keys = jax.random.split(k_cc, F)
    removed = jnp.stack([_remove_random_component(cc_keys[c], onehot[c])
                         for c in range(F)])
    return jnp.where(do_cc, removed, onehot)


@partial(jax.jit, static_argnums=0)
def augment_train_batch(cfg: AugmentConfig, key, data, seg):
    """data (B, C, *initial_patch), seg (B, S, *initial_patch) int16.
    Returns (data (B, C, *patch), [seg targets (B, S', *scaled_patch)])."""
    keys = jax.random.split(key, data.shape[0])
    return jax.vmap(lambda k, d, s: _augment_sample(cfg, k, d, s))(keys, data, seg)


@partial(jax.jit, static_argnums=0)
def prepare_val_batch(cfg: AugmentConfig, data, seg):
    """Validation: no augmentation, only cascade move + RemoveLabel + regions +
    DS downsample."""
    def one(d, s):
        d, s = _cascade_move(cfg, d, s)
        return d, make_seg_targets(cfg, s)
    data, targets = jax.vmap(one)(data, seg)
    return data, targets
