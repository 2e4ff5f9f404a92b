"""Shared test fixtures: synthetic nnU-Net-format datasets."""

import os

import numpy as np

from nnuzoo_tpu.imageio.nifti import write_nifti
from nnuzoo_tpu.utilities.io import maybe_mkdir, save_json


def make_synthetic_dataset(root: str, dataset_name: str = "Dataset999_Synth",
                           num_cases: int = 6, shape=(20, 24, 16),
                           spacing_xyz=(1.0, 1.0, 1.0), num_channels: int = 1,
                           seed: int = 0, labels=None, anisotropic: bool = False):
    """Creates imagesTr/labelsTr with blob segmentations. shape is on-disk (x, y, z)."""
    rng = np.random.RandomState(seed)
    ds = os.path.join(root, dataset_name)
    maybe_mkdir(os.path.join(ds, "imagesTr"))
    maybe_mkdir(os.path.join(ds, "labelsTr"))
    if labels is None:
        labels = {"background": 0, "organ": 1, "tumor": 2}
    if anisotropic:
        spacing_xyz = (1.0, 1.0, 5.0)

    for i in range(num_cases):
        vol = rng.rand(*shape).astype(np.float32) * 80 + 10
        # zero border so crop-to-nonzero has work to do
        vol[:2] = 0
        vol[-2:] = 0
        seg = np.zeros(shape, dtype=np.uint8)
        cx, cy, cz = (rng.randint(s // 4, 3 * s // 4) for s in shape)
        xx, yy, zz = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
        r2 = ((xx - cx) ** 2 + (yy - cy) ** 2 + (zz - cz) ** 2)
        seg[r2 < 25] = 1
        if len([v for v in labels.values() if not isinstance(v, (list, tuple))]) > 2:
            seg[r2 < 6] = 2
        seg[vol == 0] = 0
        for c in range(num_channels):
            write_nifti(os.path.join(ds, "imagesTr", f"case_{i:03d}_{c:04d}.nii.gz"),
                        vol + 5 * c, spacing_xyz=spacing_xyz)
        write_nifti(os.path.join(ds, "labelsTr", f"case_{i:03d}.nii.gz"), seg,
                    spacing_xyz=spacing_xyz)

    save_json({"channel_names": {str(c): "MRI" for c in range(num_channels)},
               "labels": labels, "numTraining": num_cases,
               "file_ending": ".nii.gz"}, os.path.join(ds, "dataset.json"))
    return ds


def set_paths(tmp_path):
    raw = str(tmp_path / "raw")
    pp = str(tmp_path / "pp")
    res = str(tmp_path / "res")
    for p in (raw, pp, res):
        os.makedirs(p, exist_ok=True)
    os.environ["nnUNet_raw"] = raw
    os.environ["nnUNet_preprocessed"] = pp
    os.environ["nnUNet_results"] = res
    return raw, pp, res
