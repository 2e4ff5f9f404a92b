"""Integration-test dataset generators (reference:
`nnunetv2/dataset_conversion/datasets_for_integration_tests/` + its readme).

The reference derives Datasets 996-999 from MSD Hippocampus to cover the four
labeling regimes (plain labels / +ignore / regions / regions+ignore). No source
data ships with this environment, so we synthesize hippocampus-scale volumes with
two blob structures — same regimes, same ids:

- Dataset999: labels {background, anterior, posterior}
- Dataset998: + ignore label
- Dataset997: regions {whole=(1,2), posterior=2} with regions_class_order
- Dataset996: regions + ignore
"""

import os

import numpy as np

from ..imageio.nifti import write_nifti
from ..paths import get_raw_folder
from ..utilities.io import join, maybe_mkdir
from .generate_dataset_json import generate_dataset_json


def _make_case(rng, shape=(36, 50, 35)):
    vol = rng.rand(*shape).astype(np.float32) * 90 + 10
    vol[:2] = 0
    vol[-2:] = 0
    seg = np.zeros(shape, dtype=np.uint8)
    cx, cy, cz = (rng.randint(s // 3, 2 * s // 3) for s in shape)
    xx, yy, zz = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    r2 = (xx - cx) ** 2 + (yy - cy) ** 2 + (zz - cz) ** 2
    seg[r2 < 64] = 1
    seg[r2 < 16] = 2
    seg[vol == 0] = 0
    return vol, seg


def _write_dataset(dataset_name: str, labels: dict, num_cases: int,
                   regions_class_order=None, add_ignore_band: bool = False,
                   ignore_label: int = None, seed: int = 0) -> str:
    rng = np.random.RandomState(seed)
    root = join(get_raw_folder(), dataset_name)
    maybe_mkdir(join(root, "imagesTr"))
    maybe_mkdir(join(root, "labelsTr"))
    maybe_mkdir(join(root, "imagesTs"))
    maybe_mkdir(join(root, "labelsTs"))
    for i in range(num_cases + 2):  # +2 test cases
        vol, seg = _make_case(rng)
        if add_ignore_band:
            seg = seg.copy()
            seg[:, :3, :] = ignore_label  # unannotated band
        train = i < num_cases
        img_dir = "imagesTr" if train else "imagesTs"
        lbl_dir = "labelsTr" if train else "labelsTs"
        ident = f"hippo_{i:03d}"
        write_nifti(join(root, img_dir, f"{ident}_0000.nii.gz"), vol,
                    spacing_xyz=(1.0, 1.0, 1.0))
        write_nifti(join(root, lbl_dir, f"{ident}.nii.gz"), seg,
                    spacing_xyz=(1.0, 1.0, 1.0))
    generate_dataset_json(root, {"0": "MRI"}, labels, num_cases, ".nii.gz",
                          regions_class_order=regions_class_order,
                          dataset_name=dataset_name)
    return root


def create_dataset_999(num_cases: int = 8):
    return _write_dataset("Dataset999_IntegrationTest",
                          {"background": 0, "anterior": 1, "posterior": 2},
                          num_cases)


def create_dataset_998(num_cases: int = 8):
    return _write_dataset("Dataset998_IntegrationTestIgnore",
                          {"background": 0, "anterior": 1, "posterior": 2,
                           "ignore": 3},
                          num_cases, add_ignore_band=True, ignore_label=3)


def create_dataset_997(num_cases: int = 8):
    return _write_dataset("Dataset997_IntegrationTestRegions",
                          {"background": 0, "whole": (1, 2), "posterior": 2},
                          num_cases, regions_class_order=(1, 2))


def create_dataset_996(num_cases: int = 8):
    return _write_dataset("Dataset996_IntegrationTestRegionsIgnore",
                          {"background": 0, "whole": (1, 2), "posterior": 2,
                           "ignore": 3},
                          num_cases, regions_class_order=(1, 2),
                          add_ignore_band=True, ignore_label=3)


def create_all_integration_test_datasets(num_cases: int = 8):
    return [create_dataset_999(num_cases), create_dataset_998(num_cases),
            create_dataset_997(num_cases), create_dataset_996(num_cases)]
