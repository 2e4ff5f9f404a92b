"""ACDC -> nnU-Net raw converter (reference:
`nnunetv2/dataset_conversion/Dataset027_ACDC.py`).

ACDC ships patient folders with ED/ES frames ``patientXXX_frameYY.nii.gz`` and
``_gt`` segmentations (RV=1, MYO=2, LV=3)."""

import os
import shutil
from typing import Optional

from ..paths import get_raw_folder
from ..utilities.io import isdir, join, maybe_mkdir, subdirs, subfiles
from .generate_dataset_json import generate_dataset_json


def convert_acdc(source_folder: str, dataset_id: int = 27) -> str:
    target_name = f"Dataset{dataset_id:03d}_ACDC"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))
    maybe_mkdir(join(target, "imagesTs"))
    maybe_mkdir(join(target, "labelsTs"))

    def handle_split(split_folder: str, img_dir: str, lbl_dir: str) -> int:
        n = 0
        if not isdir(split_folder):
            return 0
        for patient in subdirs(split_folder, prefix="patient"):
            frames = [f for f in subfiles(patient, suffix=".nii.gz",
                                          join_path=False)
                      if "_gt" not in f and "_4d" not in f]
            for frame in frames:
                ident = frame[: -len(".nii.gz")]
                gt = join(patient, ident + "_gt.nii.gz")
                if not os.path.isfile(gt):
                    continue
                shutil.copy(join(patient, frame),
                            join(target, img_dir, f"{ident}_0000.nii.gz"))
                shutil.copy(gt, join(target, lbl_dir, f"{ident}.nii.gz"))
                n += 1
        return n

    n_train = handle_split(join(source_folder, "training"), "imagesTr", "labelsTr")
    if n_train == 0:  # flat layout
        n_train = handle_split(source_folder, "imagesTr", "labelsTr")
    handle_split(join(source_folder, "testing"), "imagesTs", "labelsTs")

    generate_dataset_json(target, {"0": "cineMRI"},
                          {"background": 0, "RV": 1, "MYO": 2, "LV": 3},
                          n_train, ".nii.gz", dataset_name=target_name)
    return target


def clone_dataset_under_new_id(source_dataset_name_or_id, new_id: int,
                               new_suffix: str = "dummy") -> str:
    """Dataset988-style benchmarking clone (reference:
    `nnunetv2/dataset_conversion/Dataset988_dummyDataset4.py`): symlink an existing
    raw dataset under a new id."""
    from ..utilities.dataset_name_id import maybe_convert_to_dataset_name
    src_name = maybe_convert_to_dataset_name(source_dataset_name_or_id)
    src = join(get_raw_folder(), src_name)
    target_name = f"Dataset{new_id:03d}_{new_suffix}"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(target)
    for entry in os.listdir(src):
        s = join(src, entry)
        t = join(target, entry)
        if os.path.exists(t):
            continue
        if os.path.isdir(s):
            os.symlink(s, t, target_is_directory=True)
        else:
            shutil.copy(s, t)
    return target
