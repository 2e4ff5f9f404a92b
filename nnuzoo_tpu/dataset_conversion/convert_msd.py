"""Medical Segmentation Decathlon -> nnU-Net raw format converter (reference:
`nnunetv2/dataset_conversion/convert_MSD_dataset.py`).

MSD tasks store 4D niftis (c as 4th dim) and an MSD-style dataset.json; nnU-Net
wants one 3D file per channel (``_0000`` suffixes) and the v2 dataset.json schema.
"""

import os
import shutil
from typing import Optional

import numpy as np

from ..imageio.nifti import read_nifti, write_nifti
from ..paths import get_raw_folder
from ..utilities.io import isdir, join, load_json, maybe_mkdir, subfiles
from .generate_dataset_json import generate_dataset_json


def split_4d_nifti(in_file: str, output_folder: str) -> None:
    data, info = read_nifti(in_file)
    base = os.path.basename(in_file)
    ending = ".nii.gz" if base.endswith(".nii.gz") else ".nii"
    ident = base[: -len(ending)]
    if data.ndim == 3:
        shutil.copy(in_file, join(output_folder, f"{ident}_0000{ending}"))
        return
    assert data.ndim == 4, f"{in_file}: expected 3D/4D, got {data.shape}"
    for c in range(data.shape[3]):
        write_nifti(join(output_folder, f"{ident}_{c:04d}{ending}"),
                    np.ascontiguousarray(data[..., c]),
                    header_bytes=None, spacing_xyz=info["spacing_xyz"])


def convert_msd_dataset(source_folder: str, overwrite_target_id: Optional[int] = None,
                        num_processes: int = 8) -> str:
    source_folder = source_folder.rstrip("/")
    task_name = os.path.basename(source_folder)
    assert task_name.startswith("Task"), \
        f"MSD task folders are named TaskXX_Name, got {task_name}"
    task_id = int(task_name[4:6])
    name = task_name.split("_", 1)[1]
    target_id = overwrite_target_id if overwrite_target_id is not None else task_id
    target_name = f"Dataset{target_id:03d}_{name}"
    target = join(get_raw_folder(), target_name)

    msd_json = load_json(join(source_folder, "dataset.json"))
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))
    if isdir(join(source_folder, "imagesTs")):
        maybe_mkdir(join(target, "imagesTs"))

    for f in subfiles(join(source_folder, "imagesTr"), suffix=".nii.gz"):
        if os.path.basename(f).startswith("."):
            continue
        split_4d_nifti(f, join(target, "imagesTr"))
    if isdir(join(source_folder, "imagesTs")):
        for f in subfiles(join(source_folder, "imagesTs"), suffix=".nii.gz"):
            if os.path.basename(f).startswith("."):
                continue
            split_4d_nifti(f, join(target, "imagesTs"))
    for f in subfiles(join(source_folder, "labelsTr"), suffix=".nii.gz"):
        if os.path.basename(f).startswith("."):
            continue
        shutil.copy(f, join(target, "labelsTr"))

    # MSD labels are {value: name}; v2 wants {name: value}
    labels = {v: int(k) for k, v in msd_json["labels"].items()}
    channel_names = {str(k): v for k, v in
                     msd_json.get("modality", msd_json.get("channel_names",
                                                           {"0": "image"})).items()}
    n_train = len(set(os.path.basename(f).split(".nii")[0] for f in
                      subfiles(join(target, "labelsTr"), suffix=".nii.gz")))
    generate_dataset_json(target, channel_names, labels, n_train, ".nii.gz",
                          dataset_name=target_name,
                          description=msd_json.get("description"))
    return target
