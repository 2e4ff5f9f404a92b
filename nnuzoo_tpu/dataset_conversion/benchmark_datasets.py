"""Converters for the paper's benchmark datasets (reference:
`nnunetv2/dataset_conversion/` per-dataset scripts; BASELINE.md table columns).

Each converts a public dataset's native layout into nnU-Net raw format. Source
data is not present in this environment, so these follow the published layouts
defensively and are exercised by synthetic-layout tests.
"""

import os
import shutil
from typing import Optional

import numpy as np

from ..paths import get_raw_folder
from ..utilities.io import isdir, join, maybe_mkdir, subdirs, subfiles
from .generate_dataset_json import generate_dataset_json


def convert_camus(source_folder: str, dataset_id: int = 31) -> str:
    """CAMUS echocardiography (reference Dataset031-style): patient folders with
    2CH/4CH ED/ES images ``patientXXXX_{2CH,4CH}_{ED,ES}.nii.gz`` (or .mhd in old
    releases) and ``_gt`` labels (LV endo=1, LV epi=2, LA=3)."""
    target_name = f"Dataset{dataset_id:03d}_CAMUS"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))

    n = 0
    patients = subdirs(source_folder, prefix="patient") or [source_folder]
    for patient in patients:
        for f in subfiles(patient, suffix=".nii.gz", join_path=False):
            if "_gt" in f or "_sequence" in f:
                continue
            ident = f[: -len(".nii.gz")]
            gt = join(patient, ident + "_gt.nii.gz")
            if not os.path.isfile(gt):
                continue
            shutil.copy(join(patient, f),
                        join(target, "imagesTr", f"{ident}_0000.nii.gz"))
            shutil.copy(gt, join(target, "labelsTr", f"{ident}.nii.gz"))
            n += 1
    generate_dataset_json(target, {"0": "US"},
                          {"background": 0, "LVendo": 1, "LVepi": 2, "LA": 3},
                          n, ".nii.gz", dataset_name=target_name)
    return target


def convert_neurips_cellseg(source_folder: str, dataset_id: int = 32) -> str:
    """NeurIPS-CellSeg microscopy (reference Dataset032_NeurlPSCell): images/
    and labels/ folders of 2D png/tif; instance labels binarized to
    {background, cell interior=1, cell boundary=2} three-class like the
    reference's conversion."""
    from PIL import Image
    from scipy.ndimage import binary_erosion

    target_name = f"Dataset{dataset_id:03d}_NeurlPSCell"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))

    img_dir = join(source_folder, "images")
    lbl_dir = join(source_folder, "labels")
    assert isdir(img_dir) and isdir(lbl_dir), \
        f"expected images/ and labels/ under {source_folder}"

    n = 0
    for f in sorted(os.listdir(img_dir)):
        base = f.rsplit(".", 1)[0]
        lbl_candidates = [l for l in os.listdir(lbl_dir) if l.startswith(base)]
        if not lbl_candidates:
            continue
        img = np.asarray(Image.open(join(img_dir, f)))
        inst = np.asarray(Image.open(join(lbl_dir, lbl_candidates[0])))
        # instance map -> interior / boundary semantic classes
        sem = np.zeros(inst.shape[:2], dtype=np.uint8)
        for inst_id in np.unique(inst):
            if inst_id == 0:
                continue
            mask = inst == inst_id
            interior = binary_erosion(mask, iterations=1)
            sem[mask] = 2          # boundary
            sem[interior] = 1      # interior
        if img.ndim == 3:
            for c in range(min(3, img.shape[2])):
                Image.fromarray(img[..., c]).save(
                    join(target, "imagesTr", f"{base}_{c:04d}.png"))
            channels = {str(c): "microscopy" for c in range(min(3, img.shape[2]))}
        else:
            Image.fromarray(img).save(join(target, "imagesTr",
                                           f"{base}_0000.png"))
            channels = {"0": "microscopy"}
        Image.fromarray(sem).save(join(target, "labelsTr", f"{base}.png"))
        n += 1
    generate_dataset_json(target, channels,
                          {"background": 0, "interior": 1, "boundary": 2},
                          n, ".png", dataset_name=target_name,
                          overwrite_image_reader_writer="NaturalImage2DIO")
    return target


def convert_amos(source_folder: str, dataset_id: int = 30,
                 modality: str = "MR") -> str:
    """AMOS 2022 (reference Dataset030_AbdomenMR / AbdomenCT via AMOS task1/2):
    MSD-style imagesTr/labelsTr with amos_XXXX.nii.gz; ids >= 500 are MRI,
    < 500 CT."""
    name = "AbdomenMR" if modality.upper() == "MR" else "AbdomenCT"
    target_name = f"Dataset{dataset_id:03d}_{name}"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))

    n = 0
    for f in subfiles(join(source_folder, "imagesTr"), suffix=".nii.gz",
                      join_path=False):
        ident = f[: -len(".nii.gz")]
        try:
            case_id = int(ident.split("_")[-1])
        except ValueError:
            case_id = 0
        is_mr = case_id >= 500
        if is_mr != (modality.upper() == "MR"):
            continue
        gt = join(source_folder, "labelsTr", f)
        if not os.path.isfile(gt):
            continue
        shutil.copy(join(source_folder, "imagesTr", f),
                    join(target, "imagesTr", f"{ident}_0000.nii.gz"))
        shutil.copy(gt, join(target, "labelsTr", f))
        n += 1

    labels = {"background": 0, "spleen": 1, "right_kidney": 2, "left_kidney": 3,
              "gallbladder": 4, "esophagus": 5, "liver": 6, "stomach": 7,
              "aorta": 8, "inferior_vena_cava": 9, "pancreas": 10,
              "right_adrenal_gland": 11, "left_adrenal_gland": 12,
              "duodenum": 13}
    if modality.upper() != "MR":
        labels.update({"bladder": 14, "prostate_uterus": 15})
    generate_dataset_json(target, {"0": modality.upper()}, labels, n, ".nii.gz",
                          dataset_name=target_name)
    return target
