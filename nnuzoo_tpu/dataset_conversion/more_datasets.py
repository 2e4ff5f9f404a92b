"""Remaining per-dataset converters (reference `nnunetv2/dataset_conversion/`):

- MNMs cardiac MRI              (`Dataset114_MNMs.py`)
- EMIDEC cardiac MRI            (`Dataset115_EMIDEC.py`)
- Massachusetts road seg        (`Dataset120_RoadSegmentation.py`)
- BraTS 2021 brain tumor        (`Dataset137_BraTS21.py`)
- KiTS 2023 kidney CT           (`Dataset220_KiTS2023.py`)
- AutoPET-II PET/CT             (`Dataset221_AutoPETII_2023.py`) — paper "PET" column
- Fluo-C3DH-A549-SIM 3D tif     (`Dataset073_Fluo_C3DH_A549_SIM.py`)
- old-nnUNet (v1 Task) import   (`convert_raw_dataset_from_old_nnunet_format.py`)

Source data is not shipped in this environment; converters follow the published
layouts and are exercised by synthetic-layout tests (tests/test_dataset_conversion.py).
"""

import csv
import os
import shutil
from copy import deepcopy
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..imageio.nifti import read_nifti, write_nifti
from ..paths import get_preprocessed_folder, get_raw_folder
from ..utilities.io import (isdir, isfile, join, load_json, maybe_mkdir,
                            save_json, subdirs, subfiles)
from .generate_dataset_json import generate_dataset_json


# --------------------------------------------------------------------- MNMs
def _read_mnms_csv(csv_file: str) -> Dict[str, dict]:
    """Per-patient {ed, es, vendor} from the M&Ms info csv (columns
    'External code', 'ED', 'ES', 'Vendor')."""
    info = {}
    with open(csv_file, newline="") as f:
        reader = csv.reader(f)
        headers = next(reader)
        ip = headers.index("External code")
        ied, ies = headers.index("ED"), headers.index("ES")
        iv = headers.index("Vendor")
        for row in reader:
            info[row[ip]] = {"ed": int(row[ied]), "es": int(row[ies]),
                             "vendor": row[iv]}
    return info


def _extract_mnms_frames(nifti_path: str, frames: List[int], out_dir: str,
                         patient: str, is_label: bool) -> None:
    """Slice the requested time frames out of a 4D (x,y,z,t) cine volume and
    write each as a 3D nifti named ``{patient}_frame{NN}[_0000].nii.gz``."""
    data, info = read_nifti(nifti_path)
    for fr in frames:
        vol = np.ascontiguousarray(data[..., fr]) if data.ndim == 4 else data
        suffix = ".nii.gz" if is_label else "_0000.nii.gz"
        write_nifti(join(out_dir, f"{patient}_frame{fr:02d}{suffix}"),
                    np.asfortranarray(vol), spacing_xyz=info["spacing_xyz"])


def convert_mnms(source_folder: str, csv_file_name: str,
                 dataset_id: int = 114) -> str:
    """M&Ms multi-vendor cardiac MRI: 4D short-axis cines under
    Training/Labeled and Testing; ED/ES frame indices come from the csv."""
    target_name = f"Dataset{dataset_id:03d}_MNMs"
    target = join(get_raw_folder(), target_name)
    for d in ("imagesTr", "labelsTr", "imagesTs"):
        maybe_mkdir(join(target, d))
    info = _read_mnms_csv(join(source_folder, csv_file_name))

    def handle(patients: List[str], img_dir: str, lbl_dir: Optional[str]) -> int:
        n = 0
        for pat_dir in patients:
            pat = os.path.basename(pat_dir)
            if pat not in info:
                continue
            frames = [info[pat]["ed"], info[pat]["es"]]
            img = join(pat_dir, f"{pat}_sa.nii.gz")
            if not isfile(img):
                continue
            _extract_mnms_frames(img, frames, join(target, img_dir), pat, False)
            if lbl_dir is not None:
                gt = join(pat_dir, f"{pat}_sa_gt.nii.gz")
                if isfile(gt):
                    _extract_mnms_frames(gt, frames, join(target, lbl_dir),
                                         pat, True)
            n += 1
        return n

    n_train = handle(subdirs(join(source_folder, "Training", "Labeled")),
                     "imagesTr", "labelsTr")
    if isdir(join(source_folder, "Testing")):
        handle(subdirs(join(source_folder, "Testing")), "imagesTs", None)

    generate_dataset_json(target, {"0": "cineMRI"},
                          {"background": 0, "LVBP": 1, "LVM": 2, "RV": 3},
                          n_train * 2,  # ED and ES per patient
                          ".nii.gz", dataset_name=target_name)
    return target


def create_mnms_custom_splits(source_folder: str, csv_file_name: str,
                              dataset_id: int = 114,
                              num_val_patients: int = 25,
                              seed: int = 12345) -> str:
    """Append the paper's vendor-transfer splits (train on A, B, or an A+B mix;
    validate on A, B, A+B) to splits_final.json (reference
    `Dataset114_MNMs.py:103-141`, arXiv:2011.07592 table 3)."""
    splits_file = join(get_preprocessed_folder(),
                       f"Dataset{dataset_id:03d}_MNMs", "splits_final.json")
    splits = load_json(splits_file)
    patients_train = [os.path.basename(p) for p in
                      subdirs(join(source_folder, "Training", "Labeled"))]
    info = {p: d for p, d in
            _read_mnms_csv(join(source_folder, csv_file_name)).items()
            if p in patients_train}

    rng = np.random.RandomState(seed)

    def vendor_split(vendor: str) -> Tuple[List[str], List[str]]:
        pats = sorted(p for p, d in info.items() if d["vendor"] == vendor)
        rng.shuffle(pats)
        return pats[:-num_val_patients], pats[-num_val_patients:]

    def idents(pats: List[str]) -> List[str]:
        return [f"{p}_frame{info[p][fr]:02d}" for p in pats
                for fr in ("es", "ed")]

    train_a, val_a = vendor_split("A")
    train_b, val_b = vendor_split("B")
    ta, tb = idents(train_a), idents(train_b)
    va, vb = idents(val_a), idents(val_b)
    mixes = [ta, tb, ta[:len(ta) // 2] + tb[:len(tb) // 2],
             ta[len(ta) // 2:] + tb[len(tb) // 2:]]
    for train_set in mixes:
        for val_set in (va, vb, va + vb):
            splits.append({"train": train_set, "val": val_set})
    save_json(splits, splits_file)
    return splits_file


# --------------------------------------------------------------------- EMIDEC
def convert_emidec(src_data_dir: str, src_test_dir: Optional[str] = None,
                   dataset_id: int = 115) -> str:
    """EMIDEC DE-MRI myocardial infarction: patient folders with Images/ and
    Contours/ subdirs holding ``{patient}.nii.gz``."""
    target_name = f"Dataset{dataset_id:03d}_EMIDEC"
    target = join(get_raw_folder(), target_name)
    for d in ("imagesTr", "labelsTr", "imagesTs"):
        maybe_mkdir(join(target, d))

    n = 0
    for pat_dir in subdirs(src_data_dir):
        pat = os.path.basename(pat_dir)
        img = join(pat_dir, "Images", f"{pat}.nii.gz")
        lbl = join(pat_dir, "Contours", f"{pat}.nii.gz")
        if not (isfile(img) and isfile(lbl)):
            continue
        shutil.copy(img, join(target, "imagesTr", f"{pat}_0000.nii.gz"))
        shutil.copy(lbl, join(target, "labelsTr", f"{pat}.nii.gz"))
        n += 1
    if src_test_dir is not None and isdir(src_test_dir):
        for pat_dir in subdirs(src_test_dir):
            pat = os.path.basename(pat_dir)
            img = join(pat_dir, "Images", f"{pat}.nii.gz")
            if isfile(img):
                shutil.copy(img, join(target, "imagesTs", f"{pat}_0000.nii.gz"))

    generate_dataset_json(
        target, {"0": "cineMRI"},
        {"background": 0, "cavity": 1, "normal_myocardium": 2,
         "myocardial_infarction": 3, "no_reflow": 4},
        n, ".nii.gz", dataset_name=target_name)
    return target


# ------------------------------------------------------------------ RoadSeg
def _clean_road_case(input_image: str, input_seg: str, output_image: str,
                     output_seg: str, min_component_size: int = 50) -> None:
    """Binarize the road mask and zero it inside large saturated-white image
    regions (scan borders with no imagery; reference
    `Dataset120_RoadSegmentation.py:15-29`)."""
    from PIL import Image
    from scipy import ndimage

    seg = np.asarray(Image.open(input_seg)).copy()
    seg[seg == 255] = 1
    img = np.asarray(Image.open(input_image)).astype(np.int32)
    white = img[..., :3].sum(-1) == 3 * 255
    lab, n_comp = ndimage.label(white)
    if n_comp:
        sizes = np.bincount(lab.ravel())
        keep = np.zeros(n_comp + 1, bool)
        keep[1:] = sizes[1:] > min_component_size
        white = keep[lab]
    white = ndimage.binary_fill_holes(white)
    seg[white] = 0
    Image.fromarray(seg.astype(np.uint8)).save(output_seg)
    shutil.copy(input_image, output_image)


def convert_road_segmentation(source_folder: str, dataset_id: int = 120) -> str:
    """Massachusetts roads aerial RGB: training/ and testing/ with input/ and
    output/ png pairs; only images with a segmentation are converted."""
    target_name = f"Dataset{dataset_id:03d}_RoadSegmentation"
    target = join(get_raw_folder(), target_name)
    for d in ("imagesTr", "labelsTr", "imagesTs", "labelsTs"):
        maybe_mkdir(join(target, d))

    def handle(split: str, img_dir: str, lbl_dir: str) -> int:
        src = join(source_folder, split)
        if not isdir(join(src, "output")):
            return 0
        ids = subfiles(join(src, "output"), suffix=".png", join_path=False)
        for v in ids:
            _clean_road_case(join(src, "input", v), join(src, "output", v),
                             join(target, img_dir, v[:-4] + "_0000.png"),
                             join(target, lbl_dir, v))
        return len(ids)

    n_train = handle("training", "imagesTr", "labelsTr")
    handle("testing", "imagesTs", "labelsTs")
    generate_dataset_json(target, {"0": "R", "1": "G", "2": "B"},
                          {"background": 0, "road": 1}, n_train, ".png",
                          dataset_name=target_name,
                          overwrite_image_reader_writer="NaturalImage2DIO")
    return target


# ------------------------------------------------------------------ BraTS21
_BRATS_TO_NNUNET = {0: 0, 1: 2, 2: 1, 4: 3}   # necrotic->2, edema->1, enhancing->3


def _remap_labels(seg: np.ndarray, mapping: Dict[int, int]) -> np.ndarray:
    out = np.zeros_like(seg)
    for src, dst in mapping.items():
        out[seg == src] = dst
    return out


def convert_labels_back_to_brats(seg: np.ndarray) -> np.ndarray:
    """Inverse of the training-time remap (nnU-Net 1/2/3 -> BraTS 2/1/4)."""
    return _remap_labels(seg, {v: k for k, v in _BRATS_TO_NNUNET.items()})


def convert_folder_back_to_brats(input_folder: str, output_folder: str) -> None:
    """Rewrite all predicted niftis in BraTS labeling convention."""
    maybe_mkdir(output_folder)
    for f in subfiles(input_folder, suffix=".nii.gz", join_path=False):
        data, info = read_nifti(join(input_folder, f))
        write_nifti(join(output_folder, f),
                    convert_labels_back_to_brats(np.asarray(data)),
                    header_bytes=info["header_bytes"])


def convert_brats21(source_folder: str, dataset_id: int = 137) -> str:
    """BraTS 2021: BraTS* case folders with _t1/_t1ce/_t2/_flair modalities and
    a _seg with labels {0,1,2,4}; converted to contiguous region labels
    (whole tumor / tumor core / enhancing)."""
    target_name = f"Dataset{dataset_id:03d}_BraTS2021"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))

    cases = subdirs(source_folder, prefix="BraTS", join_path=False)
    for c in cases:
        for i, mod in enumerate(("t1", "t1ce", "t2", "flair")):
            shutil.copy(join(source_folder, c, f"{c}_{mod}.nii.gz"),
                        join(target, "imagesTr", f"{c}_{i:04d}.nii.gz"))
        seg, info = read_nifti(join(source_folder, c, f"{c}_seg.nii.gz"))
        seg = np.asarray(seg)
        bad = set(np.unique(seg)) - set(_BRATS_TO_NNUNET)
        if bad:
            raise RuntimeError(f"{c}: unexpected BraTS labels {sorted(bad)}")
        write_nifti(join(target, "labelsTr", f"{c}.nii.gz"),
                    _remap_labels(seg, _BRATS_TO_NNUNET).astype(np.uint8),
                    header_bytes=info["header_bytes"])

    generate_dataset_json(
        target, {"0": "T1", "1": "T1ce", "2": "T2", "3": "Flair"},
        {"background": 0, "whole_tumor": (1, 2, 3), "tumor_core": (2, 3),
         "enhancing_tumor": (3,)},
        len(cases), ".nii.gz", regions_class_order=(1, 2, 3),
        dataset_name=target_name)
    return target


# ------------------------------------------------------------------ KiTS23
def convert_kits2023(source_folder: str, dataset_id: int = 220) -> str:
    """KiTS 2023 kidney CT: case_XXXXX folders with imaging.nii.gz and
    segmentation.nii.gz; region labels kidney/masses/tumor."""
    target_name = f"Dataset{dataset_id:03d}_KiTS2023"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))

    cases = subdirs(source_folder, prefix="case_", join_path=False)
    for c in cases:
        shutil.copy(join(source_folder, c, "imaging.nii.gz"),
                    join(target, "imagesTr", f"{c}_0000.nii.gz"))
        shutil.copy(join(source_folder, c, "segmentation.nii.gz"),
                    join(target, "labelsTr", f"{c}.nii.gz"))

    generate_dataset_json(
        target, {"0": "CT"},
        {"background": 0, "kidney": (1, 2, 3), "masses": (2, 3), "tumor": 2},
        len(cases), ".nii.gz", regions_class_order=(1, 3, 2),
        dataset_name=target_name)
    return target


# ------------------------------------------------------------------ AutoPET-II
def convert_autopet(source_folder: str, dataset_id: int = 221) -> str:
    """AutoPET-II whole-body FDG-PET/CT (the paper's PET benchmark column):
    PETCT_* patient folders, each with per-acquisition subfolders holding
    CTres.nii.gz (channel 0), SUV.nii.gz (channel 1) and SEG.nii.gz. Also
    writes patient-stratified 5-fold splits so acquisitions of one patient
    never straddle train/val."""
    target_name = f"Dataset{dataset_id:03d}_AutoPETII_2023"
    target = join(get_raw_folder(), target_name)
    maybe_mkdir(join(target, "imagesTr"))
    maybe_mkdir(join(target, "labelsTr"))

    patients = subdirs(source_folder, prefix="PETCT", join_path=False)
    identifiers = []
    for pat in patients:
        for acq in subdirs(join(source_folder, pat), join_path=False):
            ident = f"{pat}_{acq}"
            identifiers.append(ident)
            src = join(source_folder, pat, acq)
            shutil.copy(join(src, "CTres.nii.gz"),
                        join(target, "imagesTr", f"{ident}_0000.nii.gz"))
            shutil.copy(join(src, "SUV.nii.gz"),
                        join(target, "imagesTr", f"{ident}_0001.nii.gz"))
            shutil.copy(join(src, "SEG.nii.gz"),
                        join(target, "labelsTr", f"{ident}.nii.gz"))

    generate_dataset_json(target, {"0": "CT", "1": "CT"},
                          {"background": 0, "tumor": 1},
                          len(identifiers), ".nii.gz",
                          dataset_name=target_name)

    # patient-level (not acquisition-level) 5-fold split
    splits = []
    for fold in range(5):
        val_pats = patients[fold::5]
        splits.append({
            "train": [i for i in identifiers
                      if not any(i.startswith(v) for v in val_pats)],
            "val": [i for i in identifiers
                    if any(i.startswith(v) for v in val_pats)],
        })
    pp_dir = join(get_preprocessed_folder(), target_name)
    maybe_mkdir(pp_dir)
    save_json(splits, join(pp_dir, "splits_final.json"), sort_keys=False)
    return target


# ------------------------------------------------------- Fluo-C3DH-A549-SIM
def convert_fluo_c3dh_a549_sim(train_source: str,
                               test_source: Optional[str] = None,
                               dataset_id: int = 73,
                               spacing: Tuple[float, float, float] = (1, 0.126, 0.126),
                               ) -> str:
    """Cell-tracking-challenge Fluo-C3DH-A549-SIM 3D tif: sequences 01/02 with
    01_GT/SEG ground truth. Tif has no reliable spacing metadata, so every
    case gets a sidecar ``{ident}.json`` with the axis-aligned spacing."""
    target_name = f"Dataset{dataset_id:03d}_Fluo_C3DH_A549_SIM"
    target = join(get_raw_folder(), target_name)
    for d in ("imagesTr", "labelsTr", "imagesTs"):
        maybe_mkdir(join(target, d))

    n = 0
    for seq in ("01", "02"):
        images_dir = join(train_source, seq)
        seg_dir = join(train_source, seq + "_GT", "SEG")
        if not isdir(images_dir):
            continue
        images = subfiles(images_dir, suffix=".tif", join_path=False)
        segs = subfiles(seg_dir, suffix=".tif", join_path=False)
        for i, (im, se) in enumerate(zip(images, segs)):
            ident = f"{seq}_image_{i:03d}"
            shutil.copy(join(images_dir, im),
                        join(target, "imagesTr", ident + "_0000.tif"))
            save_json({"spacing": list(spacing)},
                      join(target, "imagesTr", ident + ".json"))
            shutil.copy(join(seg_dir, se),
                        join(target, "labelsTr", ident + ".tif"))
            save_json({"spacing": list(spacing)},
                      join(target, "labelsTr", ident + ".json"))
            n += 1
    if test_source is not None and isdir(test_source):
        for seq in ("01", "02"):
            images_dir = join(test_source, seq)
            if not isdir(images_dir):
                continue
            for i, im in enumerate(subfiles(images_dir, suffix=".tif",
                                            join_path=False)):
                ident = f"{seq}_image_{i:03d}"
                shutil.copy(join(images_dir, im),
                            join(target, "imagesTs", ident + "_0000.tif"))
                save_json({"spacing": list(spacing)},
                          join(target, "imagesTs", ident + ".json"))

    generate_dataset_json(target, {"0": "fluorescence_microscopy"},
                          {"background": 0, "cell": 1}, n, ".tif",
                          dataset_name=target_name)

    # the dataset's canonical 2-fold split: train 01 / val 02 and vice versa
    caseids = [f[:-4] for f in
               subfiles(join(target, "labelsTr"), suffix=".tif",
                        join_path=False)]
    splits = [
        {"train": [c for c in caseids if c.startswith("01_")],
         "val": [c for c in caseids if c.startswith("02_")]},
        {"train": [c for c in caseids if c.startswith("02_")],
         "val": [c for c in caseids if c.startswith("01_")]},
    ]
    pp_dir = join(get_preprocessed_folder(), target_name)
    maybe_mkdir(pp_dir)
    save_json(splits, join(pp_dir, "splits_final.json"))
    return target


# ------------------------------------------------------------ old nnU-Net v1
def convert_old_nnunet_dataset(source_folder: str,
                               target_dataset_name: str) -> str:
    """Import a v1 ``TaskXXX_YYY`` raw dataset as ``DatasetXXX_YYY``: copy the
    image/label trees and rewrite dataset.json to the v2 schema
    (``modality``->``channel_names``, label dict inverted, file_ending added)."""
    target = join(get_raw_folder(), target_dataset_name)
    if isdir(target):
        raise RuntimeError(
            f"target dataset {target_dataset_name} already exists at {target}; "
            "delete it manually to re-convert")
    maybe_mkdir(target)
    for sub in ("imagesTr", "labelsTr", "imagesTs", "labelsTs",
                "imagesVal", "labelsVal"):
        if isdir(join(source_folder, sub)):
            shutil.copytree(join(source_folder, sub), join(target, sub))

    dj = deepcopy(load_json(join(source_folder, "dataset.json")))
    for stale in ("tensorImageSize", "numTest", "training", "test"):
        dj.pop(stale, None)
    if "modality" in dj:
        dj["channel_names"] = dj.pop("modality")
    # v1 stored {label_value: name}; v2 wants {name: label_value}
    dj["labels"] = {name: int(value) for value, name in dj["labels"].items()}
    dj.setdefault("file_ending", ".nii.gz")
    if "numTraining" not in dj:
        dj["numTraining"] = len(subfiles(join(target, "labelsTr"),
                                         join_path=False))
    save_json(dj, join(target, "dataset.json"), sort_keys=False)
    return target
