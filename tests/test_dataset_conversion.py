import os

import numpy as np
import pytest

from .helpers import set_paths


def test_msd_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.convert_msd import convert_msd_dataset
    from nnuzoo_tpu.imageio.nifti import read_nifti, write_nifti
    from nnuzoo_tpu.utilities.io import maybe_mkdir, save_json

    src = str(tmp_path / "Task05_Prostate")
    maybe_mkdir(src + "/imagesTr")
    maybe_mkdir(src + "/labelsTr")
    rng = np.random.RandomState(0)
    # 4D multichannel MSD image
    img = rng.rand(10, 12, 8, 2).astype(np.float32)
    seg = (img[..., 0] > 0.5).astype(np.uint8)
    write_nifti(src + "/imagesTr/prostate_00.nii.gz", img, (1, 1, 1))
    write_nifti(src + "/labelsTr/prostate_00.nii.gz", seg, (1, 1, 1))
    save_json({"labels": {"0": "background", "1": "PZ"},
               "modality": {"0": "T2", "1": "ADC"},
               "description": "test"}, src + "/dataset.json")

    target = convert_msd_dataset(src, overwrite_target_id=105)
    assert os.path.basename(target) == "Dataset105_Prostate"
    files = sorted(os.listdir(target + "/imagesTr"))
    assert files == ["prostate_00_0000.nii.gz", "prostate_00_0001.nii.gz"]
    data, _ = read_nifti(target + "/imagesTr/prostate_00_0000.nii.gz")
    assert data.shape == (10, 12, 8)
    from nnuzoo_tpu.utilities.io import load_json
    dj = load_json(target + "/dataset.json")
    assert dj["labels"] == {"background": 0, "PZ": 1}
    assert dj["numTraining"] == 1


def test_acdc_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.acdc import convert_acdc
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import maybe_mkdir

    src = str(tmp_path / "acdc_src")
    for p in ("patient001", "patient002"):
        maybe_mkdir(f"{src}/training/{p}")
        rng = np.random.RandomState(0)
        for frame in ("frame01", "frame12"):
            vol = rng.rand(8, 8, 6).astype(np.float32)
            write_nifti(f"{src}/training/{p}/{p}_{frame}.nii.gz", vol, (1, 1, 1))
            write_nifti(f"{src}/training/{p}/{p}_{frame}_gt.nii.gz",
                        (vol > 0.5).astype(np.uint8), (1, 1, 1))
    target = convert_acdc(src, dataset_id=27)
    imgs = os.listdir(target + "/imagesTr")
    assert len(imgs) == 4
    assert all(f.endswith("_0000.nii.gz") for f in imgs)


def test_cellseg_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from PIL import Image
    from nnuzoo_tpu.dataset_conversion.benchmark_datasets import \
        convert_neurips_cellseg
    from nnuzoo_tpu.utilities.io import maybe_mkdir

    src = str(tmp_path / "cellseg")
    maybe_mkdir(src + "/images")
    maybe_mkdir(src + "/labels")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32), dtype=np.uint8)
    inst = np.zeros((32, 32), dtype=np.uint16)
    inst[4:12, 4:12] = 1
    inst[20:28, 20:28] = 2
    Image.fromarray(img).save(src + "/images/cell_00001.png")
    Image.fromarray(inst).save(src + "/labels/cell_00001_label.png")
    target = convert_neurips_cellseg(src)
    assert os.path.isfile(target + "/imagesTr/cell_00001_0000.png")
    sem = np.asarray(Image.open(target + "/labelsTr/cell_00001.png"))
    assert set(np.unique(sem)) == {0, 1, 2}  # bg / interior / boundary


def test_dataset_clone(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from .helpers import make_synthetic_dataset
    from nnuzoo_tpu.dataset_conversion.acdc import clone_dataset_under_new_id
    make_synthetic_dataset(raw, num_cases=2)
    target = clone_dataset_under_new_id(999, 988, "dummy")
    assert os.path.isdir(target + "/imagesTr")
    assert os.path.isfile(target + "/dataset.json")


def test_mnms_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.more_datasets import convert_mnms
    from nnuzoo_tpu.imageio.nifti import read_nifti, write_nifti
    from nnuzoo_tpu.utilities.io import maybe_mkdir

    src = str(tmp_path / "mnms")
    rng = np.random.RandomState(0)
    with open(src + ".csv", "w"):
        pass
    maybe_mkdir(src)
    with open(src + "/info.csv", "w") as f:
        f.write("External code,ED,ES,Vendor\n")
        f.write("A0S9V9,0,7,A\nB1T2W3,2,9,B\n")
    for pat in ("A0S9V9", "B1T2W3"):
        d = f"{src}/Training/Labeled/{pat}"
        maybe_mkdir(d)
        cine = rng.rand(8, 8, 4, 12).astype(np.float32)  # x,y,z,t
        write_nifti(f"{d}/{pat}_sa.nii.gz", cine, (1.2, 1.2, 8.0))
        write_nifti(f"{d}/{pat}_sa_gt.nii.gz",
                    (cine > 0.5).astype(np.uint8), (1.2, 1.2, 8.0))
    target = convert_mnms(src, "info.csv", dataset_id=114)
    imgs = sorted(os.listdir(target + "/imagesTr"))
    assert imgs == ["A0S9V9_frame00_0000.nii.gz", "A0S9V9_frame07_0000.nii.gz",
                    "B1T2W3_frame02_0000.nii.gz", "B1T2W3_frame09_0000.nii.gz"]
    data, info = read_nifti(target + "/imagesTr/A0S9V9_frame07_0000.nii.gz")
    assert data.shape == (8, 8, 4)  # 3D frame extracted from the 4D cine
    assert np.allclose(info["spacing_xyz"], (1.2, 1.2, 8.0), atol=1e-5)
    labels = sorted(os.listdir(target + "/labelsTr"))
    assert len(labels) == 4 and all(not l.endswith("_0000.nii.gz")
                                    for l in labels)


def test_emidec_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.more_datasets import convert_emidec
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir

    src = str(tmp_path / "emidec")
    rng = np.random.RandomState(0)
    for pat in ("Case_P001", "Case_P002"):
        maybe_mkdir(f"{src}/{pat}/Images")
        maybe_mkdir(f"{src}/{pat}/Contours")
        vol = rng.rand(8, 8, 6).astype(np.float32)
        write_nifti(f"{src}/{pat}/Images/{pat}.nii.gz", vol, (1, 1, 1))
        write_nifti(f"{src}/{pat}/Contours/{pat}.nii.gz",
                    (vol * 4).astype(np.uint8), (1, 1, 1))
    target = convert_emidec(src, dataset_id=115)
    assert sorted(os.listdir(target + "/imagesTr")) == \
        ["Case_P001_0000.nii.gz", "Case_P002_0000.nii.gz"]
    dj = load_json(target + "/dataset.json")
    assert dj["labels"]["no_reflow"] == 4 and dj["numTraining"] == 2


def test_road_segmentation_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from PIL import Image
    from nnuzoo_tpu.dataset_conversion.more_datasets import \
        convert_road_segmentation
    from nnuzoo_tpu.utilities.io import maybe_mkdir

    src = str(tmp_path / "roads")
    maybe_mkdir(src + "/training/input")
    maybe_mkdir(src + "/training/output")
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :16] = 120                       # real imagery
    img[:, 16:] = 255                       # saturated white no-data region
    seg = np.zeros((32, 32), np.uint8)
    seg[10, :] = 255                        # road crossing both regions
    Image.fromarray(img).save(src + "/training/input/r1.png")
    Image.fromarray(seg).save(src + "/training/output/r1.png")
    target = convert_road_segmentation(src, dataset_id=120)
    out = np.asarray(Image.open(target + "/labelsTr/r1.png"))
    assert set(np.unique(out)) <= {0, 1}
    assert out[10, :16].all()               # road kept on imagery
    assert not out[10, 16:].any()           # road removed in white region


def test_brats21_converter_and_backmap(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.more_datasets import (
        convert_brats21, convert_labels_back_to_brats)
    from nnuzoo_tpu.imageio.nifti import read_nifti, write_nifti
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir

    src = str(tmp_path / "brats")
    c = "BraTS2021_00001"
    maybe_mkdir(f"{src}/{c}")
    rng = np.random.RandomState(0)
    for mod in ("t1", "t1ce", "t2", "flair"):
        write_nifti(f"{src}/{c}/{c}_{mod}.nii.gz",
                    rng.rand(8, 8, 6).astype(np.float32), (1, 1, 1))
    seg = rng.choice([0, 1, 2, 4], (8, 8, 6)).astype(np.uint8)
    write_nifti(f"{src}/{c}/{c}_seg.nii.gz", seg, (1, 1, 1))
    target = convert_brats21(src, dataset_id=137)
    assert len(os.listdir(target + "/imagesTr")) == 4
    out, _ = read_nifti(f"{target}/labelsTr/{c}.nii.gz")
    out = np.asarray(out)
    assert set(np.unique(out)) <= {0, 1, 2, 3}
    # remap roundtrip restores the original BraTS convention
    np.testing.assert_array_equal(convert_labels_back_to_brats(out), seg)
    dj = load_json(target + "/dataset.json")
    assert dj["labels"]["whole_tumor"] == [1, 2, 3]
    assert dj["regions_class_order"] == [1, 2, 3]


def test_kits23_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.more_datasets import convert_kits2023
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir

    src = str(tmp_path / "kits")
    rng = np.random.RandomState(0)
    for c in ("case_00000", "case_00001"):
        maybe_mkdir(f"{src}/{c}")
        vol = rng.rand(8, 8, 6).astype(np.float32)
        write_nifti(f"{src}/{c}/imaging.nii.gz", vol, (1, 1, 1))
        write_nifti(f"{src}/{c}/segmentation.nii.gz",
                    (vol * 3).astype(np.uint8), (1, 1, 1))
    target = convert_kits2023(src, dataset_id=220)
    dj = load_json(target + "/dataset.json")
    assert dj["labels"]["kidney"] == [1, 2, 3]
    assert dj["regions_class_order"] == [1, 3, 2]
    assert len(os.listdir(target + "/imagesTr")) == 2


def test_autopet_converter_patient_splits(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.more_datasets import convert_autopet
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir

    src = str(tmp_path / "autopet")
    rng = np.random.RandomState(0)
    for pat in [f"PETCT_{i:04d}" for i in range(6)]:
        for acq in ("acq0", "acq1")[: 1 + (int(pat[-1]) % 2)]:
            d = f"{src}/{pat}/{acq}"
            maybe_mkdir(d)
            vol = rng.rand(6, 6, 4).astype(np.float32)
            write_nifti(f"{d}/CTres.nii.gz", vol, (2, 2, 3))
            write_nifti(f"{d}/SUV.nii.gz", vol * 2, (2, 2, 3))
            write_nifti(f"{d}/SEG.nii.gz", (vol > 0.5).astype(np.uint8),
                        (2, 2, 3))
    target = convert_autopet(src, dataset_id=221)
    imgs = os.listdir(target + "/imagesTr")
    assert any(f.endswith("_0001.nii.gz") for f in imgs)  # SUV channel
    splits = load_json(str(tmp_path / "pp" /
                           "Dataset221_AutoPETII_2023" / "splits_final.json"))
    assert len(splits) == 5
    for s in splits:
        # patient-level stratification: no identifier prefix in both sets
        train_pats = {i.split("_acq")[0] for i in s["train"]}
        val_pats = {i.split("_acq")[0] for i in s["val"]}
        assert not (train_pats & val_pats)


def test_fluo_c3dh_converter(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from PIL import Image
    from nnuzoo_tpu.dataset_conversion.more_datasets import \
        convert_fluo_c3dh_a549_sim
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir

    src = str(tmp_path / "fluo")
    rng = np.random.RandomState(0)
    for seq in ("01", "02"):
        maybe_mkdir(f"{src}/{seq}")
        maybe_mkdir(f"{src}/{seq}_GT/SEG")
        for t in range(2):
            # multi-page 3D tif
            frames = [Image.fromarray(
                rng.randint(0, 255, (12, 14), dtype=np.uint8))
                for _ in range(5)]
            frames[0].save(f"{src}/{seq}/t{t:03d}.tif",
                           save_all=True, append_images=frames[1:])
            segs = [Image.fromarray((rng.rand(12, 14) > 0.5).astype(np.uint8))
                    for _ in range(5)]
            segs[0].save(f"{src}/{seq}_GT/SEG/man_seg{t:03d}.tif",
                         save_all=True, append_images=segs[1:])
    target = convert_fluo_c3dh_a549_sim(src, dataset_id=73)
    assert os.path.isfile(target + "/imagesTr/01_image_000_0000.tif")
    sidecar = load_json(target + "/imagesTr/01_image_000.json")
    assert sidecar["spacing"] == [1, 0.126, 0.126]
    splits = load_json(str(tmp_path / "pp" /
                           "Dataset073_Fluo_C3DH_A549_SIM" /
                           "splits_final.json"))
    assert len(splits) == 2
    assert all(c.startswith("01_") for c in splits[0]["train"])


def test_convert_old_nnunet_dataset(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.more_datasets import \
        convert_old_nnunet_dataset
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir, save_json

    src = str(tmp_path / "Task04_Hippocampus")
    maybe_mkdir(src + "/imagesTr")
    maybe_mkdir(src + "/labelsTr")
    rng = np.random.RandomState(0)
    vol = rng.rand(8, 8, 6).astype(np.float32)
    write_nifti(src + "/imagesTr/hippocampus_001_0000.nii.gz", vol, (1, 1, 1))
    write_nifti(src + "/labelsTr/hippocampus_001.nii.gz",
                (vol > 0.5).astype(np.uint8), (1, 1, 1))
    save_json({"modality": {"0": "MRI"},
               "labels": {"0": "background", "1": "anterior"},
               "tensorImageSize": "3D", "numTest": 0,
               "training": [], "test": []}, src + "/dataset.json")
    target = convert_old_nnunet_dataset(src, "Dataset004_Hippocampus")
    dj = load_json(target + "/dataset.json")
    assert dj["channel_names"] == {"0": "MRI"}
    assert dj["labels"] == {"background": 0, "anterior": 1}
    assert dj["file_ending"] == ".nii.gz"
    assert "training" not in dj
    # refuses to overwrite
    with pytest.raises(RuntimeError):
        convert_old_nnunet_dataset(src, "Dataset004_Hippocampus")


def test_move_plans_between_datasets(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.planning.plans_editing import move_plans_between_datasets
    from nnuzoo_tpu.utilities.io import load_json, maybe_mkdir, save_json

    # source: preprocessed plans
    maybe_mkdir(str(tmp_path / "pp" / "Dataset001_Src"))
    save_json({"dataset_name": "Dataset001_Src", "plans_name": "nnUNetPlans",
               "image_reader_writer": "NiftiIO",
               "configurations": {"2d": {
                   "data_identifier": "nnUNetPlans_2d", "patch_size": [8, 8],
               }}},
              str(tmp_path / "pp" / "Dataset001_Src" /
                  "nnUNetPlans.json"))
    # target: raw dataset with a png layout -> reader/writer must switch
    tgt_raw = str(tmp_path / "raw" / "Dataset002_Tgt")
    maybe_mkdir(tgt_raw + "/imagesTr")
    maybe_mkdir(tgt_raw + "/labelsTr")
    from PIL import Image
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        tgt_raw + "/imagesTr/case_0000.png")
    save_json({"channel_names": {"0": "x"}, "labels": {"background": 0},
               "numTraining": 1, "file_ending": ".png"},
              tgt_raw + "/dataset.json")
    maybe_mkdir(str(tmp_path / "pp" / "Dataset002_Tgt"))

    out = move_plans_between_datasets("Dataset001_Src", "Dataset002_Tgt",
                                      "nnUNetPlans", "nnUNetPlansFrom1")
    plans = load_json(out)
    assert plans["dataset_name"] == "Dataset002_Tgt"
    assert plans["plans_name"] == "nnUNetPlansFrom1"
    assert plans["configurations"]["2d"]["data_identifier"] == \
        "nnUNetPlansFrom1_2d"
    assert plans["image_reader_writer"] == "NaturalImage2DIO"
