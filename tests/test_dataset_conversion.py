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
