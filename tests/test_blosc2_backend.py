"""blosc2 (.b2nd) dataset backend (reference `nnunet_dataset.py:127-311`).

The blosc2 package is not installed in this environment, so these tests run
against a minimal stub registered in sys.modules that stores arrays as .npy
under the requested urlpath — exercising the backend dispatch, the dataset
class, the cache-aware chunk/block math, and a full .b2nd training run.
"""

import os
import sys
import types
from dataclasses import replace

import numpy as np
import pytest

from .helpers import set_paths


@pytest.fixture()
def blosc2_stub(monkeypatch):
    stub = types.ModuleType("blosc2")
    stub.Codec = types.SimpleNamespace(ZSTD="zstd")
    stub.set_nthreads = lambda n: None

    def asarray(arr, urlpath=None, chunks=None, blocks=None, cparams=None):
        np.save(urlpath + ".npy", np.asarray(arr))
        os.replace(urlpath + ".npy", urlpath)

    def open_(urlpath=None, mode="r", dparams=None, mmap_mode=None):
        return np.load(urlpath, mmap_mode=mmap_mode,
                       allow_pickle=False)

    stub.asarray = asarray
    stub.open = open_
    monkeypatch.setitem(sys.modules, "blosc2", stub)
    return stub


def test_comp_blosc2_params():
    """Chunk/block sizing matches the reference constraints: block fits 80% of
    32 KiB L1, chunk grows by whole blocks, bounded by image and ~1.5x patch."""
    from nnuzoo_tpu.data.dataset import DatasetBlosc2
    image_size = (1, 128, 256, 256)
    patch_size = (96, 160, 160)
    blocks, chunks = DatasetBlosc2.comp_blosc2_params(image_size, patch_size)
    assert len(blocks) == len(chunks) == 4
    assert np.prod(blocks) * 4 <= 32768 * 0.8          # block fits L1 budget
    assert all(b <= i for b, i in zip(blocks, image_size))
    assert all(c <= i for c, i in zip(chunks, image_size))
    assert all(c >= b for c, b in zip(chunks, blocks))  # chunks tile blocks
    # 2D patch: chunk must not extend along the leading spatial axis
    blocks2, chunks2 = DatasetBlosc2.comp_blosc2_params(
        (2, 1, 512, 512), (256, 256))
    assert blocks2[0] == 2 and blocks2[1] == 1
    assert chunks2[1] == 1


def test_dataset_blosc2_roundtrip(tmp_path, blosc2_stub):
    from nnuzoo_tpu.data.dataset import (DatasetBlosc2, DatasetNumpy,
                                         infer_dataset_class)
    rng = np.random.RandomState(0)
    folder = str(tmp_path / "pp")
    os.makedirs(folder)
    data = rng.rand(1, 8, 10, 12).astype(np.float32)
    seg = (data > 0.5).astype(np.int16)
    DatasetBlosc2.save_case(data, seg, {"spacing": [1, 1, 1]},
                            os.path.join(folder, "case_000"),
                            chunks=(1, 8, 8, 8), blocks=(1, 4, 4, 4))
    assert infer_dataset_class(folder) is DatasetBlosc2
    ds = DatasetBlosc2(folder)
    assert ds.identifiers == ["case_000"]
    d, s, sp, props = ds.load_case("case_000")
    np.testing.assert_allclose(np.asarray(d), data)
    np.testing.assert_array_equal(np.asarray(s), seg)
    assert sp is None and props["spacing"] == [1, 1, 1]
    # numpy folders still dispatch to the numpy backend
    folder2 = str(tmp_path / "pp_npz")
    os.makedirs(folder2)
    DatasetNumpy.save_case(data, seg, {}, os.path.join(folder2, "case_000"))
    assert infer_dataset_class(folder2) is DatasetNumpy


def test_b2nd_end_to_end_training(tmp_path, blosc2_stub):
    """Full training epoch reading .b2nd cases through the inferred backend."""
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import join, load_json, maybe_mkdir, save_json

    rng = np.random.RandomState(0)
    root = join(raw, "Dataset999_Synth")
    maybe_mkdir(join(root, "imagesTr"))
    maybe_mkdir(join(root, "labelsTr"))
    for i in range(4):
        vol = rng.rand(40, 40, 1).astype(np.float32) * 60
        write_nifti(join(root, "imagesTr", f"c{i:02d}_0000.nii.gz"), vol, (1, 1, 1))
        write_nifti(join(root, "labelsTr", f"c{i:02d}.nii.gz"),
                    (vol > 40).astype(np.uint8), (1, 1, 1))
    save_json({"channel_names": {"0": "CT"},
               "labels": {"background": 0, "organ": 1},
               "numTraining": 4, "file_ending": ".nii.gz"},
              join(root, "dataset.json"))

    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["2d"]["patch_size"] = [32, 32]
    plans["configurations"]["2d"]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess([999], configurations=("2d",), num_processes=(1,))

    # convert the preprocessed folder to .b2nd and remove the npz files
    from nnuzoo_tpu.data.dataset import DatasetBlosc2, DatasetNumpy
    folder = join(pp, "Dataset999_Synth", "nnUNetPlans_2d")
    ds = DatasetNumpy(folder)
    for ident in ds.identifiers:
        d, s, _, props = ds.load_case(ident)
        blocks, chunks = DatasetBlosc2.comp_blosc2_params(
            np.asarray(d).shape, (32, 32))
        DatasetBlosc2.save_case(np.asarray(d), np.asarray(s), props,
                                join(folder, ident),
                                chunks=chunks, blocks=blocks)
    for f in os.listdir(folder):
        if f.endswith(".npz") or f.endswith(".npy"):
            os.remove(join(folder, f))

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "2d", fold=0, dataset_json=dataset_json)
    assert trainer.dataset_class is DatasetBlosc2
    trainer.config = replace(trainer.config, num_epochs=1,
                             num_iterations_per_epoch=4,
                             num_val_iterations_per_epoch=2)
    trainer.run_training()
    losses = trainer.logger.my_fantastic_logging["train_losses"]
    assert np.isfinite(losses).all()
