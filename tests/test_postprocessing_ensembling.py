import os

import numpy as np
import pytest

from nnuzoo_tpu.postprocessing.connected_components import (
    apply_postprocessing, remove_all_but_largest_component,
    remove_all_but_largest_component_from_segmentation)


class TestConnectedComponents:
    def test_largest_kept(self):
        mask = np.zeros((10, 10), dtype=bool)
        mask[1:5, 1:5] = True   # 16 px
        mask[7:9, 7:9] = True   # 4 px
        out = remove_all_but_largest_component(mask)
        assert out[2, 2] and not out[8, 8]

    def test_per_class(self):
        seg = np.zeros((10, 10), dtype=np.uint8)
        seg[1:5, 1:5] = 1
        seg[7:9, 7:9] = 1     # small comp of class 1
        seg[6, 1] = 2         # class 2 untouched
        out = remove_all_but_largest_component_from_segmentation(seg, 1)
        assert out[2, 2] == 1 and out[8, 8] == 0 and out[6, 1] == 2

    def test_region_union(self):
        seg = np.zeros((10, 10), dtype=np.uint8)
        seg[1:5, 1:5] = 1
        seg[3:5, 3:5] = 2     # overlapping region (1,2) forms one component
        seg[8, 8] = 2
        out = remove_all_but_largest_component_from_segmentation(seg, (1, 2))
        assert out[8, 8] == 0 and out[3, 3] == 2

    def test_apply_chain(self):
        seg = np.zeros((6, 6), dtype=np.uint8)
        seg[0, 0] = 1
        seg[3:6, 3:6] = 1
        out = apply_postprocessing(
            seg, [remove_all_but_largest_component_from_segmentation],
            [{"labels_or_regions": 1}])
        assert out[0, 0] == 0 and out[4, 4] == 1


def test_ensemble_folders(tmp_path):
    from nnuzoo_tpu.ensembling.ensemble import average_probabilities, \
        ensemble_folders
    from nnuzoo_tpu.utilities.io import save_pickle, save_json, maybe_mkdir

    # two prediction folders with probability npzs + properties
    rng = np.random.RandomState(0)
    shape = (2, 8, 8, 8)  # (c, z, y, x) probabilities
    plans = {"dataset_name": "D", "plans_name": "p", "transpose_forward": [0, 1, 2],
             "transpose_backward": [0, 1, 2], "image_reader_writer": "NiftiIO",
             "configurations": {}}
    dj = {"labels": {"background": 0, "fg": 1}, "file_ending": ".nii.gz",
          "channel_names": {"0": "T"}}
    for i, f in enumerate(["a", "b"]):
        folder = tmp_path / f
        maybe_mkdir(str(folder))
        probs = rng.rand(*shape).astype(np.float32)
        probs /= probs.sum(0, keepdims=True)
        np.savez_compressed(str(folder / "case1.npz"), probabilities=probs)
        save_pickle({"spacing": [1.0, 1.0, 1.0]}, str(folder / "case1.pkl"))
    out = tmp_path / "ens"
    ensemble_folders([str(tmp_path / "a"), str(tmp_path / "b")], str(out),
                     num_processes=1, dataset_json_file_or_dict=dj,
                     plans_json_file_or_dict=plans)
    assert os.path.isfile(str(out / "case1.nii.gz"))

    pa = np.load(str(tmp_path / "a" / "case1.npz"))["probabilities"]
    pb = np.load(str(tmp_path / "b" / "case1.npz"))["probabilities"]
    avg = average_probabilities([str(tmp_path / "a" / "case1.npz"),
                                 str(tmp_path / "b" / "case1.npz")])
    assert np.allclose(avg, (pa + pb) / 2)


def test_model_export_import(tmp_path, monkeypatch):
    import os
    from nnuzoo_tpu.model_sharing.model_export import (export_pretrained_model,
                                                       install_model_from_zip_file)
    from nnuzoo_tpu.utilities.io import maybe_mkdir, save_json
    res = tmp_path / "results"
    monkeypatch.setenv("nnUNet_results", str(res))
    model_dir = res / "Dataset999_X" / "nnUNetTrainer__nnUNetPlans__2d"
    fold = model_dir / "fold_0"
    maybe_mkdir(str(fold))
    save_json({"x": 1}, str(model_dir / "plans.json"))
    save_json({"x": 1}, str(model_dir / "dataset.json"))
    open(str(fold / "checkpoint_final.pth"), "wb").write(b"ckpt")
    zip_path = str(tmp_path / "model.zip")
    export_pretrained_model("Dataset999_X", zip_path, configurations=("2d",),
                            folds=(0,), strict=False)
    assert os.path.isfile(zip_path)

    res2 = tmp_path / "results2"
    monkeypatch.setenv("nnUNet_results", str(res2))
    maybe_mkdir(str(res2))
    install_model_from_zip_file(zip_path)
    assert os.path.isfile(str(res2 / "Dataset999_X" /
                              "nnUNetTrainer__nnUNetPlans__2d" / "fold_0" /
                              "checkpoint_final.pth"))


def test_cell_metric(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from compute_cell_metric import eval_tp_fp_fn, intersection_over_union

    gt = np.zeros((20, 20), dtype=np.int64)
    gt[2:6, 2:6] = 1
    gt[10:14, 10:14] = 2
    pred = np.zeros((20, 20), dtype=np.int64)
    pred[2:6, 2:6] = 1       # perfect match
    pred[15:18, 15:18] = 2   # false positive, gt instance 2 missed
    tp, fp, fn = eval_tp_fp_fn(gt, pred, threshold=0.5)
    assert (tp, fp, fn) == (1, 1, 1)
    iou = intersection_over_union(gt, pred)
    assert iou[1, 1] == pytest.approx(1.0)


def test_overlay_plot(tmp_path, rng):
    from nnuzoo_tpu.utilities.overlay_plots import generate_overlay
    img = rng.rand(32, 32)
    seg = np.zeros((32, 32), dtype=np.uint8)
    seg[8:16, 8:16] = 1
    overlay = generate_overlay(img, seg)
    assert overlay.shape == (32, 32, 3) and overlay.dtype == np.uint8
    # overlaid region differs from the grayscale elsewhere
    assert not np.allclose(overlay[10, 10], overlay[2, 2])


def test_load_pretrained_weights(tmp_path, rng):
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from flax import serialization
    from nnuzoo_tpu.models.dynamic_unet import PlainConvUNet
    from nnuzoo_tpu.run.load_pretrained_weights import load_pretrained_weights
    from nnuzoo_tpu.utilities.io import save_pickle

    kw = {"n_stages": 2, "features_per_stage": [4, 8],
          "kernel_sizes": [[3, 3]] * 2, "strides": [[1, 1], [2, 2]],
          "n_conv_per_stage": [1, 1], "n_conv_per_stage_decoder": [1]}
    m1 = PlainConvUNet(arch_kwargs=kw, num_classes=2)
    m2 = PlainConvUNet(arch_kwargs=kw, num_classes=5)  # different head
    x = jnp.zeros((1, 16, 16, 1))
    p1 = m1.init(jax.random.PRNGKey(0), x)
    p2 = m2.init(jax.random.PRNGKey(1), x)
    ckpt = {"network_weights": serialization.to_bytes(
        jax.tree.map(np.asarray, p1))}
    save_pickle(ckpt, str(tmp_path / "ckpt.pth"))
    new_params, n = load_pretrained_weights(p2, str(tmp_path / "ckpt.pth"))
    assert n > 0
    # encoder conv transferred, seg head kept from target
    import jax.tree_util as jtu
    flat1 = dict(jtu.tree_flatten_with_path(p1)[0])
    flatn = dict(jtu.tree_flatten_with_path(new_params)[0])
    flat2 = dict(jtu.tree_flatten_with_path(p2)[0])
    for path, v in flatn.items():
        key = "/".join(str(p) for p in path)
        if "seg" in key:
            assert np.allclose(v, flat2[path])
