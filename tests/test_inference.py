"""Full-loop test: train tiny model -> sliding-window predict from raw files ->
evaluate -> summary.json."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import make_synthetic_dataset, set_paths


class TestSlidingWindowMath:
    def test_steps(self):
        from nnuzoo_tpu.inference.sliding_window import \
            compute_steps_for_sliding_window
        steps = compute_steps_for_sliding_window((110,), (64,), 0.5)
        assert steps == [[0, 23, 46]]
        steps = compute_steps_for_sliding_window((64,), (64,), 0.5)
        assert steps == [[0]]

    def test_gaussian(self):
        from nnuzoo_tpu.inference.sliding_window import compute_gaussian
        g = compute_gaussian((32, 32))
        assert g.shape == (32, 32)
        assert g.max() == pytest.approx(10.0)
        assert (g > 0).all()
        assert g[16, 16] == g.max()

    def test_pad_and_revert(self, rng):
        from nnuzoo_tpu.inference.sliding_window import pad_nd_image
        img = rng.rand(2, 10, 12).astype(np.float32)
        padded, slicer = pad_nd_image(img, (16, 16))
        assert padded.shape == (2, 16, 16)
        assert np.array_equal(padded[slicer], img)

    def test_slicers_2d_on_3d(self):
        from nnuzoo_tpu.inference.sliding_window import get_sliding_window_slicers
        slicers = get_sliding_window_slicers((4, 32, 32), (32, 32), 0.5)
        assert len(slicers) == 4  # one per slice


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer")
    raw, pp, res = set_paths(tmp)
    make_synthetic_dataset(raw, num_cases=6, shape=(24, 28, 20),
                           labels={"background": 0, "organ": 1})
    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    preprocess([999], num_processes=(1, 1, 1))

    from nnuzoo_tpu.training.trainer import Trainer
    from nnuzoo_tpu.utilities.io import join, load_json
    plans = load_json(join(pp, "Dataset999_Synth", "nnUNetPlans.json"))
    plans["configurations"]["3d_fullres"]["batch_size"] = 2
    plans["configurations"]["3d_fullres"]["patch_size"] = [16, 16, 16]
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "3d_fullres", fold=0, dataset_json=dataset_json)
    trainer.config = replace(trainer.config, num_epochs=3,
                             num_iterations_per_epoch=8,
                             num_val_iterations_per_epoch=1, initial_lr=5e-3)
    trainer.run_training()
    return raw, pp, res, trainer.output_folder_base


def test_predict_and_evaluate(trained_model):
    raw, pp, res, model_folder = trained_model
    from nnuzoo_tpu.inference.predictor import Predictor
    from nnuzoo_tpu.utilities.io import join, load_json

    pred = Predictor(tile_step_size=0.5, use_gaussian=True, use_mirroring=True,
                     tile_batch_size=2)
    pred.initialize_from_trained_model_folder(model_folder, use_folds=[0])
    assert pred.trainer_name == "nnUNetTrainer"

    in_folder = join(raw, "Dataset999_Synth", "imagesTr")
    out_folder = join(res, "predictions")
    pred.predict_from_files(in_folder, out_folder)

    import os
    preds = [f for f in os.listdir(out_folder) if f.endswith(".nii.gz")]
    assert len(preds) == 6
    assert os.path.isfile(join(out_folder, "predict_from_raw_data_args.json"))

    # prediction has the ORIGINAL geometry
    from nnuzoo_tpu.imageio.nifti import NiftiIO
    seg, props = NiftiIO().read_seg(join(out_folder, "case_000.nii.gz"))
    assert seg.shape == (1, 20, 28, 24)  # (1, z, y, x) of on-disk (24, 28, 20)

    # evaluate
    from nnuzoo_tpu.evaluation.metrics import compute_metrics_on_folder, \
        load_summary_json
    summary_file = join(res, "summary.json")
    result = compute_metrics_on_folder(
        join(raw, "Dataset999_Synth", "labelsTr"), out_folder, summary_file,
        NiftiIO(), ".nii.gz", [1], num_processes=1)
    assert os.path.isfile(summary_file)
    assert "Dice" in result["foreground_mean"]
    dice = result["foreground_mean"]["Dice"]
    assert 0.0 <= dice <= 1.0
    back = load_summary_json(summary_file)
    assert back["mean"][1]["Dice"] == pytest.approx(result["mean"][1]["Dice"])

    # overwrite=False skips everything (should not crash, not recompute)
    pred.predict_from_files(in_folder, out_folder, overwrite=False)

    # num_parts striping covers disjoint subsets
    out2 = join(res, "pred_parts")
    pred.predict_from_files(in_folder, out2, num_parts=3, part_id=0)
    part0 = set(f for f in os.listdir(out2) if f.endswith(".nii.gz"))
    assert len(part0) == 2


def test_device_accum_matches_host(trained_model):
    """Device-side scatter-add accumulation == host numpy accumulation, for a
    3D patch and a 2D-config-on-3D-volume tiling."""
    import os
    from nnuzoo_tpu.inference.predictor import Predictor

    raw, pp, res, model_folder = trained_model
    rng = np.random.RandomState(0)

    pred = Predictor(tile_step_size=0.5, use_gaussian=True,
                     use_mirroring=False, tile_batch_size=2)
    pred.initialize_from_trained_model_folder(model_folder, use_folds=[0])

    # odd, non-bucket-aligned spatial shape; more tiles than one batch
    vol = rng.rand(1, 21, 27, 19).astype(np.float32)
    dev = pred.predict_sliding_window_return_logits(vol)
    os.environ["NNUZOO_HOST_ACCUM"] = "1"
    try:
        host = pred.predict_sliding_window_return_logits(vol)
    finally:
        os.environ.pop("NNUZOO_HOST_ACCUM")
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, rtol=1e-4, atol=1e-5)
