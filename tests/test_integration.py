"""Integration tests over the four labeling regimes via the CLI entry points —
the suite the reference describes but shipped broken
(`nnunetv2/tests/integration_tests/readme.md`). Tiny epochs, full pipeline:
generate -> plan_and_preprocess -> train (+val) -> predict -> evaluate."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import set_paths


def _shrink_plans(pp, dataset_name):
    from nnuzoo_tpu.utilities.io import join, load_json, save_json
    f = join(pp, dataset_name, "nnUNetPlans.json")
    plans = load_json(f)
    for cfg in plans["configurations"].values():
        if "patch_size" in cfg:
            cfg["patch_size"] = [16] * len(cfg["patch_size"])
            cfg["batch_size"] = 2
    save_json(plans, f, sort_keys=False)


@pytest.mark.parametrize("regime", ["labels", "regions", "regions_ignore"])
def test_regime_end_to_end(tmp_path, regime, monkeypatch):
    """All four reference regimes flow end-to-end: 999 labels / 997 regions /
    996 regions+ignore here, 998 ignore in test_ignore_label_regime_trains
    (reference regime matrix: `nnunetv2/tests/integration_tests/readme.md:8-22`)."""
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.integration_test_datasets import (
        create_dataset_996, create_dataset_997, create_dataset_999)
    from nnuzoo_tpu.cli.entry_points import (evaluate_folder_entry,
                                             plan_and_preprocess_entry,
                                             predict_entry)

    if regime == "labels":
        create_dataset_999(num_cases=5)
        ds_id, ds_name = "999", "Dataset999_IntegrationTest"
    elif regime == "regions":
        create_dataset_997(num_cases=5)
        ds_id, ds_name = "997", "Dataset997_IntegrationTestRegions"
    else:
        create_dataset_996(num_cases=5)
        ds_id, ds_name = "996", "Dataset996_IntegrationTestRegionsIgnore"

    plan_and_preprocess_entry(["-d", ds_id, "-npfp", "1", "-np", "1",
                               "--verify_dataset_integrity",
                               "-c", "3d_fullres"])
    _shrink_plans(pp, ds_name)
    # re-preprocess with the shrunk plans is unnecessary (patch size only affects
    # training); train 1 tiny epoch + final validation through the entry point
    import nnuzoo_tpu.training.trainer_config as tc
    base = tc.TRAINER_CONFIGS["nnUNetTrainer"]
    monkeypatch.setitem(
        tc.TRAINER_CONFIGS, "nnUNetTrainer",
        replace(base, num_epochs=1, num_iterations_per_epoch=2,
                num_val_iterations_per_epoch=1))

    from nnuzoo_tpu.cli.entry_points import train_entry
    train_entry([ds_id, "3d_fullres", "0"])

    model_dir = os.path.join(res, ds_name, "nnUNetTrainer__nnUNetPlans__3d_fullres")
    assert os.path.isfile(os.path.join(model_dir, "fold_0",
                                       "checkpoint_final.pth"))
    # final validation produced a summary
    val_summary = os.path.join(model_dir, "fold_0", "validation", "summary.json")
    assert os.path.isfile(val_summary)

    # predict the test images via the CLI and evaluate
    out = os.path.join(str(tmp_path), "preds")
    predict_entry(["-i", os.path.join(raw, ds_name, "imagesTs"), "-o", out,
                   "-d", ds_id, "-c", "3d_fullres", "-f", "0",
                   "-chk", "checkpoint_final.pth"])
    preds = [f for f in os.listdir(out) if f.endswith(".nii.gz")]
    assert len(preds) == 2
    summary = os.path.join(str(tmp_path), "test_summary.json")
    evaluate_folder_entry([os.path.join(raw, ds_name, "labelsTs"), out,
                           "-djfile", os.path.join(model_dir, "dataset.json"),
                           "-pfile", os.path.join(model_dir, "plans.json"),
                           "-o", summary, "-np", "1"])
    assert os.path.isfile(summary)


def test_cascade_through_cli(tmp_path, monkeypatch):
    """3d_lowres -> 3d_cascade_fullres driven entirely through the CLI entry
    points (the reference integration flow: plan --no_pp, inject lowres+cascade
    configs via plans editing, preprocess, train both stages, predict the
    cascade with -prev_stage_predictions)."""
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.integration_test_datasets import \
        create_dataset_999
    from nnuzoo_tpu.planning.plans_editing import add_lowres_and_cascade
    from nnuzoo_tpu.cli.entry_points import (plan_experiment_entry,
                                             extract_fingerprint_entry,
                                             predict_entry, preprocess_entry,
                                             train_entry)
    from nnuzoo_tpu.utilities.io import join, load_json, save_json

    create_dataset_999(num_cases=5)
    ds_name = "Dataset999_IntegrationTest"
    extract_fingerprint_entry(["-d", "999", "-np", "1"])
    plan_experiment_entry(["-d", "999"])
    add_lowres_and_cascade(999)  # reference: add_lowres_and_cascade.py script
    plans_file = join(pp, ds_name, "nnUNetPlans.json")
    plans = load_json(plans_file)
    assert "3d_cascade_fullres" in plans["configurations"]
    for name in ("3d_fullres", "3d_lowres"):
        plans["configurations"][name]["patch_size"] = [16, 16, 16]
        plans["configurations"][name]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess_entry(["-d", "999", "-c", "3d_fullres", "3d_lowres",
                      "-np", "1", "1"])

    import nnuzoo_tpu.training.trainer_config as tc
    base = tc.TRAINER_CONFIGS["nnUNetTrainer"]
    monkeypatch.setitem(
        tc.TRAINER_CONFIGS, "nnUNetTrainer",
        replace(base, num_epochs=1, num_iterations_per_epoch=2,
                num_val_iterations_per_epoch=1))

    # stage 1: lowres with final validation (exports next-stage predictions)
    train_entry(["999", "3d_lowres", "0"])
    next_stage_dir = join(pp, ds_name, "predicted_next_stage",
                          "3d_cascade_fullres")
    assert os.path.isdir(next_stage_dir)

    # cascade training needs prev-stage predictions for ALL cases; synthesize
    # the non-val ones (the real flow validates folds 0-4)
    from nnuzoo_tpu.data.dataset import DatasetNumpy
    ds = DatasetNumpy(join(pp, ds_name, "nnUNetPlans_3d_fullres"))
    for k in ds.identifiers:
        f = join(next_stage_dir, k + ".npz")
        if not os.path.isfile(f):
            seg_shape = ds.load_case(k)[0].shape[1:]
            np.savez_compressed(f, seg=np.zeros(seg_shape, dtype=np.uint8))

    # stage 2: cascade train through the CLI
    train_entry(["999", "3d_cascade_fullres", "0", "--skip_val"])
    cas_dir = join(res, ds_name, "nnUNetTrainer__nnUNetPlans__3d_cascade_fullres")
    assert os.path.isfile(join(cas_dir, "fold_0", "checkpoint_final.pth"))

    # inference: lowres predictions first, then the cascade consumes them
    lowres_out = join(str(tmp_path), "preds_lowres")
    predict_entry(["-i", join(raw, ds_name, "imagesTs"), "-o", lowres_out,
                   "-d", "999", "-c", "3d_lowres", "-f", "0",
                   "-chk", "checkpoint_final.pth"])
    cascade_out = join(str(tmp_path), "preds_cascade")
    predict_entry(["-i", join(raw, ds_name, "imagesTs"), "-o", cascade_out,
                   "-d", "999", "-c", "3d_cascade_fullres", "-f", "0",
                   "-chk", "checkpoint_final.pth",
                   "-prev_stage_predictions", lowres_out])
    preds = [f for f in os.listdir(cascade_out) if f.endswith(".nii.gz")]
    assert len(preds) == 2


def test_ignore_label_regime_trains(tmp_path, monkeypatch):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.dataset_conversion.integration_test_datasets import \
        create_dataset_998
    from nnuzoo_tpu.cli.entry_points import plan_and_preprocess_entry
    create_dataset_998(num_cases=4)
    plan_and_preprocess_entry(["-d", "998", "-npfp", "1", "-np", "1",
                               "-c", "3d_fullres"])
    _shrink_plans(pp, "Dataset998_IntegrationTestIgnore")

    import nnuzoo_tpu.training.trainer_config as tc
    base = tc.TRAINER_CONFIGS["nnUNetTrainer"]
    monkeypatch.setitem(
        tc.TRAINER_CONFIGS, "nnUNetTrainer",
        replace(base, num_epochs=1, num_iterations_per_epoch=2,
                num_val_iterations_per_epoch=1))
    from nnuzoo_tpu.cli.entry_points import train_entry
    train_entry(["998", "3d_fullres", "0", "--skip_val"])
    model_dir = os.path.join(res, "Dataset998_IntegrationTestIgnore",
                             "nnUNetTrainer__nnUNetPlans__3d_fullres")
    assert os.path.isfile(os.path.join(model_dir, "fold_0",
                                       "checkpoint_final.pth"))
