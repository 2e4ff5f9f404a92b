"""target_type=translation: regression training path (reference trainer hooks
`nnUNetTrainer.py:114,1491-1516`, `evaluate_predictions.py:147-268`)."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import set_paths


def test_translation_training(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import join, load_json, maybe_mkdir, save_json

    rng = np.random.RandomState(0)
    root = join(raw, "Dataset999_Synth")
    maybe_mkdir(join(root, "imagesTr"))
    maybe_mkdir(join(root, "labelsTr"))
    for i in range(4):
        vol = rng.rand(24, 24, 12).astype(np.float32) * 50 + 10
        vol[:2] = 0
        target = (vol * 2 + 5).astype(np.float32)  # learnable mapping
        write_nifti(join(root, "imagesTr", f"c{i:02d}_0000.nii.gz"), vol, (1, 1, 1))
        write_nifti(join(root, "labelsTr", f"c{i:02d}.nii.gz"), target, (1, 1, 1))
    save_json({"channel_names": {"0": "CT"},
               "labels": {"background": 0, "out": 1},
               "numTraining": 4, "file_ending": ".nii.gz",
               "target_type": "translation"}, join(root, "dataset.json"))

    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["3d_fullres"]["patch_size"] = [16, 16, 16]
    plans["configurations"]["3d_fullres"]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess([999], configurations=("3d_fullres",), num_processes=(1,))

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "3d_fullres", fold=0, dataset_json=dataset_json)
    assert trainer.target_type == "translation"
    assert trainer.label_manager.num_segmentation_heads == 1  # heads - 1
    trainer.config = replace(trainer.config, num_epochs=2,
                             num_iterations_per_epoch=4,
                             num_val_iterations_per_epoch=2)
    trainer.run_training()
    losses = trainer.logger.my_fantastic_logging["train_losses"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # MSE decreases on the linear mapping
