"""target_type=ssl: MAE pretraining loop (reference trainer hooks
`nnUNetTrainer.py:114,1491-1516`, `data_loader.py:188-236`,
`u2net_multi.py:560-632` forward_mae path)."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import set_paths


def test_ssl_mae_training(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import join, load_json, maybe_mkdir, save_json

    rng = np.random.RandomState(0)
    root = join(raw, "Dataset999_Synth")
    maybe_mkdir(join(root, "imagesTr"))
    maybe_mkdir(join(root, "labelsTr"))
    for i in range(4):
        vol = rng.rand(40, 40, 1).astype(np.float32) * 50 + 10
        seg = (vol > 35).astype(np.uint8)  # labels exist but are unused for MAE
        write_nifti(join(root, "imagesTr", f"c{i:02d}_0000.nii.gz"), vol, (1, 1, 1))
        write_nifti(join(root, "labelsTr", f"c{i:02d}.nii.gz"), seg, (1, 1, 1))
    save_json({"channel_names": {"0": "CT"},
               "labels": {"background": 0, "organ": 1},
               "numTraining": 4, "file_ending": ".nii.gz",
               "target_type": "ssl"}, join(root, "dataset.json"))

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

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "2d", fold=0, dataset_json=dataset_json,
                      trainer_name="nnUNetTrainerU2NetMultiP")
    assert trainer.target_type == "ssl"
    trainer.config = replace(trainer.config, num_epochs=2,
                             num_iterations_per_epoch=4,
                             num_val_iterations_per_epoch=2)
    trainer.run_training()
    losses = trainer.logger.my_fantastic_logging["train_losses"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # reconstruction improves

    # checkpoint round-trips and final validation is a clean no-op
    assert os.path.isfile(join(trainer.output_folder, "checkpoint_final.pth"))
    t2 = Trainer(plans, "2d", fold=0, dataset_json=dataset_json,
                 trainer_name="nnUNetTrainerU2NetMultiP")
    t2.config = replace(t2.config, num_epochs=2, num_iterations_per_epoch=4,
                        num_val_iterations_per_epoch=2)
    t2.load_checkpoint(join(trainer.output_folder, "checkpoint_final.pth"))
    assert t2.current_epoch == 2
    assert t2.perform_actual_validation() == {}
