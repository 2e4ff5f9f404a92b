"""Flagship-through-the-Trainer test: M2NetP selected by trainer name, one tiny
epoch on the 8-device CPU mesh with the x2net deep-supervision scales."""

from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import make_synthetic_dataset, set_paths


def test_m2netp_trainer_end_to_end(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    make_synthetic_dataset(raw, num_cases=4, shape=(72, 72, 8))
    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    from nnuzoo_tpu.utilities.io import join, load_json, save_json
    plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["2d"]["patch_size"] = [64, 64]
    plans["configurations"]["2d"]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess([999], configurations=("2d",), num_processes=(1,))

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "2d", fold=0, dataset_json=dataset_json,
                      trainer_name="nnUNetTrainerM2NetP")
    assert trainer.config.optimizer == "adamw"
    assert trainer.config.ds_mode == "x2net"
    trainer.config = replace(trainer.config, num_epochs=1,
                             num_iterations_per_epoch=1,
                             num_val_iterations_per_epoch=1)
    trainer.run_training()
    log = trainer.logger.my_fantastic_logging
    assert np.isfinite(log["train_losses"]).all()
    assert np.isfinite(log["val_losses"]).all()
    # checkpoint reload round-trips for inference
    from nnuzoo_tpu.inference.predictor import Predictor
    pred = Predictor(tile_batch_size=1, use_mirroring=False)
    pred.initialize_from_trained_model_folder(trainer.output_folder_base,
                                              use_folds=[0])
    assert pred.trainer_name == "nnUNetTrainerM2NetP"
    assert type(pred.model).__name__ == "M2NetP"
