"""End-to-end training slice: synthetic dataset -> fingerprint -> plan ->
preprocess -> Trainer (tiny epochs) -> checkpoints, on the 8-device CPU mesh."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import make_synthetic_dataset, set_paths


@pytest.fixture(scope="module")
def prepared_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    raw, pp, res = set_paths(tmp)
    make_synthetic_dataset(raw, num_cases=6, shape=(24, 28, 20))
    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    preprocess([999], num_processes=(1, 1, 1))
    return raw, pp, res


def _make_trainer(pp, configuration="3d_fullres", trainer_name="nnUNetTrainer",
                  batch_size=2):
    from nnuzoo_tpu.training.trainer import Trainer
    from nnuzoo_tpu.utilities.io import join, load_json
    plans = load_json(join(pp, "Dataset999_Synth", "nnUNetPlans.json"))
    # shrink for test speed
    cfg = plans["configurations"][configuration]
    cfg["batch_size"] = batch_size
    cfg["patch_size"] = [16, 16, 16] if configuration == "3d_fullres" else [16, 16]
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, configuration, fold=0, dataset_json=dataset_json,
                      trainer_name=trainer_name)
    trainer.config = replace(trainer.config, num_epochs=2,
                             num_iterations_per_epoch=3,
                             num_val_iterations_per_epoch=2)
    return trainer


class TestTrainerEndToEnd:
    def test_full_training_3d(self, prepared_dataset):
        raw, pp, res = prepared_dataset
        trainer = _make_trainer(pp)
        trainer.run_training()

        from nnuzoo_tpu.utilities.io import isfile, join
        out = trainer.output_folder
        assert isfile(join(out, "checkpoint_final.pth"))
        assert isfile(join(out, "checkpoint_best.pth"))
        assert not isfile(join(out, "checkpoint_latest.pth"))  # deleted at end
        assert isfile(join(out, "debug.json"))
        assert isfile(join(trainer.output_folder_base, "plans.json"))
        assert os.path.isfile(join(out, "progress.png"))
        log = trainer.logger.my_fantastic_logging
        assert len(log["train_losses"]) == 2
        assert all(np.isfinite(l) for l in log["train_losses"])
        assert len(log["ema_fg_dice"]) == 2

    def test_checkpoint_roundtrip(self, prepared_dataset):
        raw, pp, res = prepared_dataset
        trainer = _make_trainer(pp)
        trainer.initialize()
        ckpt_path = os.path.join(trainer.output_folder, "ckpt_test.pth")
        trainer.save_checkpoint(ckpt_path)

        from nnuzoo_tpu.training.trainer import load_trainer_from_checkpoint
        t2 = load_trainer_from_checkpoint(ckpt_path)
        # config must shrink again since load_trainer reinstantiates from init args
        p1 = jax.tree.leaves(trainer.state["params"])
        p2 = jax.tree.leaves(t2.state["params"])
        for a, b in zip(p1, p2):
            assert np.allclose(np.asarray(a), np.asarray(b))
        assert t2.trainer_name == "nnUNetTrainer"

    def test_loss_decreases_overfit(self, prepared_dataset):
        """Sanity: overfitting 10 epochs of 5 iters on 6 cases reduces loss."""
        raw, pp, res = prepared_dataset
        trainer = _make_trainer(pp)
        trainer.config = replace(trainer.config, num_epochs=6,
                                 num_iterations_per_epoch=5,
                                 num_val_iterations_per_epoch=1,
                                 initial_lr=1e-2)
        trainer.run_training()
        losses = trainer.logger.my_fantastic_logging["train_losses"]
        assert losses[-1] < losses[0]
