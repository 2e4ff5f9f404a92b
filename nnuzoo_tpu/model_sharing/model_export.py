"""Trained-model zip export/import (reference: `nnunetv2/model_sharing/`)."""

import os
import zipfile
from typing import List, Optional, Union

from ..paths import get_results_folder
from ..utilities.dataset_name_id import maybe_convert_to_dataset_name
from ..utilities.file_path_utilities import get_output_folder
from ..utilities.io import isdir, isfile, join


def export_pretrained_model(dataset_name_or_id: Union[int, str], output_file: str,
                            configurations=("2d", "3d_fullres", "3d_lowres",
                                            "3d_cascade_fullres"),
                            trainer: str = "nnUNetTrainer",
                            plans_identifier: str = "nnUNetPlans",
                            folds=(0, 1, 2, 3, 4),
                            strict: bool = False,
                            save_checkpoints=("checkpoint_final.pth",),
                            export_crossval_predictions: bool = False) -> None:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    with zipfile.ZipFile(output_file, "w", zipfile.ZIP_DEFLATED) as zipf:
        for c in configurations:
            trainer_output_dir = get_output_folder(dataset_name, trainer,
                                                   plans_identifier, c)
            if not isdir(trainer_output_dir):
                if strict:
                    raise RuntimeError(f"{dataset_name} is missing the trained "
                                       f"model of configuration {c}")
                continue
            for root_file in ("plans.json", "dataset.json",
                              "dataset_fingerprint.json"):
                f = join(trainer_output_dir, root_file)
                if isfile(f):
                    zipf.write(f, os.path.relpath(f, get_results_folder()))
            for fold in folds:
                fold_dir = join(trainer_output_dir, f"fold_{fold}")
                if not isdir(fold_dir):
                    if strict:
                        raise RuntimeError(f"fold {fold} of configuration {c} is "
                                           f"missing")
                    continue
                for ckpt in save_checkpoints:
                    f = join(fold_dir, ckpt)
                    if isfile(f):
                        zipf.write(f, os.path.relpath(f, get_results_folder()))
                dbg = join(fold_dir, "debug.json")
                if isfile(dbg):
                    zipf.write(dbg, os.path.relpath(dbg, get_results_folder()))
                if export_crossval_predictions:
                    val_dir = join(fold_dir, "validation")
                    if isdir(val_dir):
                        for vf in os.listdir(val_dir):
                            full = join(val_dir, vf)
                            zipf.write(full,
                                       os.path.relpath(full, get_results_folder()))
    print(f"Exported {dataset_name} to {output_file}")


def install_model_from_zip_file(zip_file: str) -> None:
    with zipfile.ZipFile(zip_file, "r") as zipf:
        zipf.extractall(get_results_folder())
    print(f"Installed model from {zip_file} into {get_results_folder()}")
