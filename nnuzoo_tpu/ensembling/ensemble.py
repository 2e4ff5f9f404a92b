"""Probability ensembling (reference: `nnunetv2/ensembling/ensemble.py:17-206`):
average the saved per-configuration probability .npz files, convert to
segmentation, write via the reader/writer."""

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List

import numpy as np

from ..plans.label_handling import LabelManager
from ..plans.plans_handler import PlansManager
from ..utilities.io import (isfile, join, load_json, load_pickle, maybe_mkdir,
                            save_json, subfiles)


def average_probabilities(list_of_files: List[str]) -> np.ndarray:
    assert len(list_of_files), "At least one file must be given"
    avg = None
    for f in list_of_files:
        probs = np.load(f)["probabilities"].astype(np.float32)
        avg = probs if avg is None else avg + probs
    return avg / len(list_of_files)


def merge_files(list_of_npz, output_filename_truncated: str, plans_manager,
                label_manager, dataset_json, save_merged_probabilities=False):
    probabilities = average_probabilities(list_of_npz)
    seg = label_manager.convert_probabilities_to_segmentation(probabilities)
    # properties come from the first config's pkl sidecar
    properties = load_pickle(list_of_npz[0][:-4] + ".pkl")
    rw = plans_manager.image_reader_writer_class()
    # probabilities were saved in original geometry (post-export)
    rw.write_seg(np.asarray(seg), output_filename_truncated +
                 dataset_json["file_ending"], properties)
    if save_merged_probabilities:
        np.savez_compressed(output_filename_truncated + ".npz",
                            probabilities=probabilities)


def ensemble_folders(list_of_input_folders: List[str], output_folder: str,
                     save_merged_probabilities: bool = False,
                     num_processes: int = 8,
                     dataset_json_file_or_dict=None,
                     plans_json_file_or_dict=None) -> None:
    if dataset_json_file_or_dict is None:
        dataset_json_file_or_dict = join(list_of_input_folders[0], "dataset.json")
    if plans_json_file_or_dict is None:
        plans_json_file_or_dict = join(list_of_input_folders[0], "plans.json")
    dataset_json = dataset_json_file_or_dict if \
        isinstance(dataset_json_file_or_dict, dict) else \
        load_json(dataset_json_file_or_dict)
    plans_manager = PlansManager(
        plans_json_file_or_dict if isinstance(plans_json_file_or_dict, dict)
        else load_json(plans_json_file_or_dict))
    label_manager = plans_manager.get_label_manager(dataset_json)

    # cases = npz files present in ALL folders
    per_folder = [set(f[:-4] for f in subfiles(fold, suffix=".npz",
                                               join_path=False))
                  for fold in list_of_input_folders]
    common = sorted(set.intersection(*per_folder))
    assert common, "No common .npz cases found across the input folders " \
                   "(predict with --save_probabilities)"
    maybe_mkdir(output_folder)

    def one(case):
        merge_files([join(f, case + ".npz") for f in list_of_input_folders],
                    join(output_folder, case), plans_manager, label_manager,
                    dataset_json, save_merged_probabilities)

    with ThreadPoolExecutor(max_workers=max(1, num_processes)) as pool:
        list(pool.map(one, common))
