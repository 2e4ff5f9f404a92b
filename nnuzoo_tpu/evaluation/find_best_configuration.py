"""Find-best-configuration over cross-validation results (reference:
`nnunetv2/evaluation/find_best_configuration.py` + `accumulate_cv_results.py`).

Collects each configuration's per-fold validation predictions into one folder,
evaluates them, evaluates pairwise ensembles (requires --npz probability exports),
picks the best by mean foreground Dice, determines postprocessing on the winner,
and writes ``inference_information.json`` + a human-readable command hint.
"""

import itertools
import os
import shutil
from typing import List, Optional, Union

from ..ensembling.ensemble import ensemble_folders
from ..paths import get_preprocessed_folder, get_results_folder
from ..plans.plans_handler import PlansManager
from ..postprocessing.connected_components import determine_postprocessing
from ..utilities.dataset_name_id import maybe_convert_to_dataset_name
from ..utilities.file_path_utilities import get_output_folder
from ..utilities.io import (isdir, isfile, join, load_json, maybe_mkdir,
                            save_json, subfiles)
from .metrics import compute_metrics_on_folder, load_summary_json

default_trained_models = [
    {"plans": "nnUNetPlans", "configuration": "2d", "trainer": "nnUNetTrainer"},
    {"plans": "nnUNetPlans", "configuration": "3d_fullres",
     "trainer": "nnUNetTrainer"},
    {"plans": "nnUNetPlans", "configuration": "3d_lowres",
     "trainer": "nnUNetTrainer"},
    {"plans": "nnUNetPlans", "configuration": "3d_cascade_fullres",
     "trainer": "nnUNetTrainer"},
]


def accumulate_cv_results(trained_model_folder: str, merged_output_folder: str,
                          folds: List[int]) -> None:
    """Copy all folds' validation predictions into one folder and evaluate
    (reference `accumulate_cv_results.py`)."""
    if isdir(merged_output_folder):
        shutil.rmtree(merged_output_folder)
    maybe_mkdir(merged_output_folder)
    dataset_json = load_json(join(trained_model_folder, "dataset.json"))
    plans_manager = PlansManager(load_json(join(trained_model_folder,
                                                "plans.json")))
    ending = dataset_json["file_ending"]
    for f in folds:
        val_dir = join(trained_model_folder, f"fold_{f}", "validation")
        assert isdir(val_dir), (f"fold_{f} of {trained_model_folder} has no "
                                f"validation folder. Train with final validation.")
        for file in os.listdir(val_dir):
            if file.endswith(ending) or file.endswith(".npz") or \
                    file.endswith(".pkl"):
                shutil.copy(join(val_dir, file), join(merged_output_folder, file))

    gt_folder = join(get_preprocessed_folder(), plans_manager.dataset_name,
                     "gt_segmentations")
    label_manager = plans_manager.get_label_manager(dataset_json)
    rw = plans_manager.image_reader_writer_class()
    compute_metrics_on_folder(
        gt_folder, merged_output_folder, join(merged_output_folder, "summary.json"),
        rw, ending,
        label_manager.foreground_regions if label_manager.has_regions
        else label_manager.foreground_labels,
        label_manager.ignore_label, num_processes=4)


def find_best_configuration(dataset_name_or_id,
                            allowed_trained_models=default_trained_models,
                            allow_ensembling: bool = True,
                            num_processes: int = 4,
                            overwrite: bool = True,
                            folds: List[int] = (0, 1, 2, 3, 4),
                            strict: bool = False) -> dict:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    all_results = {}

    for m in allowed_trained_models:
        output_folder = get_output_folder(dataset_name, m["trainer"], m["plans"],
                                          m["configuration"])
        if not isdir(output_folder):
            if strict:
                raise RuntimeError(f"{output_folder} missing")
            continue
        identifier = os.path.basename(output_folder)
        merged_dir = join(os.path.dirname(output_folder),
                          "crossval_results_folds_" +
                          "_".join(str(f) for f in folds) + "__" + identifier)
        if overwrite or not isfile(join(merged_dir, "summary.json")):
            accumulate_cv_results(output_folder, merged_dir, list(folds))
        result = load_summary_json(join(merged_dir, "summary.json"))
        all_results[identifier] = {
            "source": merged_dir, "result": result["foreground_mean"]["Dice"],
            "model_folder": output_folder,
        }

    if allow_ensembling and len(all_results) > 1:
        for a, b in itertools.combinations(sorted(all_results.keys()), 2):
            # ensembling needs saved probabilities
            npz_a = subfiles(all_results[a]["source"], suffix=".npz")
            npz_b = subfiles(all_results[b]["source"], suffix=".npz")
            if not (npz_a and npz_b):
                continue
            ens_name = f"ensemble___{a}___{b}"
            ens_dir = join(get_results_folder(), dataset_name, "ensembles",
                           ens_name)
            model_folder = all_results[a]["model_folder"]
            ensemble_folders([all_results[a]["source"],
                              all_results[b]["source"]], ens_dir,
                             dataset_json_file_or_dict=join(model_folder,
                                                            "dataset.json"),
                             plans_json_file_or_dict=join(model_folder,
                                                          "plans.json"),
                             num_processes=num_processes)
            dataset_json = load_json(join(model_folder, "dataset.json"))
            plans_manager = PlansManager(load_json(join(model_folder,
                                                        "plans.json")))
            lm = plans_manager.get_label_manager(dataset_json)
            gt_folder = join(get_preprocessed_folder(), dataset_name,
                             "gt_segmentations")
            summary = compute_metrics_on_folder(
                gt_folder, ens_dir, join(ens_dir, "summary.json"),
                plans_manager.image_reader_writer_class(),
                dataset_json["file_ending"],
                lm.foreground_regions if lm.has_regions else lm.foreground_labels,
                lm.ignore_label, num_processes)
            all_results[ens_name] = {
                "source": ens_dir,
                "result": summary["foreground_mean"]["Dice"],
                "model_folder": model_folder,
            }

    assert all_results, "No trained configurations found"
    best = max(all_results, key=lambda k: all_results[k]["result"])

    # postprocessing on the winner
    model_folder = all_results[best]["model_folder"]
    dataset_json = load_json(join(model_folder, "dataset.json"))
    pp_fns, pp_kwargs = determine_postprocessing(
        all_results[best]["source"],
        join(get_preprocessed_folder(), dataset_name, "gt_segmentations"),
        join(model_folder, "plans.json"), dataset_json,
        num_processes=num_processes, keep_postprocessed_files=True)

    info = {
        "best_configuration": best,
        "results": {k: v["result"] for k, v in all_results.items()},
        "postprocessing": [f.__name__ for f in pp_fns],
        "postprocessing_file": join(all_results[best]["source"],
                                    "postprocessing.pkl"),
        "folds": list(folds),
    }
    save_json(info, join(get_results_folder(), dataset_name,
                         "inference_information.json"))
    print(f"Best configuration for {dataset_name}: {best} "
          f"(Dice {all_results[best]['result']:.4f})")
    return info
