"""Connected-component postprocessing (reference:
`nnunetv2/postprocessing/remove_connected_components.py:22-362`).

Tries remove-all-but-largest-component globally (on the union of foreground) and
per class/region; keeps the functions that improve cross-validation Dice; the
chosen pipeline is pickled and can be applied to prediction folders.
"""

import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Tuple, Union

import numpy as np
from scipy.ndimage import label as cc_label

from ..evaluation.metrics import (compute_metrics_on_folder, load_summary_json,
                                  label_or_region_to_key)
from ..imageio.base import BaseReaderWriter
from ..plans.plans_handler import PlansManager
from ..utilities.io import (isfile, join, load_json, load_pickle, maybe_mkdir,
                            save_json, save_pickle, subfiles)


def remove_all_but_largest_component(binary_mask: np.ndarray) -> np.ndarray:
    labeled, n = cc_label(binary_mask)
    if n <= 1:
        return binary_mask
    sizes = np.bincount(labeled.ravel())
    sizes[0] = 0
    return labeled == np.argmax(sizes)


def remove_all_but_largest_component_from_segmentation(
        segmentation: np.ndarray,
        labels_or_regions: Union[int, Tuple[int, ...],
                                 List[Union[int, Tuple[int, ...]]]],
        background_label: int = 0) -> np.ndarray:
    mask = np.zeros_like(segmentation, dtype=bool)
    if not isinstance(labels_or_regions, list):
        labels_or_regions = [labels_or_regions]
    for l_or_r in labels_or_regions:
        if np.isscalar(l_or_r):
            mask |= segmentation == l_or_r
        else:
            for l in l_or_r:
                mask |= segmentation == l
    largest = remove_all_but_largest_component(mask)
    out = np.copy(segmentation)
    out[mask & ~largest] = background_label
    return out


def apply_postprocessing(segmentation: np.ndarray, pp_fns: List[Callable],
                         pp_fn_kwargs: List[dict]) -> np.ndarray:
    for fn, kwargs in zip(pp_fns, pp_fn_kwargs):
        segmentation = fn(segmentation, **kwargs)
    return segmentation


def _apply_to_file(args):
    (fname, in_folder, out_folder, pp_fns, pp_fn_kwargs, rw) = args
    seg, props = rw.read_seg(join(in_folder, fname))
    seg = apply_postprocessing(seg[0], pp_fns, pp_fn_kwargs)
    rw.write_seg(seg, join(out_folder, fname), props)


def apply_postprocessing_to_folder(input_folder: str, output_folder: str,
                                   pp_fns: List[Callable],
                                   pp_fn_kwargs: List[dict],
                                   plans_manager: PlansManager,
                                   dataset_json: dict,
                                   num_processes: int = 8) -> None:
    maybe_mkdir(output_folder)
    rw = plans_manager.image_reader_writer_class()
    files = subfiles(input_folder, suffix=dataset_json["file_ending"],
                     join_path=False)
    args = [(f, input_folder, output_folder, pp_fns, pp_fn_kwargs, rw)
            for f in files]
    with ThreadPoolExecutor(max_workers=max(1, num_processes)) as pool:
        list(pool.map(_apply_to_file, args))


def determine_postprocessing(folder_predictions: str, folder_ref: str,
                             plans_file_or_dict, dataset_json_file_or_dict,
                             num_processes: int = 8,
                             keep_postprocessed_files: bool = True):
    """Greedy: accept a candidate postprocessing fn if it improves mean fg Dice
    (reference `remove_connected_components.py:53-270`). Returns
    (pp_fns, pp_fn_kwargs); also writes postprocessing.pkl next to predictions."""
    plans_manager = PlansManager(
        plans_file_or_dict if isinstance(plans_file_or_dict, dict)
        else load_json(plans_file_or_dict))
    dataset_json = dataset_json_file_or_dict if \
        isinstance(dataset_json_file_or_dict, dict) else \
        load_json(dataset_json_file_or_dict)
    rw = plans_manager.image_reader_writer_class()
    label_manager = plans_manager.get_label_manager(dataset_json)
    labels_or_regions = label_manager.foreground_regions if \
        label_manager.has_regions else label_manager.foreground_labels

    baseline_file = join(folder_predictions, "summary.json")
    if not isfile(baseline_file):
        compute_metrics_on_folder(folder_ref, folder_predictions, baseline_file,
                                  rw, dataset_json["file_ending"],
                                  labels_or_regions, label_manager.ignore_label,
                                  num_processes)
    baseline = load_summary_json(baseline_file)

    pp_fns, pp_fn_kwargs = [], []
    current_folder = folder_predictions
    current = baseline
    tmp_folder = join(folder_predictions, "temp_pp")

    # candidate 1: largest component on the foreground union
    candidates = [(remove_all_but_largest_component_from_segmentation,
                   {"labels_or_regions": labels_or_regions})]
    # candidate 2: per class/region
    candidates += [(remove_all_but_largest_component_from_segmentation,
                    {"labels_or_regions": lr}) for lr in labels_or_regions]

    for i, (fn, kwargs) in enumerate(candidates):
        out = tmp_folder + f"_{i}"
        apply_postprocessing_to_folder(current_folder, out, [fn], [kwargs],
                                       plans_manager, dataset_json, num_processes)
        result = compute_metrics_on_folder(
            folder_ref, out, join(out, "summary.json"), rw,
            dataset_json["file_ending"], labels_or_regions,
            label_manager.ignore_label, num_processes)
        if i == 0:
            improved = result["foreground_mean"]["Dice"] > \
                current["foreground_mean"]["Dice"]
        else:
            lr = kwargs["labels_or_regions"]
            key = lr if np.isscalar(lr) else tuple(lr)
            improved = result["mean"][key]["Dice"] > current["mean"][key]["Dice"]
        if improved:
            pp_fns.append(fn)
            pp_fn_kwargs.append(kwargs)
            if current_folder != folder_predictions:
                shutil.rmtree(current_folder)
            current_folder = out
            current = result
            if i == 0:
                # per-class candidates then evaluate on top of the global one
                continue
        else:
            shutil.rmtree(out)

    save_pickle((pp_fns, pp_fn_kwargs),
                join(folder_predictions, "postprocessing.pkl"))
    save_json({"fn": [f.__name__ for f in pp_fns],
               "kwargs": [{k: (list(v) if isinstance(v, (list, tuple)) else v)
                           for k, v in kw.items()} for kw in pp_fn_kwargs],
               "dice_before": baseline["foreground_mean"]["Dice"],
               "dice_after": current["foreground_mean"]["Dice"]},
              join(folder_predictions, "postprocessing.json"))

    if keep_postprocessed_files and current_folder != folder_predictions:
        final = folder_predictions + "_postprocessed"
        if isfile(final) or os.path.isdir(final):
            shutil.rmtree(final)
        shutil.move(current_folder, final)
    elif current_folder != folder_predictions:
        shutil.rmtree(current_folder)
    return pp_fns, pp_fn_kwargs

