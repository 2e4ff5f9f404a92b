"""Segmentation-overlay QA plots (reference: `nnunetv2/utilities/overlay_plots.py`).

For each training case, plots the largest-foreground slice of the chosen channel
with the segmentation color-overlaid, saved as png.
"""

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..paths import get_raw_folder
from ..utilities.dataset_name_id import maybe_convert_to_dataset_name
from ..utilities.dataset_utils import get_filenames_of_train_images_and_targets
from ..utilities.io import join, load_json, maybe_mkdir

color_cycle = (
    "000000", "4363d8", "f58231", "3cb44b", "e6194B", "911eb4", "ffe119",
    "bfef45", "42d4f4", "f032e6", "000075", "9A6324", "808000", "800000",
    "469990",
)


def hex_to_rgb(hex_color: str):
    return tuple(int(hex_color[i:i + 2], 16) for i in (0, 2, 4))


def generate_overlay(image_2d: np.ndarray, seg_2d: np.ndarray,
                     overlay_intensity: float = 0.6) -> np.ndarray:
    image = image_2d.astype(np.float64)
    image -= image.min()
    image /= max(image.max(), 1e-8)
    rgb = np.stack([image] * 3, -1) * 255.0
    for label in np.unique(seg_2d):
        if label == 0:
            continue
        color = hex_to_rgb(color_cycle[int(label) % len(color_cycle)])
        mask = seg_2d == label
        rgb[mask] = (1 - overlay_intensity) * rgb[mask] + \
            overlay_intensity * np.array(color)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def plot_overlay(image_file_or_files, seg_file: str, rw, output_file: str,
                 channel_idx: int = 0, overlay_intensity: float = 0.6) -> None:
    from PIL import Image
    if isinstance(image_file_or_files, str):
        image_file_or_files = [image_file_or_files]
    data, _ = rw.read_images(image_file_or_files)
    seg, _ = rw.read_seg(seg_file)
    image = data[channel_idx]
    seg = seg[0]
    # pick the slice (axis 0) with the most foreground
    fg_per_slice = (seg > 0).sum(axis=tuple(range(1, seg.ndim)))
    idx = int(np.argmax(fg_per_slice))
    overlay = generate_overlay(image[idx], seg[idx], overlay_intensity)
    Image.fromarray(overlay).save(output_file)


def generate_overlays_for_dataset(dataset_name_or_id, output_folder: str,
                                  channel_idx: int = 0,
                                  num_processes: int = 8) -> None:
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    folder = join(get_raw_folder(), dataset_name)
    dataset_json = load_json(join(folder, "dataset.json"))
    dataset = get_filenames_of_train_images_and_targets(folder, dataset_json)
    rw = determine_reader_writer_from_dataset_json(
        dataset_json, next(iter(dataset.values()))["images"][0])()
    maybe_mkdir(output_folder)

    def one(item):
        ident, files = item
        plot_overlay(files["images"], files["label"], rw,
                     join(output_folder, ident + ".png"), channel_idx)

    with ThreadPoolExecutor(max_workers=max(1, num_processes)) as pool:
        list(pool.map(one, dataset.items()))
