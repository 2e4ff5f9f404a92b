"""Preprocessed-dataset storage (reference:
`nnunetv2/training/dataloading/nnunet_dataset.py:63-124` and
`nnunetv2/training/dataloading/utils.py:91-159`).

``{case}.npz{data,seg}`` + ``{case}.pkl`` properties; ``unpack_dataset`` expands to
``{case}.npy`` / ``{case}_seg.npy`` so training can mmap patches without decompressing
whole volumes. DatasetBlosc2 mirrors the reference ``nnUNetDatasetBlosc2``
(`nnunet_dataset.py:127-311`): ``.b2nd`` arrays opened lazily with mmap and
cache-aware chunk/block sizing; the blosc2 package is imported lazily so the
numpy backend works in environments without it.
"""

import math
import os
from concurrent.futures import ThreadPoolExecutor
from copy import deepcopy
from typing import List, Optional, Tuple, Union

import numpy as np

from ..utilities.io import isfile, join, load_pickle, save_pickle


class DatasetNumpy:
    def __init__(self, folder: str, identifiers: Optional[List[str]] = None,
                 folder_with_segs_from_previous_stage: Optional[str] = None,
                 add_target: bool = True):
        if identifiers is None:
            identifiers = self.get_identifiers(folder)
        self.identifiers = sorted(identifiers)
        self.source_folder = folder
        self.folder_with_segs_from_previous_stage = folder_with_segs_from_previous_stage
        self.add_target = add_target

    def __len__(self):
        return len(self.identifiers)

    def __getitem__(self, identifier):
        return self.load_case(identifier)

    def load_case(self, identifier: str):
        data_npy = join(self.source_folder, identifier + ".npy")
        if isfile(data_npy):
            data = np.load(data_npy, mmap_mode="r")
        else:
            data = np.load(join(self.source_folder, identifier + ".npz"))["data"]

        seg = None
        if self.add_target:
            seg_npy = join(self.source_folder, identifier + "_seg.npy")
            if isfile(seg_npy):
                seg = np.load(seg_npy, mmap_mode="r")
            else:
                npz = np.load(join(self.source_folder, identifier + ".npz"))
                seg = npz["seg"] if "seg" in npz else None

        seg_prev = None
        if self.folder_with_segs_from_previous_stage is not None:
            prev_npy = join(self.folder_with_segs_from_previous_stage, identifier + ".npy")
            if isfile(prev_npy):
                seg_prev = np.load(prev_npy, mmap_mode="r")
            else:
                seg_prev = np.load(join(self.folder_with_segs_from_previous_stage,
                                        identifier + ".npz"))["seg"]

        properties = load_pickle(join(self.source_folder, identifier + ".pkl"))
        return data, seg, seg_prev, properties

    @staticmethod
    def save_case(data: np.ndarray, seg: np.ndarray, properties: dict,
                  output_filename_truncated: str) -> None:
        np.savez_compressed(output_filename_truncated + ".npz", data=data, seg=seg)
        save_pickle(properties, output_filename_truncated + ".pkl")

    @staticmethod
    def get_identifiers(folder: str) -> List[str]:
        return sorted({f[:-4] for f in os.listdir(folder) if f.endswith(".npz")}
                      | {f[:-4] for f in os.listdir(folder)
                         if f.endswith(".npy") and not f.endswith("_seg.npy")})


def _unpack_one(npz_file: str, unpack_segmentation: bool, overwrite: bool,
                verify: bool) -> None:
    truncated = npz_file[:-4]
    data_npy = truncated + ".npy"
    seg_npy = truncated + "_seg.npy"
    try:
        npz = np.load(npz_file)
        if overwrite or not isfile(data_npy):
            np.save(data_npy, npz["data"])
        if unpack_segmentation and "seg" in npz and (overwrite or not isfile(seg_npy)):
            np.save(seg_npy, npz["seg"])
        if verify:  # re-open to catch truncated writes
            np.load(data_npy, mmap_mode="r")
            if unpack_segmentation and isfile(seg_npy):
                np.load(seg_npy, mmap_mode="r")
    except Exception:
        # remove partial outputs so a retry starts clean
        for f in (data_npy, seg_npy):
            if isfile(f):
                os.remove(f)
        raise


def unpack_dataset(folder: str, unpack_segmentation: bool = True,
                   overwrite_existing: bool = False, num_processes: int = 4,
                   verify: bool = True) -> None:
    npzs = [join(folder, f) for f in sorted(os.listdir(folder)) if f.endswith(".npz")]
    if num_processes <= 1:
        for f in npzs:
            _unpack_one(f, unpack_segmentation, overwrite_existing, verify)
    else:
        with ThreadPoolExecutor(max_workers=num_processes) as pool:
            list(pool.map(lambda f: _unpack_one(f, unpack_segmentation,
                                                overwrite_existing, verify), npzs))


def _blosc2():
    try:
        import blosc2
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RuntimeError(
            "the .b2nd dataset backend needs the `blosc2` package; re-preprocess "
            "with the numpy backend or install blosc2") from e
    return blosc2


class DatasetBlosc2:
    """blosc2 NDim (.b2nd) storage backend (reference
    `nnunet_dataset.py:127-311`): lazily opened, memory-mapped, chunk/block
    sizes fitted to per-core L1/L3 caches so patch reads decompress only the
    touched blocks."""

    def __init__(self, folder: str, identifiers: Optional[List[str]] = None,
                 folder_with_segs_from_previous_stage: Optional[str] = None,
                 add_target: bool = True):
        if identifiers is None:
            identifiers = self.get_identifiers(folder)
        self.identifiers = sorted(identifiers)
        self.source_folder = folder
        self.folder_with_segs_from_previous_stage = folder_with_segs_from_previous_stage
        self.add_target = add_target
        _blosc2().set_nthreads(1)

    def __len__(self):
        return len(self.identifiers)

    def __getitem__(self, identifier):
        return self.load_case(identifier)

    def load_case(self, identifier: str):
        blosc2 = _blosc2()
        kwargs = {"mode": "r", "dparams": {"nthreads": 1}}
        if os.name != "nt":
            kwargs["mmap_mode"] = "r"
        data = blosc2.open(urlpath=join(self.source_folder,
                                        identifier + ".b2nd"), **kwargs)
        seg = None
        if self.add_target:
            seg_path = join(self.source_folder, identifier + "_seg.b2nd")
            if isfile(seg_path):
                seg = blosc2.open(urlpath=seg_path, **kwargs)
        seg_prev = None
        if self.folder_with_segs_from_previous_stage is not None:
            seg_prev = blosc2.open(
                urlpath=join(self.folder_with_segs_from_previous_stage,
                             identifier + ".b2nd"), **kwargs)
        properties = load_pickle(join(self.source_folder, identifier + ".pkl"))
        return data, seg, seg_prev, properties

    @staticmethod
    def save_case(data: np.ndarray, seg: np.ndarray, properties: dict,
                  output_filename_truncated: str, chunks=None, blocks=None,
                  chunks_seg=None, blocks_seg=None, clevel: int = 8) -> None:
        blosc2 = _blosc2()
        blosc2.set_nthreads(1)
        if chunks_seg is None:
            chunks_seg = chunks
        if blocks_seg is None:
            blocks_seg = blocks
        cparams = {"codec": blosc2.Codec.ZSTD, "clevel": clevel}
        blosc2.asarray(np.ascontiguousarray(data),
                       urlpath=output_filename_truncated + ".b2nd",
                       chunks=chunks, blocks=blocks, cparams=cparams)
        blosc2.asarray(np.ascontiguousarray(seg),
                       urlpath=output_filename_truncated + "_seg.b2nd",
                       chunks=chunks_seg, blocks=blocks_seg, cparams=cparams)
        save_pickle(properties, output_filename_truncated + ".pkl")

    @staticmethod
    def save_seg(seg: np.ndarray, output_filename_truncated: str,
                 chunks_seg=None, blocks_seg=None) -> None:
        _blosc2().asarray(np.ascontiguousarray(seg),
                          urlpath=output_filename_truncated + ".b2nd",
                          chunks=chunks_seg, blocks=blocks_seg)

    @staticmethod
    def get_identifiers(folder: str) -> List[str]:
        return sorted({f[:-5] for f in os.listdir(folder)
                       if f.endswith(".b2nd") and not f.endswith("_seg.b2nd")})

    @staticmethod
    def unpack_dataset(folder: str, **kwargs) -> None:
        pass  # b2nd reads are already block-random-access; nothing to unpack

    @staticmethod
    def comp_blosc2_params(
            image_size: Tuple[int, ...],
            patch_size: Union[Tuple[int, int], Tuple[int, int, int]],
            bytes_per_pixel: int = 4,
            l1_cache_size_per_core_in_bytes: int = 32768,
            l3_cache_size_per_core_in_bytes: int = 1441792,
            safety_factor: float = 0.8):
        """Cache-aware (blocks, chunks) for saving with blosc2 NDim (reference
        `nnunet_dataset.py:215-304`): blocks shrunk to ~80% of a 32 KiB L1,
        chunks grown by whole blocks toward ~80% of the per-core L3 but never
        past ~1.5x the patch size on average. image_size is (c, x, y, z);
        2D patch sizes are treated as (1, y, z)."""
        num_channels = image_size[0]
        if len(patch_size) == 2:
            patch_size = [1, *patch_size]
        patch_size = np.array(patch_size)
        block_size = np.array(
            (num_channels,
             *[2 ** (max(0, math.ceil(math.log2(i)))) for i in patch_size]))

        # shrink the largest-overshoot spatial axis until the block fits L1
        est = np.prod(block_size) * bytes_per_pixel
        while est > l1_cache_size_per_core_in_bytes * safety_factor:
            axis_order = np.argsort(block_size[1:] / patch_size)[::-1]
            idx = 0
            picked = axis_order[idx]
            while block_size[picked + 1] == 1:
                idx += 1
                picked = axis_order[idx]
            block_size[picked + 1] = 2 ** max(
                0, math.floor(math.log2(block_size[picked + 1] - 1)))
            block_size[picked + 1] = min(block_size[picked + 1],
                                         image_size[picked + 1])
            est = np.prod(block_size) * bytes_per_pixel
        block_size = np.array([min(i, j) for i, j in zip(image_size, block_size)])

        # grow chunks by whole blocks toward the L3 budget
        chunk_size = deepcopy(block_size)
        est = np.prod(chunk_size) * bytes_per_pixel
        while est < l3_cache_size_per_core_in_bytes * safety_factor:
            if patch_size[0] == 1 and all(
                    i == j for i, j in zip(chunk_size[2:], image_size[2:])):
                break
            if all(i == j for i, j in zip(chunk_size, image_size)):
                break
            axis_order = np.argsort(chunk_size[1:] / block_size[1:])
            idx = 0
            picked = axis_order[idx]
            while chunk_size[picked + 1] == image_size[picked + 1] or                     patch_size[picked] == 1:
                idx += 1
                picked = axis_order[idx]
            chunk_size[picked + 1] += block_size[picked + 1]
            chunk_size[picked + 1] = min(chunk_size[picked + 1],
                                         image_size[picked + 1])
            est = np.prod(chunk_size) * bytes_per_pixel
            if np.mean([i / j for i, j in zip(chunk_size[1:], patch_size)]) > 1.5:
                chunk_size[picked + 1] -= block_size[picked + 1]
                break
        chunk_size = [min(i, j) for i, j in zip(image_size, chunk_size)]
        return tuple(int(b) for b in block_size), tuple(int(c) for c in chunk_size)


_FILE_ENDING_DATASET_MAPPING = {"npz": DatasetNumpy, "npy": DatasetNumpy,
                                "b2nd": DatasetBlosc2}


def infer_dataset_class(folder: str):
    """Dispatch on the file endings present in a preprocessed folder
    (reference `nnunet_dataset.py:313-326`)."""
    endings = {f.split(".")[-1] for f in os.listdir(folder)
               if not f.startswith(".")}
    endings.discard("pkl")
    numpy_format = "npy" in endings
    endings.discard("npy")
    if not endings:
        if numpy_format:
            return DatasetNumpy
        raise RuntimeError(f"no dataset files found in {folder}")
    if len(endings) != 1:
        raise RuntimeError(f"found multiple file endings in {folder}: "
                           f"{sorted(endings)}; cannot infer dataset backend")
    ending = next(iter(endings))
    if ending not in _FILE_ENDING_DATASET_MAPPING:
        raise RuntimeError(f"unknown dataset file ending .{ending} in {folder}")
    return _FILE_ENDING_DATASET_MAPPING[ending]
