"""Sliding-window predictor (reference:
`nnunetv2/inference/predict_from_raw_data.py:37-974`).

Parity: fold-ensemble restore from a trained model folder (reads the checkpoint's
``trainer_name`` + ``init_args``), Gaussian-weighted sliding-window accumulation
(step = tile_step_size * patch), mirror TTA over all axis combinations, fold-logit
averaging, ``num_parts``/``part_id`` case striping, overwrite skipping.

TPU-native: tiles are batched per forward pass (the reference runs batch=1 per
tile), the tile forward (incl. all mirror flips) is one jitted function per
configuration, and Gaussian-weighted accumulation happens ON DEVICE in jitted
scatter-add steps over donated (spatial, heads) buffers — no device->host
round-trip per tile batch. Buffer shapes are bucketed (spatial dims rounded up
to half-patch multiples) so volume-shape variety doesn't trigger a recompile
per case. NNUZOO_HOST_ACCUM=1 restores the round-1 host-numpy accumulation.
"""

import itertools
import os
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import get_model_builder
from ..plans.label_handling import determine_num_input_channels
from ..plans.plans_handler import PlansManager
from ..preprocessing.preprocessor import DefaultPreprocessor
from ..utilities.dataset_utils import create_lists_from_split_dataset_folder, \
    get_identifiers_from_split_dataset_folder
from ..utilities.io import isdir, isfile, join, load_json, load_pickle, maybe_mkdir, \
    save_json, subfiles
from .export import export_prediction_from_logits
from .sliding_window import (compute_gaussian, get_sliding_window_slicers,
                             pad_nd_image)


class Predictor:
    def __init__(self, tile_step_size: float = 0.5, use_gaussian: bool = True,
                 use_mirroring: bool = True,
                 allowed_mirroring_axes: Optional[Tuple[int, ...]] = None,
                 tile_batch_size: int = 4, verbose: bool = False):
        self.tile_step_size = tile_step_size
        self.use_gaussian = use_gaussian
        self.use_mirroring = use_mirroring
        self.allowed_mirroring_axes = allowed_mirroring_axes
        self.tile_batch_size = tile_batch_size
        self.verbose = verbose

        self.model = None
        self.list_of_parameters = None
        self.plans_manager = None
        self.configuration_manager = None
        self.dataset_json = None
        self.label_manager = None
        self.trainer_name = None
        self._jit_tile_forward = None

    # ------------------------------------------------------------------ init
    def initialize_from_trained_model_folder(self, model_training_output_dir: str,
                                             use_folds=None,
                                             checkpoint_name: str =
                                             "checkpoint_final.pth"):
        if use_folds is None:
            use_folds = self.auto_detect_available_folds(
                model_training_output_dir, checkpoint_name)
        dataset_json = load_json(join(model_training_output_dir, "dataset.json"))
        plans = load_json(join(model_training_output_dir, "plans.json"))
        plans_manager = PlansManager(plans)

        if isinstance(use_folds, (int, str)):
            use_folds = [use_folds]
        parameters = []
        trainer_name = configuration_name = mirroring_axes = None
        for f in use_folds:
            f = int(f) if f != "all" else f
            ckpt = load_pickle(join(model_training_output_dir, f"fold_{f}",
                                    checkpoint_name))
            if trainer_name is None:
                trainer_name = ckpt["trainer_name"]
                configuration_name = ckpt["init_args"]["configuration"]
                mirroring_axes = ckpt.get("inference_allowed_mirroring_axes")
            parameters.append(ckpt["network_weights"])

        configuration_manager = plans_manager.get_configuration(configuration_name)
        num_input_channels = determine_num_input_channels(
            plans_manager, configuration_manager, dataset_json)
        builder = get_model_builder(trainer_name)
        model = builder(plans_manager, dataset_json, configuration_manager,
                        num_input_channels, deep_supervision=False)

        # deserialize each fold's params against a freshly-initialized template
        from flax import serialization
        patch = configuration_manager.patch_size
        example = jnp.zeros((1, *patch, num_input_channels), jnp.float32)
        template = jax.jit(model.init)(jax.random.PRNGKey(0), example)
        template_np = jax.tree.map(np.asarray, template)
        params_list = [serialization.from_bytes(template_np, p) for p in parameters]

        self.manual_initialization(model, params_list, plans_manager,
                                   configuration_manager, dataset_json,
                                   trainer_name, mirroring_axes)

    @staticmethod
    def auto_detect_available_folds(model_training_output_dir, checkpoint_name):
        folds = [int(i.split("_")[-1])
                 for i in os.listdir(model_training_output_dir)
                 if i.startswith("fold_") and i != "fold_all"
                 and isfile(join(model_training_output_dir, i, checkpoint_name))]
        assert len(folds) > 0, f"No usable folds in {model_training_output_dir}"
        return sorted(folds)

    def manual_initialization(self, model, params_list, plans_manager,
                              configuration_manager, dataset_json,
                              trainer_name, inference_allowed_mirroring_axes):
        self.model = model
        self.list_of_parameters = params_list
        self.plans_manager = plans_manager
        self.configuration_manager = configuration_manager
        self.dataset_json = dataset_json
        self.trainer_name = trainer_name
        self.label_manager = plans_manager.get_label_manager(dataset_json)
        if self.allowed_mirroring_axes is None:
            self.allowed_mirroring_axes = inference_allowed_mirroring_axes
        self._build_tile_forward()

    def _build_tile_forward(self):
        model = self.model
        mirror_axes = tuple(self.allowed_mirroring_axes or ()) \
            if self.use_mirroring else ()

        def tile_forward(params, x):
            """x: (B, *patch, C) channels-last. Averages over mirror TTA."""
            outputs = model.apply(params, x, train=False)
            pred = outputs[0] if isinstance(outputs, (list, tuple)) else outputs
            if mirror_axes:
                combos = [c for i in range(len(mirror_axes))
                          for c in itertools.combinations(mirror_axes, i + 1)]
                for combo in combos:
                    axes = [a + 1 for a in combo]
                    flipped = model.apply(params, jnp.flip(x, axes), train=False)
                    f = flipped[0] if isinstance(flipped, (list, tuple)) else flipped
                    pred = pred + jnp.flip(f, axes)
                pred = pred / (len(combos) + 1)
            return pred  # (B, *patch, num_heads)

        self._jit_tile_forward = jax.jit(tile_forward)
        self._acc_cache = {}

    # ------------------------------------------------------------------ accumulation
    def _get_acc_fns(self, buf_spatial: Tuple[int, ...],
                     patch_eff: Tuple[int, ...], num_heads: int):
        """Jitted device-side scatter-add + finalize for one bucketed buffer
        shape (replaces the reference's per-tile device->host accumulation hot
        loop, `predict_from_raw_data.py:566-643`; SURVEY §7.8)."""
        key = (buf_spatial, patch_eff, num_heads)
        if key not in self._acc_cache:
            dim = len(buf_spatial)
            B = self.tile_batch_size

            def acc(logits_buf, weights_buf, preds, gaussian, starts, valid):
                # preds (B, *patch_eff, H); gaussian (*patch_eff, 1);
                # starts (B, dim) int32; valid (B,) 0/1 masks batch padding.
                # Tiles overlap -> sequential read-modify-write per tile.
                def body(j, bufs):
                    lb, wb = bufs
                    st = tuple(starts[j, i] for i in range(dim))
                    g = gaussian * valid[j]
                    cur = jax.lax.dynamic_slice(
                        lb, st + (0,), patch_eff + (num_heads,))
                    lb = jax.lax.dynamic_update_slice(
                        lb, cur + preds[j] * g, st + (0,))
                    curw = jax.lax.dynamic_slice(wb, st + (0,), patch_eff + (1,))
                    wb = jax.lax.dynamic_update_slice(wb, curw + g, st + (0,))
                    return lb, wb

                return jax.lax.fori_loop(0, B, body, (logits_buf, weights_buf))

            def finalize(logits_buf, weights_buf):
                return logits_buf / jnp.maximum(weights_buf, 1e-8)

            self._acc_cache[key] = (jax.jit(acc, donate_argnums=(0, 1)),
                                    jax.jit(finalize))
        return self._acc_cache[key]

    @staticmethod
    def _bucket_spatial(spatial: Tuple[int, ...],
                        patch_eff: Tuple[int, ...]) -> Tuple[int, ...]:
        """Round spatial dims up to half-patch multiples so compile count stays
        bounded across volume shapes (patch-eff axes of 1 bucket to steps of 4)."""
        out = []
        for s, p in zip(spatial, patch_eff):
            q = max(4, p // 2)
            out.append(int(-(-s // q) * q))
        return tuple(out)

    # ------------------------------------------------------------------ sliding window
    def predict_sliding_window_return_logits(self, data: np.ndarray,
                                             params=None) -> np.ndarray:
        """data: (c, *spatial) preprocessed numpy. Returns (num_heads, *spatial)."""
        assert self._jit_tile_forward is not None, "predictor not initialized"
        if params is None:
            params = self.list_of_parameters[0]
        patch_size = tuple(self.configuration_manager.patch_size)
        num_heads = self.label_manager.num_segmentation_heads

        data_padded, revert_slicer = pad_nd_image(data, patch_size)
        spatial = data_padded.shape[1:]
        slicers = get_sliding_window_slicers(spatial, patch_size,
                                             self.tile_step_size)
        gaussian = compute_gaussian(patch_size) if self.use_gaussian else \
            np.ones(patch_size, dtype=np.float32)

        if os.environ.get("NNUZOO_HOST_ACCUM", "") == "1":
            logits = self._host_accumulate(data_padded, slicers, gaussian,
                                           params, num_heads)
        else:
            logits = self._device_accumulate(data_padded, slicers, gaussian,
                                             params, num_heads, patch_size)
        if not np.isfinite(logits).all():
            raise RuntimeError("Non-finite values in accumulated logits")
        return logits[(slice(None),) + revert_slicer[1:]] \
            if len(revert_slicer) > 1 else logits[revert_slicer]

    def _device_accumulate(self, data_padded, slicers, gaussian, params,
                           num_heads, patch_size):
        spatial = data_padded.shape[1:]
        dim = len(spatial)
        # effective patch in the full spatial space (2d-on-3d spans one slice)
        patch_eff = ((1,) * (dim - len(patch_size)) + patch_size)
        buf_spatial = self._bucket_spatial(spatial, patch_eff)
        acc, finalize = self._get_acc_fns(buf_spatial, patch_eff, num_heads)

        logits_buf = jnp.zeros((*buf_spatial, num_heads), jnp.float32)
        weights_buf = jnp.zeros((*buf_spatial, 1), jnp.float32)
        g_dev = jnp.asarray(gaussian.reshape(*patch_eff, 1))

        def tile_start(sl):
            # slicer entries after the channel slice: ints (2d-on-3d z) or slices
            out = []
            for s in sl[1:]:
                out.append(s if isinstance(s, int) else s.start)
            return out

        bt = self.tile_batch_size
        for i in range(0, len(slicers), bt):
            batch_slicers = slicers[i:i + bt]
            n_real = len(batch_slicers)
            tiles = np.stack([data_padded[sl] for sl in batch_slicers])
            starts = np.asarray([tile_start(sl) for sl in batch_slicers],
                                dtype=np.int32)
            if n_real < bt:
                reps = bt - n_real
                tiles = np.concatenate([tiles, np.repeat(tiles[-1:], reps, 0)])
                starts = np.concatenate([starts,
                                         np.repeat(starts[-1:], reps, 0)])
            valid = (np.arange(bt) < n_real).astype(np.float32)
            x = jnp.asarray(np.moveaxis(tiles, 1, -1))  # (B, *patch, C)
            preds = self._jit_tile_forward(params, x)   # (B, *patch, H), device
            preds = preds.reshape(preds.shape[0], *patch_eff, num_heads)
            logits_buf, weights_buf = acc(
                logits_buf, weights_buf, preds, g_dev,
                jnp.asarray(starts), jnp.asarray(valid))

        out = np.asarray(finalize(logits_buf, weights_buf))  # one fetch/volume
        out = out[tuple(slice(0, s) for s in spatial)]
        return np.moveaxis(out, -1, 0)  # (H, *spatial)

    def _host_accumulate(self, data_padded, slicers, gaussian, params,
                         num_heads):
        """Round-1 behavior: accumulate in host numpy (debug fallback)."""
        spatial = data_padded.shape[1:]
        logits = np.zeros((num_heads, *spatial), dtype=np.float32)
        weights = np.zeros(spatial, dtype=np.float32)
        bt = self.tile_batch_size
        for i in range(0, len(slicers), bt):
            batch_slicers = slicers[i:i + bt]
            tiles = np.stack([data_padded[sl] for sl in batch_slicers])
            if len(batch_slicers) < bt:
                reps = bt - len(batch_slicers)
                tiles = np.concatenate([tiles, np.repeat(tiles[-1:], reps, 0)])
            x = jnp.asarray(np.moveaxis(tiles, 1, -1))
            preds = np.asarray(self._jit_tile_forward(params, x))
            preds = np.moveaxis(preds, -1, 1)
            for j, sl in enumerate(batch_slicers):
                target_sl = (slice(None),) + sl[1:]
                logits[target_sl] += preds[j] * gaussian
                weights[sl[1:]] += gaussian
        logits /= np.maximum(weights, 1e-8)
        return logits

    def predict_logits_from_preprocessed_data(self, data: np.ndarray) -> np.ndarray:
        """Average logits over folds (reference `:478-513`)."""
        out = None
        for params in self.list_of_parameters:
            pred = self.predict_sliding_window_return_logits(data, params)
            out = pred if out is None else out + pred
        return out / len(self.list_of_parameters)

    # ------------------------------------------------------------------ files
    def predict_from_files(self, list_of_lists_or_source_folder,
                           output_folder_or_list_of_truncated_output_files,
                           save_probabilities: bool = False,
                           overwrite: bool = True,
                           num_parts: int = 1, part_id: int = 0,
                           folder_with_segs_from_prev_stage: Optional[str] = None):
        dataset_json = self.dataset_json
        ending = dataset_json["file_ending"]
        if isinstance(list_of_lists_or_source_folder, str):
            idents = get_identifiers_from_split_dataset_folder(
                list_of_lists_or_source_folder, ending)
            list_of_lists = create_lists_from_split_dataset_folder(
                list_of_lists_or_source_folder, ending, idents)
        else:
            list_of_lists = list_of_lists_or_source_folder
            idents = [os.path.basename(f[0])[:-(len(ending) + 5)]
                      for f in list_of_lists]

        if isinstance(output_folder_or_list_of_truncated_output_files, str):
            out_folder = output_folder_or_list_of_truncated_output_files
            maybe_mkdir(out_folder)
            out_truncated = [join(out_folder, i) for i in idents]
        else:
            out_truncated = output_folder_or_list_of_truncated_output_files
            out_folder = os.path.dirname(out_truncated[0]) if out_truncated else None

        # num_parts striping (reference `:187`)
        list_of_lists = list_of_lists[part_id::num_parts]
        out_truncated = out_truncated[part_id::num_parts]

        if not overwrite:
            keep = [not isfile(o + ending) for o in out_truncated]
            list_of_lists = [l for l, k in zip(list_of_lists, keep) if k]
            out_truncated = [o for o, k in zip(out_truncated, keep) if k]

        if out_folder is not None:
            save_json({"tile_step_size": self.tile_step_size,
                       "use_gaussian": self.use_gaussian,
                       "use_mirroring": self.use_mirroring,
                       "checkpoint_trainer": self.trainer_name},
                      join(out_folder, "predict_from_raw_data_args.json"))

        # pipelined: background thread preprocesses case i+1 while the device runs
        # case i; export also happens off the critical path (reference
        # `data_iterators.py:60-117` + export pool semantics)
        from concurrent.futures import ThreadPoolExecutor
        preprocessor = DefaultPreprocessor(verbose=self.verbose)

        def prep(files):
            return self._preprocess_one(preprocessor, files,
                                        folder_with_segs_from_prev_stage)

        with ThreadPoolExecutor(max_workers=1) as prep_pool, \
                ThreadPoolExecutor(max_workers=2) as export_pool:
            futures = [prep_pool.submit(prep, files) for files in list_of_lists]
            export_futures = []
            for fut, out_trunc in zip(futures, out_truncated):
                data, seg_prev, properties = fut.result()
                logits = self.predict_logits_from_preprocessed_data(data)
                export_futures.append(export_pool.submit(
                    export_prediction_from_logits, logits, properties,
                    self.configuration_manager, self.plans_manager, dataset_json,
                    out_trunc, save_probabilities))
                if self.verbose:
                    print(f"predicted {out_trunc}")
            for ef in export_futures:
                ef.result()

    # ------------------------------------------------------------------ npy APIs
    def predict_single_npy_array(self, input_image: np.ndarray,
                                 image_properties: dict,
                                 segmentation_previous_stage: np.ndarray = None,
                                 output_file_truncated: Optional[str] = None,
                                 save_or_return_probabilities: bool = False):
        """Predict one (c, x, y, z) raw array (reference
        `predict_from_raw_data.py:predict_single_npy_array`)."""
        from ..plans.label_handling import convert_labelmap_to_one_hot
        preprocessor = DefaultPreprocessor(verbose=self.verbose)
        props = dict(image_properties)
        data, seg = preprocessor.run_case_npy(
            input_image,
            segmentation_previous_stage[None].astype(np.int8)
            if segmentation_previous_stage is not None else None,
            props, self.plans_manager, self.configuration_manager,
            self.dataset_json)
        if segmentation_previous_stage is not None and seg is not None:
            onehot = convert_labelmap_to_one_hot(
                seg[0], self.label_manager.foreground_labels, np.float32)
            data = np.vstack([data, onehot])
        logits = self.predict_logits_from_preprocessed_data(data)
        if output_file_truncated is not None:
            export_prediction_from_logits(
                logits, props, self.configuration_manager, self.plans_manager,
                self.dataset_json, output_file_truncated,
                save_or_return_probabilities)
            return None
        from .export import \
            convert_predicted_logits_to_segmentation_with_correct_shape
        ret = convert_predicted_logits_to_segmentation_with_correct_shape(
            logits, self.plans_manager, self.configuration_manager,
            self.label_manager, props,
            return_probabilities=save_or_return_probabilities)
        return ret

    def predict_from_list_of_npy_arrays(self, image_list, segs_prev_stage,
                                        properties_list, truncated_output_files,
                                        save_probabilities: bool = False):
        """Reference `predict_from_raw_data.py:predict_from_list_of_npy_arrays`."""
        if segs_prev_stage is None:
            segs_prev_stage = [None] * len(image_list)
        results = []
        for img, seg_prev, props, out in zip(image_list, segs_prev_stage,
                                             properties_list,
                                             truncated_output_files or
                                             [None] * len(image_list)):
            results.append(self.predict_single_npy_array(
                img, props, seg_prev, out, save_probabilities))
        return results

    def _preprocess_one(self, preprocessor, files, prev_stage_folder):
        """Preprocess one case; with a prev-stage folder the prior-stage
        SEGMENTATION (``ident + file_ending``, reference
        `predict_from_raw_data.py:216` / `data_iterators.py:30-40`) rides
        through ``run_case`` as the seg input — cropped/resampled alongside the
        data — then is one-hot-stacked onto the channels. A ``ident.npz``
        (this repo's trainer ``predicted_next_stage`` format) is accepted as a
        fallback for already-preprocessed-geometry segs."""
        ident = os.path.basename(files[0]).split(".")[0][:-5]
        seg_file = None
        if prev_stage_folder is not None:
            cand = join(prev_stage_folder,
                        ident + self.dataset_json["file_ending"])
            if os.path.isfile(cand):
                seg_file = cand
        data, seg, properties = preprocessor.run_case(
            files, seg_file, self.plans_manager, self.configuration_manager,
            self.dataset_json)
        if prev_stage_folder is not None:
            from ..plans.label_handling import convert_labelmap_to_one_hot
            if seg_file is not None:
                seg_prev = seg[0]
            else:
                seg_prev = np.load(join(prev_stage_folder, ident + ".npz"))["seg"]
            onehot = convert_labelmap_to_one_hot(
                seg_prev, self.label_manager.foreground_labels, np.float32)
            data = np.vstack([data, onehot])
        return data, None, properties
