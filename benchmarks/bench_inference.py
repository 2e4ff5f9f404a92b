"""End-to-end inference throughput on canonical AbdomenMR-shaped volumes.

Measures the FULL pipeline — preprocessing (crop/normalize/resample), sliding-
window prediction with gaussian weighting + mirror TTA, and export (invert
resample/crop, argmax to segmentation) — on synthetic volumes shaped like the
reference's AbdomenMR 2d configuration processes them: ~40 x 224 x 256 voxels,
2d patch 256x224 slid per-slice (the reference predicts 2d configs slice-wise,
`nnunetv2/inference/predict_from_raw_data.py`). Prints one JSON line:
{"metric": "inference_vols_per_min_40x224x256", ...}.

Usage: python benchmarks/bench_inference.py [n_volumes] [--no-mirror]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _common  # noqa: F401,E402  (persistent compile cache)


def main():
    n_vols = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    mirror = "--no-mirror" not in sys.argv

    from nnuzoo_tpu.inference.predictor import Predictor
    from nnuzoo_tpu.plans.plans_handler import PlansManager

    import jax

    patch = (256, 224)
    plans = {
        "dataset_name": "Dataset999_BenchAbdomenMR", "plans_name": "nnUNetPlans",
        "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
        "image_reader_writer": "NiftiIO",
        "configurations": {"2d": {
            "data_identifier": "nnUNetPlans_2d", "batch_size": 12,
            "patch_size": list(patch), "spacing": [1.0, 1.0],
            "normalization_schemes": ["ZScoreNormalization"],
            "use_mask_for_norm": [False], "batch_dice": True,
            "resampling_fn_data": "resample_data_or_seg_to_shape",
            "resampling_fn_data_kwargs": {"is_seg": False, "order": 3,
                                          "order_z": 0,
                                          "force_separate_z": None},
            "resampling_fn_seg": "resample_data_or_seg_to_shape",
            "resampling_fn_seg_kwargs": {"is_seg": True, "order": 1,
                                         "order_z": 0,
                                         "force_separate_z": None},
            "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
            "resampling_fn_probabilities_kwargs": {"is_seg": False, "order": 1,
                                                   "order_z": 0,
                                                   "force_separate_z": None},
            "architecture": {
                "network_class_name": "PlainConvUNet",
                "arch_kwargs": {
                    "n_stages": 5,
                    "features_per_stage": [32, 64, 128, 256, 512],
                    "kernel_sizes": [[3, 3]] * 5,
                    "strides": [[1, 1]] + [[2, 2]] * 4,
                    "n_conv_per_stage": [2] * 5,
                    "n_conv_per_stage_decoder": [2] * 4,
                }}}},
    }
    dataset_json = {"channel_names": {"0": "MRI"},
                    "labels": {"background": 0, "organ": 1, "tumor": 2},
                    "numTraining": 10, "file_ending": ".nii.gz"}
    pm = PlansManager(plans)
    cfg = pm.get_configuration("2d")

    from nnuzoo_tpu.models.registry import get_model_builder
    model = get_model_builder("nnUNetTrainerM2NetP")(
        pm, dataset_json, cfg, 1, deep_supervision=False)

    import jax.numpy as jnp
    x0 = jnp.zeros((1, *patch, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    pred = Predictor(tile_step_size=0.5, use_gaussian=True,
                     use_mirroring=mirror)
    pred.manual_initialization(
        model, [params], pm, cfg, dataset_json,
        trainer_name="nnUNetTrainerM2NetP",
        inference_allowed_mirroring_axes=(0, 1) if mirror else None)

    # canonical AbdomenMR-ish volumes: ~40 slices of 224x256, spacing
    # (3.0, 1.0, 1.0) resampled to the plans' in-plane (1.0, 1.0)
    rng = np.random.RandomState(0)
    vols = [rng.rand(1, 40, 224, 256).astype(np.float32) for _ in range(n_vols)]
    props = [{"spacing": [3.0, 1.0, 1.0]} for _ in range(n_vols)]

    # warmup: one volume end-to-end (compiles every tile bucket)
    _ = pred.predict_from_list_of_npy_arrays(vols[:1], None, props[:1], None,
                                             save_probabilities=False)

    t0 = time.time()
    out = pred.predict_from_list_of_npy_arrays(vols, None, props, None,
                                               save_probabilities=False)
    dt = time.time() - t0
    assert len(out) == n_vols and all(o.shape == (40, 224, 256) for o in out)

    vpm = n_vols / dt * 60.0
    print(json.dumps({
        "metric": "e2e_inference_vols_per_min_40x224x256_M2NetP"
                  + ("_mirrorTTA" if mirror else ""),
        "value": round(vpm, 2), "unit": "vols/min",
        "n_volumes": n_vols, "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    main()
