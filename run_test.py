"""Test-set inference + evaluation wrapper (reference: `/run_test.py`).

``python run_test.py --dataset_name Dataset030_AbdomenMR --model_name M2Net``
predicts imagesTs with nnUNetTrainer<model_name>__nnUNetPlans__2d and evaluates
against labelsTs into test_summary.json (cell-instance metric for
Dataset032_NeurlPSCell).
"""

import os
import sys
from argparse import ArgumentParser
from os.path import join


def main():
    parser = ArgumentParser()
    parser.add_argument("--dataset_name", default="Dataset030_AbdomenMR")
    parser.add_argument("--model_name", default="M2Net")
    parser.add_argument("--base_dir", default="./NNUNET_OUTPUT")
    parser.add_argument("--model", default="2d", help="configuration")
    parser.add_argument("--device", type=int, default=0, help="ignored (TPU)")
    args = parser.parse_args()

    nnunet_raw = f"{args.base_dir}/nnunet_raw"
    nnunet_results = f"{args.base_dir}/nnunet_results"
    os.environ.setdefault("nnUNet_raw", nnunet_raw)
    os.environ.setdefault("nnUNet_preprocessed", f"{args.base_dir}/nnunet_preprocessed")
    os.environ.setdefault("nnUNet_results", nnunet_results)

    trainer_suffix = {"nnUNetTrainer": ""}.get(args.model_name, args.model_name)
    trainer__ = "nnUNetTrainer" + trainer_suffix
    model_path = join(nnunet_results, args.dataset_name,
                      f"{trainer__}__nnUNetPlans__{args.model}")
    input_path = join(nnunet_raw, args.dataset_name, "imagesTs")
    output_path = join(nnunet_raw, args.dataset_name,
                       f"imagesTs_{args.model_name}_Pred")
    os.makedirs(output_path, exist_ok=True)

    from nnuzoo_tpu.inference.predictor import Predictor
    predictor = Predictor(tile_step_size=0.5, use_gaussian=True, use_mirroring=True)
    predictor.initialize_from_trained_model_folder(
        model_path, use_folds=(0,), checkpoint_name="checkpoint_best.pth")
    predictor.predict_from_files(input_path, output_path, overwrite=False)

    input_lbl_path = join(nnunet_raw, args.dataset_name, "labelsTs")
    summary_path = join(model_path, "test_summary.json")
    if args.dataset_name == "Dataset032_NeurlPSCell":
        from compute_cell_metric import compute_cell_metrics
        compute_cell_metrics(input_lbl_path, output_path, summary_path)
    else:
        from nnuzoo_tpu.cli.entry_points import evaluate_folder_entry
        evaluate_folder_entry([input_lbl_path, output_path,
                               "-djfile", join(model_path, "dataset.json"),
                               "-pfile", join(model_path, "plans.json"),
                               "-o", summary_path])
    print(f"[INFO] FINISHED {args.model_name} on {args.dataset_name}")


if __name__ == "__main__":
    main()
