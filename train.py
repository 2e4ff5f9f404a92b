"""Canonical training wrapper (reference: `/train.py`).

Same flags: ``python train.py --dataset_name Dataset030_AbdomenMR --tr
nnUNetTrainerM2NetP --model 2d --num_epochs 250``. Sets the three data roots
under --base_dir then runs training in-process (the reference shells out to
nnUNetv2_train; also, its -num_epochs/--skip_val flags were not actually
accepted by the entry point — here they work).
"""

import os
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument("--dataset_name", default="Dataset030_AbdomenMR")
    parser.add_argument("--base_dir", default="NNUNET_OUTPUT")
    parser.add_argument("--tr", default="nnUNetTrainer")
    parser.add_argument("--model", default="2d")
    parser.add_argument("--fold", default="0")
    parser.add_argument("--device", type=int, default=0, help="ignored (TPU)")
    parser.add_argument("--num_epochs", type=int, default=250)
    parser.add_argument("--val", action="store_true")
    parser.add_argument("--val_best", action="store_true")
    parser.add_argument("--skip_val", action="store_true")
    parser.add_argument("--c", action="store_true")
    args = parser.parse_args()

    os.makedirs(f"{args.base_dir}/nnunet_results_time", exist_ok=True)
    os.environ["nnUNet_raw"] = f"{args.base_dir}/nnunet_raw"
    os.environ["nnUNet_preprocessed"] = f"{args.base_dir}/nnunet_preprocessed"
    os.environ["nnUNet_results"] = f"{args.base_dir}/nnunet_results_time"

    from nnuzoo_tpu.run.run_training import run_training
    run_training(args.dataset_name, args.model, args.fold, args.tr,
                 num_epochs=args.num_epochs, continue_training=args.c,
                 only_run_validation=args.val, validate_with_best=args.val_best,
                 skip_validation=args.skip_val)


if __name__ == "__main__":
    main()
