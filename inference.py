"""Standalone inference wrapper (reference: `/inference.py`).

``python inference.py --model_path <trained folder> --input <imagesTs> --output
<pred folder>``. Uses checkpoint_best.pth of the given fold, like the reference.
"""

import os
from argparse import ArgumentParser


def main():
    parser = ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--device", default=None, help="ignored (TPU)")
    parser.add_argument("--base_dir", default="./NNUNET_OUTPUT")
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--input_fold", default=0, type=int)
    parser.add_argument("--remove", action="store_true")
    parser.add_argument("--n", default=None, type=int)
    parser.add_argument("--ext", default=".gz", type=str)
    args = parser.parse_args()

    os.environ.setdefault("nnUNet_raw", f"{args.base_dir}/nnunet_raw")
    os.environ.setdefault("nnUNet_preprocessed", f"{args.base_dir}/nnunet_preprocessed")
    os.environ.setdefault("nnUNet_results", f"{args.base_dir}/nnunet_results")

    if args.remove and os.path.isdir(args.output):
        import shutil
        shutil.rmtree(args.output)
    os.makedirs(args.output, exist_ok=True)

    from nnuzoo_tpu.inference.predictor import Predictor
    predictor = Predictor(tile_step_size=0.5, use_gaussian=True,
                          use_mirroring=True)
    predictor.initialize_from_trained_model_folder(
        args.model_path, use_folds=(args.input_fold,),
        checkpoint_name="checkpoint_best.pth")
    predictor.predict_from_files(args.input, args.output, overwrite=False)


if __name__ == "__main__":
    main()
