"""Console-script entry points (reference: `pyproject.toml:64-85` console scripts
``nnUNetv2_*``). Same flags; implementations call our in-process APIs."""

import argparse
import os


def _default_np_for(configurations):
    """Default preprocessing worker count per requested configuration
    (reference uses 8/4/8 for 2d/3d_fullres/3d_lowres)."""
    per_cfg = {"2d": 8, "3d_fullres": 4, "3d_lowres": 8}
    return [per_cfg.get(c, 4) for c in configurations]


def plan_and_preprocess_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_plan_and_preprocess")
    p.add_argument("-d", nargs="+", type=int, required=True, help="dataset ids")
    p.add_argument("-fpe", default="DatasetFingerprintExtractor")
    p.add_argument("-npfp", type=int, default=8)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    p.add_argument("--no_pp", action="store_true",
                   help="plan only, skip preprocessing")
    p.add_argument("--clean", action="store_true")
    p.add_argument("-pl", default="ExperimentPlanner")
    p.add_argument("-gpu_memory_target", type=float, default=8)
    p.add_argument("-preprocessor_name", default="DefaultPreprocessor")
    p.add_argument("-overwrite_target_spacing", nargs="+", type=float, default=None)
    p.add_argument("-overwrite_plans_name", default=None)
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres"])
    p.add_argument("-np", nargs="+", type=int, default=None)
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)

    from ..planning.api import extract_fingerprints, plan_experiments, preprocess
    extract_fingerprints(a.d, a.npfp, a.verify_dataset_integrity, a.clean, a.verbose)
    plan_experiments(a.d, experiment_planner_name=a.pl,
                     gpu_memory_target_in_gb=a.gpu_memory_target,
                     preprocess_class_name=a.preprocessor_name,
                     overwrite_target_spacing=a.overwrite_target_spacing,
                     overwrite_plans_name=a.overwrite_plans_name)
    if not a.no_pp:
        np_ = a.np if a.np is not None else _default_np_for(a.c)
        plans_name = a.overwrite_plans_name or "nnUNetPlans"
        preprocess(a.d, plans_name, configurations=a.c, num_processes=np_,
                   verbose=a.verbose)


def extract_fingerprint_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_extract_fingerprint")
    p.add_argument("-d", nargs="+", type=int, required=True)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--verify_dataset_integrity", action="store_true")
    p.add_argument("--clean", action="store_true")
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)
    from ..planning.api import extract_fingerprints
    extract_fingerprints(a.d, a.np, a.verify_dataset_integrity, a.clean, a.verbose)


def plan_experiment_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_plan_experiment")
    p.add_argument("-d", nargs="+", type=int, required=True)
    p.add_argument("-pl", default="ExperimentPlanner")
    p.add_argument("-gpu_memory_target", type=float, default=8)
    p.add_argument("-preprocessor_name", default="DefaultPreprocessor")
    p.add_argument("-overwrite_target_spacing", nargs="+", type=float, default=None)
    p.add_argument("-overwrite_plans_name", default=None)
    a = p.parse_args(argv)
    from ..planning.api import plan_experiments
    plan_experiments(a.d, experiment_planner_name=a.pl,
                     gpu_memory_target_in_gb=a.gpu_memory_target,
                     preprocess_class_name=a.preprocessor_name,
                     overwrite_target_spacing=a.overwrite_target_spacing,
                     overwrite_plans_name=a.overwrite_plans_name)


def preprocess_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_preprocess")
    p.add_argument("-d", nargs="+", type=int, required=True)
    p.add_argument("-plans_name", default="nnUNetPlans")
    p.add_argument("-c", nargs="+", default=["2d", "3d_fullres", "3d_lowres"])
    p.add_argument("-np", nargs="+", type=int, default=None)
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)
    from ..planning.api import preprocess
    np_ = a.np if a.np is not None else _default_np_for(a.c)
    preprocess(a.d, a.plans_name, configurations=a.c, num_processes=np_,
               verbose=a.verbose)


def train_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_train")
    p.add_argument("dataset_name_or_id")
    p.add_argument("configuration")
    p.add_argument("fold")
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-num_epochs", type=int, default=None)
    p.add_argument("--c", action="store_true", dest="continue_training")
    p.add_argument("--val", action="store_true", help="validation only")
    p.add_argument("--val_best", action="store_true")
    p.add_argument("--skip_val", action="store_true")
    p.add_argument("--npz", action="store_true",
                   help="export validation softmax probabilities")
    p.add_argument("-device", default=None, help="ignored (TPU-native)")
    p.add_argument("-num_gpus", type=int, default=1, help="ignored: all local "
                   "devices are used via the mesh")
    a = p.parse_args(argv)
    from ..run.run_training import run_training
    run_training(a.dataset_name_or_id, a.configuration, a.fold, a.tr, a.p,
                 num_epochs=a.num_epochs, continue_training=a.continue_training,
                 only_run_validation=a.val, validate_with_best=a.val_best,
                 skip_validation=a.skip_val,
                 export_validation_probabilities=a.npz)


def predict_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_predict")
    p.add_argument("-i", required=True, help="input folder")
    p.add_argument("-o", required=True, help="output folder")
    p.add_argument("-d", required=True, help="dataset name or id")
    p.add_argument("-c", required=True, help="configuration")
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", default=(0, 1, 2, 3, 4))
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("-chk", default="checkpoint_final.pth")
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--continue_prediction", action="store_true")
    p.add_argument("-npp", type=int, default=3)
    p.add_argument("-nps", type=int, default=3)
    p.add_argument("-prev_stage_predictions", default=None)
    p.add_argument("-num_parts", type=int, default=1)
    p.add_argument("-part_id", type=int, default=0)
    p.add_argument("-device", default=None, help="ignored (TPU-native)")
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)

    from ..inference.predictor import Predictor
    from ..utilities.dataset_name_id import maybe_convert_to_dataset_name
    from ..utilities.file_path_utilities import get_output_folder
    model_folder = get_output_folder(maybe_convert_to_dataset_name(a.d), a.tr,
                                     a.p, a.c)
    predictor = Predictor(tile_step_size=a.step_size, use_gaussian=True,
                          use_mirroring=not a.disable_tta, verbose=a.verbose)
    predictor.initialize_from_trained_model_folder(model_folder, a.f, a.chk)
    predictor.predict_from_files(a.i, a.o, save_probabilities=a.save_probabilities,
                                 overwrite=not a.continue_prediction,
                                 num_parts=a.num_parts, part_id=a.part_id,
                                 folder_with_segs_from_prev_stage=
                                 a.prev_stage_predictions)


def evaluate_folder_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_evaluate_folder")
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-djfile", required=True, help="dataset.json path")
    p.add_argument("-pfile", required=True, help="plans.json path")
    p.add_argument("-o", default=None, help="output summary json")
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--chill", action="store_true")
    a = p.parse_args(argv)

    from ..evaluation.metrics import (compute_metrics_on_folder,
                                      compute_metrics_on_folder_reg)
    from ..plans.plans_handler import PlansManager
    from ..utilities.io import join, load_json
    dataset_json = load_json(a.djfile)
    plans_manager = PlansManager(load_json(a.pfile))
    rw = plans_manager.image_reader_writer_class()
    out_file = a.o if a.o else join(a.pred_folder, "summary.json")
    target_type = dataset_json.get("target_type", "segmentation")
    if target_type == "translation":
        compute_metrics_on_folder_reg(a.gt_folder, a.pred_folder, out_file, rw,
                                      dataset_json["file_ending"], a.np)
    else:
        lm = plans_manager.get_label_manager(dataset_json)
        compute_metrics_on_folder(
            a.gt_folder, a.pred_folder, out_file, rw, dataset_json["file_ending"],
            lm.foreground_regions if lm.has_regions else lm.foreground_labels,
            lm.ignore_label, a.np, chill=True)
    print(f"summary written to {out_file}")


def evaluate_simple_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_evaluate_simple")
    p.add_argument("gt_folder")
    p.add_argument("pred_folder")
    p.add_argument("-l", nargs="+", type=int, required=True, help="labels")
    p.add_argument("-il", type=int, default=None, help="ignore label")
    p.add_argument("-o", default=None)
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(argv)
    from ..evaluation.metrics import compute_metrics_on_folder_simple
    compute_metrics_on_folder_simple(a.gt_folder, a.pred_folder, a.l, a.o, a.np,
                                     a.il)


def find_best_configuration_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_find_best_configuration")
    p.add_argument("dataset_name_or_id")
    p.add_argument("-p", nargs="+", default=["nnUNetPlans"])
    p.add_argument("-c", nargs="+",
                   default=["2d", "3d_fullres", "3d_lowres", "3d_cascade_fullres"])
    p.add_argument("-tr", nargs="+", default=["nnUNetTrainer"])
    p.add_argument("-np", type=int, default=4)
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    p.add_argument("--disable_ensembling", action="store_true")
    p.add_argument("--no_overwrite", action="store_true")
    a = p.parse_args(argv)
    from ..evaluation.find_best_configuration import find_best_configuration
    models = [{"plans": pl, "configuration": c, "trainer": tr}
              for pl in a.p for c in a.c for tr in a.tr]
    find_best_configuration(a.dataset_name_or_id, models,
                            allow_ensembling=not a.disable_ensembling,
                            num_processes=a.np, overwrite=not a.no_overwrite,
                            folds=a.f)


def determine_postprocessing_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_determine_postprocessing")
    p.add_argument("-i", required=True, help="prediction folder")
    p.add_argument("-ref", required=True, help="reference (gt) folder")
    p.add_argument("-plans_json", required=True)
    p.add_argument("-dataset_json", required=True)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--remove_postprocessed", action="store_true")
    a = p.parse_args(argv)
    from ..postprocessing.connected_components import determine_postprocessing
    determine_postprocessing(a.i, a.ref, a.plans_json, a.dataset_json, a.np,
                             keep_postprocessed_files=not a.remove_postprocessed)


def apply_postprocessing_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_apply_postprocessing")
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-pp_pkl_file", required=True)
    p.add_argument("-plans_json", required=True)
    p.add_argument("-dataset_json", required=True)
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(argv)
    from ..postprocessing.connected_components import \
        apply_postprocessing_to_folder
    from ..plans.plans_handler import PlansManager
    from ..utilities.io import load_json, load_pickle
    pp_fns, pp_kwargs = load_pickle(a.pp_pkl_file)
    apply_postprocessing_to_folder(a.i, a.o, pp_fns, pp_kwargs,
                                   PlansManager(load_json(a.plans_json)),
                                   load_json(a.dataset_json), a.np)


def ensemble_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_ensemble")
    p.add_argument("-i", nargs="+", required=True, help="input folders")
    p.add_argument("-o", required=True)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("--save_npz", action="store_true")
    a = p.parse_args(argv)
    from ..ensembling.ensemble import ensemble_folders
    ensemble_folders(a.i, a.o, save_merged_probabilities=a.save_npz,
                     num_processes=a.np)


def export_model_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_export_model_to_zip")
    p.add_argument("-d", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-c", nargs="+",
                   default=["2d", "3d_fullres", "3d_lowres", "3d_cascade_fullres"])
    p.add_argument("-tr", default="nnUNetTrainer")
    p.add_argument("-p", default="nnUNetPlans")
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    p.add_argument("-chk", nargs="+", default=["checkpoint_final.pth"])
    p.add_argument("--not_strict", action="store_true")
    p.add_argument("--exp_cv_preds", action="store_true")
    a = p.parse_args(argv)
    from ..model_sharing.model_export import export_pretrained_model
    export_pretrained_model(a.d, a.o, a.c, a.tr, a.p, a.f,
                            strict=not a.not_strict, save_checkpoints=a.chk,
                            export_crossval_predictions=a.exp_cv_preds)


def install_model_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_install_pretrained_model_from_zip")
    p.add_argument("zip_file")
    a = p.parse_args(argv)
    from ..model_sharing.model_export import install_model_from_zip_file
    install_model_from_zip_file(a.zip_file)


def convert_msd_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_convert_MSD_dataset")
    p.add_argument("-i", required=True, help="MSD task folder")
    p.add_argument("-overwrite_id", type=int, default=None)
    p.add_argument("-np", type=int, default=8)
    a = p.parse_args(argv)
    from ..dataset_conversion.convert_msd import convert_msd_dataset
    convert_msd_dataset(a.i, a.overwrite_id, a.np)


def plot_overlay_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_plot_overlay_pngs")
    p.add_argument("-d", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-np", type=int, default=8)
    p.add_argument("-channel_idx", type=int, default=0)
    p.add_argument("--use_raw", action="store_true")
    a = p.parse_args(argv)
    from ..utilities.overlay_plots import generate_overlays_for_dataset
    generate_overlays_for_dataset(a.d, a.o, a.channel_idx, a.np)


def predict_from_modelfolder_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_predict_from_modelfolder")
    p.add_argument("-i", required=True)
    p.add_argument("-o", required=True)
    p.add_argument("-m", required=True, help="trained model folder")
    p.add_argument("-f", nargs="+", default=None)
    p.add_argument("-step_size", type=float, default=0.5)
    p.add_argument("-chk", default="checkpoint_final.pth")
    p.add_argument("--disable_tta", action="store_true")
    p.add_argument("--save_probabilities", action="store_true")
    p.add_argument("--continue_prediction", action="store_true")
    p.add_argument("-num_parts", type=int, default=1)
    p.add_argument("-part_id", type=int, default=0)
    p.add_argument("-prev_stage_predictions", default=None)
    p.add_argument("--verbose", action="store_true")
    a = p.parse_args(argv)
    from ..inference.predictor import Predictor
    predictor = Predictor(tile_step_size=a.step_size, use_gaussian=True,
                          use_mirroring=not a.disable_tta, verbose=a.verbose)
    predictor.initialize_from_trained_model_folder(a.m, a.f, a.chk)
    predictor.predict_from_files(a.i, a.o, save_probabilities=a.save_probabilities,
                                 overwrite=not a.continue_prediction,
                                 num_parts=a.num_parts, part_id=a.part_id,
                                 folder_with_segs_from_prev_stage=
                                 a.prev_stage_predictions)


def convert_old_nnunet_dataset_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_convert_old_nnUNet_dataset")
    p.add_argument("input_folder",
                   help="path to the old TaskXXX_YYY raw folder (with "
                        "imagesTr/labelsTr etc)")
    p.add_argument("output_dataset_name",
                   help="new dataset NAME following DatasetXXX_NAME")
    a = p.parse_args(argv)
    from ..dataset_conversion.more_datasets import convert_old_nnunet_dataset
    convert_old_nnunet_dataset(a.input_folder, a.output_dataset_name)


def accumulate_crossval_results_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_accumulate_crossval_results")
    p.add_argument("trained_model_folder",
                   help="Trainer__Plans__config results folder")
    p.add_argument("-o", default=None,
                   help="merged output folder (default: "
                        "<model folder>/crossval_results_folds_...)")
    p.add_argument("-f", nargs="+", type=int, default=(0, 1, 2, 3, 4))
    a = p.parse_args(argv)
    from ..evaluation.find_best_configuration import accumulate_cv_results
    from ..utilities.file_path_utilities import folds_tuple_to_string
    from ..utilities.io import join
    out = a.o or join(a.trained_model_folder,
                      f"crossval_results_folds_{folds_tuple_to_string(a.f)}")
    accumulate_cv_results(a.trained_model_folder, out, a.f)


def download_model_by_url_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_download_pretrained_model_by_url")
    p.add_argument("url", help="URL of a model zip exported with "
                               "nnUNetv2_export_model_to_zip")
    a = p.parse_args(argv)
    from ..model_sharing.download import download_and_install_from_url
    download_and_install_from_url(a.url)


def move_plans_between_datasets_entry(argv=None):
    p = argparse.ArgumentParser("nnUNetv2_move_plans_between_datasets")
    p.add_argument("-s", required=True, help="source dataset name or id")
    p.add_argument("-t", required=True, help="target dataset name or id")
    p.add_argument("-sp", required=True, help="source plans identifier")
    p.add_argument("-tp", default=None, help="target plans identifier "
                   "(default: keep the source identifier)")
    a = p.parse_args(argv)
    from ..planning.plans_editing import move_plans_between_datasets
    move_plans_between_datasets(a.s, a.t, a.sp, a.tp)
