"""target_type=translation: regression training path (reference trainer hooks
`nnUNetTrainer.py:114,1491-1516`, `evaluate_predictions.py:147-268`)."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import set_paths


def test_translation_training(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    from nnuzoo_tpu.imageio.nifti import write_nifti
    from nnuzoo_tpu.utilities.io import join, load_json, maybe_mkdir, save_json

    rng = np.random.RandomState(0)
    root = join(raw, "Dataset999_Synth")
    maybe_mkdir(join(root, "imagesTr"))
    maybe_mkdir(join(root, "labelsTr"))
    for i in range(4):
        vol = rng.rand(24, 24, 12).astype(np.float32) * 50 + 10
        vol[:2] = 0
        target = (vol * 2 + 5).astype(np.float32)  # learnable mapping
        write_nifti(join(root, "imagesTr", f"c{i:02d}_0000.nii.gz"), vol, (1, 1, 1))
        write_nifti(join(root, "labelsTr", f"c{i:02d}.nii.gz"), target, (1, 1, 1))
    save_json({"channel_names": {"0": "CT"},
               "labels": {"background": 0, "out": 1},
               "numTraining": 4, "file_ending": ".nii.gz",
               "target_type": "translation"}, join(root, "dataset.json"))

    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
    plans = load_json(plans_file)
    plans["configurations"]["3d_fullres"]["patch_size"] = [16, 16, 16]
    plans["configurations"]["3d_fullres"]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess([999], configurations=("3d_fullres",), num_processes=(1,))

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    trainer = Trainer(plans, "3d_fullres", fold=0, dataset_json=dataset_json)
    assert trainer.target_type == "translation"
    assert trainer.label_manager.num_segmentation_heads == 1  # heads - 1
    trainer.config = replace(trainer.config, num_epochs=2,
                             num_iterations_per_epoch=4,
                             num_val_iterations_per_epoch=2)
    trainer.run_training()
    losses = trainer.logger.my_fantastic_logging["train_losses"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # MSE decreases on the linear mapping


class TestRegressionMetrics:
    """Golden tests for the translation-target metrics (reference
    `evaluate_predictions.py:63-171`: SSIM/PSNR reported lower-better,
    APE/PE with a 0.05 lower clip)."""

    def test_ssim_constant_shift_closed_form(self):
        from nnuzoo_tpu.evaluation.metrics import structural_similarity
        ref = np.full((32, 32), 0.5)
        pred = np.full((32, 32), 0.7)
        # zero variance/covariance: ssim = (2*mu_p*mu_r + c1)/(mu_p^2+mu_r^2+c1)
        c1 = 0.01 ** 2
        expect = (2 * 0.5 * 0.7 + c1) / (0.5 ** 2 + 0.7 ** 2 + c1)
        assert abs(structural_similarity(pred, ref) - expect) < 1e-12
        assert abs(structural_similarity(ref, ref) - 1.0) < 1e-12

    def test_ssim_matches_bruteforce_windows(self):
        """Separable valid-mode filtering == direct per-window gaussian SSIM."""
        from nnuzoo_tpu.evaluation.metrics import (structural_similarity,
                                                   _gaussian_kernel1d)
        rng = np.random.RandomState(0)
        ref = rng.rand(20, 18)
        pred = np.clip(ref + rng.randn(20, 18) * 0.1, 0, 1)
        k1d = _gaussian_kernel1d(1.5, 5)
        w = np.outer(k1d, k1d)
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        vals = []
        for i in range(20 - 10):
            for j in range(18 - 10):
                p = pred[i:i + 11, j:j + 11]
                r = ref[i:i + 11, j:j + 11]
                mp, mr = (w * p).sum(), (w * r).sum()
                vp = (w * p * p).sum() - mp ** 2
                vr = (w * r * r).sum() - mr ** 2
                cov = (w * p * r).sum() - mp * mr
                vals.append(((2 * mp * mr + c1) * (2 * cov + c2)) /
                            ((mp ** 2 + mr ** 2 + c1) * (vp + vr + c2)))
        assert abs(structural_similarity(pred, ref) - np.mean(vals)) < 1e-10

    def test_compute_metrics_reg_conventions(self, tmp_path):
        from nnuzoo_tpu.evaluation.metrics import compute_metrics_reg
        from nnuzoo_tpu.imageio.nifti import NiftiIO, write_nifti
        from nnuzoo_tpu.utilities.io import join
        rng = np.random.RandomState(1)
        ref = rng.rand(16, 16, 8).astype(np.float32) + 0.5
        pred = (ref + rng.randn(16, 16, 8).astype(np.float32) * 0.05)
        write_nifti(join(str(tmp_path), "ref.nii.gz"), ref, (1, 1, 1))
        write_nifti(join(str(tmp_path), "pred.nii.gz"), pred, (1, 1, 1))
        out = compute_metrics_reg(join(str(tmp_path), "ref.nii.gz"),
                                  join(str(tmp_path), "pred.nii.gz"), NiftiIO())
        m = out["metrics"]
        for key in ("MSE", "MAE", "PSNR", "SSIM", "APE", "PE"):
            assert key in m and np.isfinite(m[key])
        # SSIM is reported lower-better: 1 - ssim, in (0, 1) for noisy pred
        assert 0 < m["SSIM"] < 1
        # PSNR lower-better: 100 - psnr(max_val=ref.max())
        r64, p64 = ref.astype(np.float64), pred.astype(np.float64)
        mse = np.mean((r64 - p64) ** 2)
        psnr = 10 * np.log10(float(r64.max()) ** 2 / mse)
        assert abs(m["PSNR"] - (100 - psnr)) < 1e-6
        assert abs(m["MSE"] - mse) < 1e-9
        # APE/PE: 0.05 lower clip on both images, percent units
        rc, pc = np.clip(r64, 0.05, None), np.clip(p64, 0.05, None)
        re_map = (pc - rc) / rc * 100
        assert abs(m["PE"] - np.mean(re_map)) < 1e-6
        assert abs(m["APE"] - np.mean(np.abs(re_map))) < 1e-6
