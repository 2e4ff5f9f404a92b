"""Cascade pipeline test: 3d_lowres train -> next-stage export -> cascade train
with prev-stage one-hot input channels."""

import os
from dataclasses import replace

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from .helpers import make_synthetic_dataset, set_paths


def test_lowres_then_cascade(tmp_path):
    raw, pp, res = set_paths(tmp_path)
    make_synthetic_dataset(raw, num_cases=5, shape=(24, 28, 20))
    from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                         preprocess)
    from nnuzoo_tpu.planning.plans_editing import add_lowres_and_cascade
    from nnuzoo_tpu.utilities.io import join, load_json, save_json

    extract_fingerprints([999], num_processes=1)
    plan_experiments([999])
    plans = add_lowres_and_cascade(999)
    # shrink for speed
    plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
    plans = load_json(plans_file)
    for name in ("3d_fullres", "3d_lowres"):
        plans["configurations"][name]["patch_size"] = [16, 16, 16]
        plans["configurations"][name]["batch_size"] = 2
    save_json(plans, plans_file, sort_keys=False)
    preprocess([999], configurations=("3d_fullres", "3d_lowres"),
               num_processes=(1, 1))

    from nnuzoo_tpu.training.trainer import Trainer
    dataset_json = load_json(join(pp, "Dataset999_Synth", "dataset.json"))
    plans = load_json(plans_file)

    # train lowres with final validation (exports next-stage predictions)
    tr_low = Trainer(plans, "3d_lowres", fold=0, dataset_json=dataset_json)
    tr_low.config = replace(tr_low.config, num_epochs=1,
                            num_iterations_per_epoch=2,
                            num_val_iterations_per_epoch=1)
    tr_low.run_training()
    tr_low.perform_actual_validation()

    next_stage_dir = join(pp, "Dataset999_Synth", "predicted_next_stage",
                          "3d_cascade_fullres")
    assert os.path.isdir(next_stage_dir)
    npzs = [f for f in os.listdir(next_stage_dir) if f.endswith(".npz")]
    assert len(npzs) >= 1  # at least the val fold cases

    # cascade needs prev-stage predictions for ALL training cases; for the test,
    # validate on fold 'all' is overkill -- instead synthesize missing ones
    from nnuzoo_tpu.data.dataset import DatasetNumpy
    ds = DatasetNumpy(join(pp, "Dataset999_Synth", "nnUNetPlans_3d_fullres"))
    for k in ds.identifiers:
        f = join(next_stage_dir, k + ".npz")
        if not os.path.isfile(f):
            seg_shape = ds.load_case(k)[0].shape[1:]
            np.savez_compressed(f, seg=np.zeros(seg_shape, dtype=np.uint8))

    tr_cas = Trainer(plans, "3d_cascade_fullres", fold=0,
                     dataset_json=dataset_json)
    assert tr_cas.num_input_channels == 1 + 2  # image + 2 fg one-hot channels
    tr_cas.config = replace(tr_cas.config, num_epochs=1,
                            num_iterations_per_epoch=2,
                            num_val_iterations_per_epoch=1)
    tr_cas.run_training()
    assert os.path.isfile(join(tr_cas.output_folder, "checkpoint_final.pth"))
    losses = tr_cas.logger.my_fantastic_logging["train_losses"]
    assert np.isfinite(losses).all()


class TestCascadeNoise:
    """Jit morphology parity for the cascade one-hot noise (reference
    `cascade_transforms.py`)."""

    def test_ball_morphology_matches_scipy(self):
        import jax
        import jax.numpy as jnp
        from scipy import ndimage
        from nnuzoo_tpu.data.augment import _ball_mask, _dilate, _erode

        rng = np.random.RandomState(0)
        x = (rng.rand(24, 24) > 0.7).astype(np.float32)
        for r in (1.0, 2.5, 4.0):
            k = np.asarray(_ball_mask(r, 8, 2))
            dil = np.asarray(_dilate(jnp.asarray(x), jnp.asarray(k)))
            ero = np.asarray(_erode(jnp.asarray(x), jnp.asarray(k)))
            ref_dil = ndimage.binary_dilation(x > 0, structure=k > 0)
            ref_ero = ndimage.binary_erosion(x > 0, structure=k > 0)
            np.testing.assert_array_equal(dil > 0, ref_dil)
            np.testing.assert_array_equal(ero > 0, ref_ero)

    def test_remove_random_component(self):
        import jax
        import jax.numpy as jnp
        from nnuzoo_tpu.data.augment import _remove_random_component

        x = np.zeros((32, 32), np.float32)
        x[2:6, 2:6] = 1          # small component (16 voxels, 1.6%)
        x[20:30, 20:30] = 1      # bigger component
        removed_any = False
        for seed in range(6):
            out = np.asarray(_remove_random_component(
                jax.random.PRNGKey(seed), jnp.asarray(x)))
            # exactly one component removed, the other intact
            a_gone = out[2:6, 2:6].sum() == 0
            b_gone = out[20:30, 20:30].sum() == 0
            assert a_gone != b_gone
            removed_any = True
        assert removed_any
        # a component covering > 15% of the volume is never removed
        big = np.zeros((16, 16), np.float32)
        big[2:14, 2:14] = 1
        out = np.asarray(_remove_random_component(
            jax.random.PRNGKey(0), jnp.asarray(big)))
        np.testing.assert_array_equal(out, big)
        # empty channel is a no-op (no NaNs from the categorical)
        empty = np.zeros((8, 8), np.float32)
        out = np.asarray(_remove_random_component(
            jax.random.PRNGKey(0), jnp.asarray(empty)))
        np.testing.assert_array_equal(out, empty)

    def test_remove_component_exact_beyond_radius_24(self):
        """The flood fill must be EXACT (fixpoint while_loop), not truncated at
        a fixed iteration budget: a serpentine component with geodesic radius
        ~200 must be removed whole, matching scipy's exact labeling."""
        import jax
        import jax.numpy as jnp
        from scipy import ndimage
        from nnuzoo_tpu.data.augment import _remove_random_component

        x = np.zeros((96, 96), np.float32)
        for i, row in enumerate(range(1, 95, 8)):  # snake: long thin path
            x[row, 1:95] = 1
            if row + 8 < 96:
                x[row:row + 9, 94 if i % 2 == 0 else 1] = 1
        n_fg = x.sum()
        assert n_fg < 0.15 * x.size  # below the size guard
        labeled, n = ndimage.label(x > 0, structure=np.ones((3, 3)))
        assert n == 1  # single component, so any random seed lands inside it
        out = np.asarray(_remove_random_component(
            jax.random.PRNGKey(0), jnp.asarray(x)))
        np.testing.assert_array_equal(out, np.zeros_like(x))

    def test_onehot_noise_stays_onehot(self):
        import jax
        import jax.numpy as jnp
        from nnuzoo_tpu.data.augment import (AugmentConfig,
                                             _cascade_onehot_noise)

        rng = np.random.RandomState(0)
        prev = rng.randint(0, 3, (40, 40))
        onehot = np.stack([(prev == l).astype(np.float32) for l in (1, 2)])
        cfg = AugmentConfig(patch_size=(40, 40), initial_patch_size=(40, 40),
                            rotation=0.0, is_cascaded=True,
                            foreground_labels=(1, 2),
                            p_cascade_binary_op=1.0,
                            p_cascade_remove_component=1.0)
        changed = False
        for seed in range(4):
            out = np.asarray(_cascade_onehot_noise(
                cfg, jax.random.PRNGKey(seed), jnp.asarray(onehot)))
            assert set(np.unique(out)) <= {0.0, 1.0}
            # one-hot invariant: channels never overlap
            assert (out.sum(0) <= 1.0 + 1e-6).all()
            changed |= not np.array_equal(out, onehot)
        assert changed  # with p=1 the morphology must actually do something
