import numpy as np
import pytest

from nnuzoo_tpu.plans.label_handling import (LabelManager, convert_labelmap_to_one_hot,
                                             determine_num_input_channels)
from nnuzoo_tpu.plans.plans_handler import PlansManager
from nnuzoo_tpu.utilities.crossval import generate_crossval_split


class TestLabelManager:
    def test_plain_labels(self):
        lm = LabelManager({"background": 0, "kidney": 1, "tumor": 2}, None)
        assert not lm.has_regions
        assert not lm.has_ignore_label
        assert lm.all_labels == [0, 1, 2]
        assert lm.foreground_labels == [1, 2]
        assert lm.num_segmentation_heads == 3

    def test_regions(self):
        lm = LabelManager({"background": 0, "whole": (1, 2, 3), "core": (2, 3), "enh": 3},
                          regions_class_order=(1, 2, 3))
        assert lm.has_regions
        assert lm.all_regions == [(1, 2, 3), (2, 3), 3]
        assert lm.num_segmentation_heads == 3

    def test_ignore_label(self):
        lm = LabelManager({"background": 0, "fg": 1, "ignore": 2}, None)
        assert lm.has_ignore_label and lm.ignore_label == 2
        assert lm.all_labels == [0, 1]

    def test_ignore_label_must_be_highest(self):
        with pytest.raises(AssertionError):
            LabelManager({"background": 0, "ignore": 1, "fg": 2}, None)

    def test_background_required(self):
        with pytest.raises(RuntimeError):
            LabelManager({"fg": 1}, None)

    def test_softmax_probs_to_seg(self):
        lm = LabelManager({"background": 0, "a": 1}, None)
        logits = np.zeros((2, 4, 4, 4), dtype=np.float32)
        logits[1, :2] = 5.0
        probs = lm.apply_inference_nonlin(logits)
        assert np.allclose(probs.sum(0), 1.0, atol=1e-5)
        seg = lm.convert_probabilities_to_segmentation(probs)
        assert (seg[:2] == 1).all() and (seg[2:] == 0).all()

    def test_region_probs_to_seg(self):
        lm = LabelManager({"background": 0, "whole": (1, 2), "core": 2},
                          regions_class_order=(1, 2))
        probs = np.zeros((2, 3, 3, 3), dtype=np.float32)
        probs[0, :2] = 0.9  # whole
        probs[1, :1] = 0.9  # core overwrites
        seg = lm.convert_probabilities_to_segmentation(probs)
        assert (seg[0] == 2).all() and (seg[1] == 1).all() and (seg[2] == 0).all()

    def test_one_hot(self):
        seg = np.array([[0, 1], [2, 1]])
        oh = convert_labelmap_to_one_hot(seg, [0, 1, 2])
        assert oh.shape == (3, 2, 2)
        assert (oh.sum(0) == 1).all()
        assert oh[1, 0, 1] == 1 and oh[2, 1, 0] == 1

    def test_translation_heads(self):
        lm = LabelManager({"background": 0, "a": 1, "b": 2}, None, target_type="translation")
        assert lm.num_segmentation_heads == 2


def _mini_plans():
    return {
        "dataset_name": "Dataset999_Test",
        "plans_name": "nnUNetPlans",
        "transpose_forward": [0, 1, 2],
        "transpose_backward": [0, 1, 2],
        "image_reader_writer": "NiftiIO",
        "configurations": {
            "2d": {"batch_size": 12, "patch_size": [256, 256], "spacing": [1.0, 1.0],
                   "data_identifier": "nnUNetPlans_2d"},
            "2d_bs4": {"inherits_from": "2d", "batch_size": 4},
            "loop_a": {"inherits_from": "loop_b"},
            "loop_b": {"inherits_from": "loop_a"},
        },
    }


class TestPlansManager:
    def test_inheritance(self):
        pm = PlansManager(_mini_plans())
        cfg = pm.get_configuration("2d_bs4")
        assert cfg.batch_size == 4
        assert cfg.patch_size == [256, 256]
        assert cfg.data_identifier == "nnUNetPlans_2d"

    def test_cycle_detection(self):
        pm = PlansManager(_mini_plans())
        with pytest.raises(RuntimeError, match="Circular"):
            pm.get_configuration("loop_a")

    def test_missing_config(self):
        pm = PlansManager(_mini_plans())
        with pytest.raises(ValueError):
            pm.get_configuration("nope")

    def test_label_manager_from_dataset_json(self):
        pm = PlansManager(_mini_plans())
        dj = {"labels": {"background": 0, "fg": 1}, "channel_names": {"0": "T1"}}
        lm = pm.get_label_manager(dj)
        assert lm.num_segmentation_heads == 2
        cfg = pm.get_configuration("2d")
        assert determine_num_input_channels(pm, cfg, dj) == 1


def test_crossval_split():
    ids = [f"case_{i:03d}" for i in range(23)]
    splits = generate_crossval_split(ids, seed=12345, n_splits=5)
    assert len(splits) == 5
    for s in splits:
        assert len(s["train"]) + len(s["val"]) == 23
        assert set(s["train"]) | set(s["val"]) == set(ids)
        assert not set(s["train"]) & set(s["val"])
    # all cases appear exactly once as val
    all_val = sum((s["val"] for s in splits), [])
    assert sorted(all_val) == sorted(ids)
    # deterministic
    splits2 = generate_crossval_split(ids, seed=12345, n_splits=5)
    assert splits == splits2
