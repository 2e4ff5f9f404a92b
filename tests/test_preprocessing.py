import numpy as np
import pytest

from nnuzoo_tpu.preprocessing.cropping import (create_nonzero_mask, crop_to_nonzero,
                                               get_bbox_from_mask)
from nnuzoo_tpu.preprocessing.normalization import (CTNormalization,
                                                    RescaleTo01Normalization,
                                                    ZScoreNormalization,
                                                    get_normalization_scheme_for_channel)
from nnuzoo_tpu.preprocessing.resampling import (compute_new_shape, get_lowres_axis,
                                                 resample_data_or_seg_to_shape,
                                                 resize_image, resize_segmentation)


class TestCropping:
    def test_bbox(self):
        mask = np.zeros((10, 12, 8), dtype=bool)
        mask[2:5, 3:9, 1:7] = True
        assert get_bbox_from_mask(mask) == [[2, 5], [3, 9], [1, 7]]

    def test_crop_marks_outside(self):
        data = np.zeros((1, 10, 10, 10), dtype=np.float32)
        data[0, 2:8, 2:8, 2:8] = 1.0
        data[0, 4, 4, 4] = 0.0  # interior hole -> filled, stays inside mask
        seg = np.zeros((1, 10, 10, 10), dtype=np.int8)
        seg[0, 3, 3, 3] = 1
        cdata, cseg, bbox = crop_to_nonzero(data, seg)
        assert cdata.shape == (1, 6, 6, 6)
        assert bbox == [[2, 8], [2, 8], [2, 8]]
        # everything inside bbox is in the filled mask -> no -1 anywhere
        assert (cseg >= 0).all()
        assert cseg[0, 1, 1, 1] == 1

    def test_crop_no_seg_returns_mask_seg(self):
        data = np.zeros((1, 6, 6, 6), dtype=np.float32)
        data[0, 1:5, 1:5, 1:5] = 1.0
        data[0, 1, 1, 1] = 0.0  # corner zero inside bbox, not hole-fillable
        _, seg, _ = crop_to_nonzero(data)
        assert seg.dtype == np.int8
        assert seg[0, 0, 0, 0] == -1
        assert seg[0, 2, 2, 2] == 0


class TestNormalization:
    def test_zscore(self, rng):
        img = rng.rand(8, 8, 8).astype(np.float32) * 50 + 10
        out = ZScoreNormalization(use_mask_for_norm=False, intensityproperties={}).run(img.copy())
        assert abs(out.mean()) < 1e-4 and abs(out.std() - 1) < 1e-4

    def test_zscore_masked(self, rng):
        img = rng.rand(8, 8, 8).astype(np.float32) + 5
        seg = np.full(img.shape, -1, dtype=np.int8)
        seg[2:6, 2:6, 2:6] = 0
        img_masked = img.copy()
        img_masked[seg < 0] = 0
        out = ZScoreNormalization(use_mask_for_norm=True, intensityproperties={}).run(
            img_masked.copy(), seg)
        assert (out[seg < 0] == 0).all()
        inside = out[seg >= 0]
        assert abs(inside.mean()) < 1e-4

    def test_ct(self, rng):
        img = rng.randn(8, 8, 8).astype(np.float32) * 300
        props = {"mean": 10.0, "std": 50.0, "percentile_00_5": -100.0,
                 "percentile_99_5": 200.0}
        out = CTNormalization(use_mask_for_norm=False, intensityproperties=props).run(img.copy())
        assert out.max() <= (200 - 10) / 50 + 1e-6
        assert out.min() >= (-100 - 10) / 50 - 1e-6

    def test_rescale01(self, rng):
        img = rng.rand(4, 4).astype(np.float32) * 7 - 3
        out = RescaleTo01Normalization(intensityproperties={}).run(img)
        assert out.min() == 0 and abs(out.max() - 1) < 1e-6

    def test_channel_map(self):
        assert get_normalization_scheme_for_channel("CT") == "CTNormalization"
        assert get_normalization_scheme_for_channel("T1") == "ZScoreNormalization"
        assert get_normalization_scheme_for_channel("noNorm") == "NoNormalization"


class TestResampling:
    def test_compute_new_shape(self):
        assert list(compute_new_shape([100, 100, 50], [1., 1., 2.], [2., 2., 2.])) == [50, 50, 50]

    def test_lowres_axis(self):
        assert list(get_lowres_axis([3.0, 1.0, 1.0])) == [0]
        assert list(get_lowres_axis([1.0, 1.0, 1.0])) == [0, 1, 2]

    def test_identity(self, rng):
        data = rng.rand(2, 6, 6, 6).astype(np.float32)
        out = resample_data_or_seg_to_shape(data, (6, 6, 6), [1, 1, 1], [1, 1, 1])
        assert np.array_equal(out, data)

    def test_constant_preserved(self):
        data = np.full((1, 8, 8, 8), 3.7, dtype=np.float32)
        out = resample_data_or_seg_to_shape(data, (12, 12, 12), [1.5, 1.5, 1.5], [1, 1, 1])
        assert np.allclose(out, 3.7, atol=1e-5)

    def test_order0_downsample_exact(self):
        # order-0 on a 1D-structured volume: nearest voxel pick with skimage convention
        img = np.arange(8, dtype=np.float64)[:, None, None] * np.ones((8, 2, 2))
        out = resize_image(img, (4, 2, 2), order=0)
        # coords: 2*(i+0.5)-0.5 = [0.5, 2.5, 4.5, 6.5] -> rounds to nearest-even? order 0
        # map_coordinates order 0 rounds 0.5 up
        assert out.shape == (4, 2, 2)
        assert np.allclose(out[:, 0, 0], [1, 3, 5, 7]) or np.allclose(out[:, 0, 0], [0, 2, 4, 6])

    def test_linear_ramp_upsample(self):
        img = np.linspace(0, 1, 10)[:, None] * np.ones((10, 10))
        out = resize_image(img, (20, 20), order=1)
        assert out.shape == (20, 20)
        # ramp stays monotone and in range
        assert (np.diff(out[:, 0]) >= -1e-9).all()
        assert out.min() >= 0 and out.max() <= 1 + 1e-9

    def test_order3_clips_overshoot(self):
        img = np.zeros((10, 10))
        img[5:, :] = 1.0  # step edge -> cubic overshoots without clip
        out = resize_image(img, (30, 30), order=3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_seg_labels_preserved(self, rng):
        seg = np.zeros((1, 12, 12, 12), dtype=np.int8)
        seg[0, 3:9, 3:9, 3:9] = 2
        seg[0, 5:7, 5:7, 5:7] = 1
        out = resample_data_or_seg_to_shape(seg, (18, 18, 18), [1, 1, 1], [2/3] * 3,
                                            is_seg=True)
        assert out.dtype == seg.dtype
        assert set(np.unique(out)) <= {0, 1, 2}
        # center keeps label 1
        assert out[0, 9, 9, 9] == 1

    def test_separate_z_path(self, rng):
        data = rng.rand(1, 4, 16, 16).astype(np.float32)  # anisotropic axis 0
        out = resample_data_or_seg_to_shape(data, (4, 32, 32), [5.0, 1.0, 1.0],
                                            [5.0, 0.5, 0.5], force_separate_z=None)
        assert out.shape == (1, 4, 32, 32)
        # z unchanged -> per-slice content correlates with input slices
        for z in range(4):
            up = out[0, z]
            assert abs(up.mean() - data[0, z].mean()) < 0.05

    def test_separate_z_with_z_resample(self, rng):
        data = rng.rand(1, 4, 8, 8).astype(np.float32)
        out = resample_data_or_seg_to_shape(data, (8, 8, 8), [4.0, 1.0, 1.0],
                                            [2.0, 1.0, 1.0], force_separate_z=True)
        assert out.shape == (1, 8, 8, 8)

    def test_seg_separate_z(self):
        seg = np.zeros((1, 4, 8, 8), dtype=np.int8)
        seg[0, :, 2:6, 2:6] = 1
        out = resample_data_or_seg_to_shape(seg, (4, 16, 16), [5.0, 1.0, 1.0],
                                            [5.0, 0.5, 0.5], is_seg=True,
                                            force_separate_z=None)
        assert set(np.unique(out)) <= {0, 1}
        assert out[0, 0, 8, 8] == 1


class TestPreprocessorCase:
    def _setup(self):
        from nnuzoo_tpu.plans.plans_handler import PlansManager
        plans = {
            "dataset_name": "Dataset999_Synth", "plans_name": "nnUNetPlans",
            "transpose_forward": [0, 1, 2], "transpose_backward": [0, 1, 2],
            "image_reader_writer": "NiftiIO",
            "foreground_intensity_properties_per_channel": {
                "0": {"mean": 50.0, "std": 30.0, "percentile_00_5": 0.0,
                      "percentile_99_5": 100.0, "max": 120.0, "min": 0.0,
                      "median": 50.0}},
            "configurations": {
                "3d_fullres": {
                    "data_identifier": "nnUNetPlans_3d_fullres",
                    "preprocessor_name": "DefaultPreprocessor",
                    "batch_size": 2, "patch_size": [16, 16, 16],
                    "spacing": [2.0, 2.0, 2.0],
                    "normalization_schemes": ["ZScoreNormalization"],
                    "use_mask_for_norm": [False],
                    "resampling_fn_data": "resample_data_or_seg_to_shape",
                    "resampling_fn_data_kwargs": {"is_seg": False, "order": 3,
                                                  "order_z": 0, "force_separate_z": None},
                    "resampling_fn_seg": "resample_data_or_seg_to_shape",
                    "resampling_fn_seg_kwargs": {"is_seg": True, "order": 1,
                                                 "order_z": 0, "force_separate_z": None},
                    "resampling_fn_probabilities": "resample_data_or_seg_to_shape",
                    "resampling_fn_probabilities_kwargs": {
                        "is_seg": False, "order": 1, "order_z": 0,
                        "force_separate_z": None},
                    "batch_dice": False,
                }}}
        dataset_json = {"channel_names": {"0": "MRI"},
                        "labels": {"background": 0, "organ": 1},
                        "numTraining": 1, "file_ending": ".nii.gz"}
        return PlansManager(plans), dataset_json

    def test_run_case_npy(self, rng):
        from nnuzoo_tpu.preprocessing.preprocessor import DefaultPreprocessor
        pm, dj = self._setup()
        cfg = pm.get_configuration("3d_fullres")
        data = np.zeros((1, 20, 24, 16), dtype=np.float32)
        data[0, 2:18, 3:21, 2:14] = rng.rand(16, 18, 12) * 100 + 1
        seg = (data > 60).astype(np.int8)
        props = {"spacing": [1.0, 1.0, 1.0]}
        pp = DefaultPreprocessor()
        out_data, out_seg = pp.run_case_npy(data, seg, props, pm, cfg, dj)
        # cropped to 16x18x12 then resampled to spacing 2 -> 8x9x6
        assert props["shape_before_cropping"] == (20, 24, 16)
        assert props["shape_after_cropping_and_before_resampling"] == (16, 18, 12)
        assert out_data.shape == (1, 8, 9, 6)
        assert out_seg.shape == (1, 8, 9, 6)
        assert out_data.dtype == np.float32 and out_seg.dtype == np.int8
        assert "class_locations" in props
        locs = props["class_locations"]
        assert 1 in locs and len(locs[1]) > 0
        # sampled locations actually have label 1 (coords incl. channel axis)
        for loc in np.asarray(locs[1])[:20]:
            assert out_seg[tuple(loc)] == 1
        # deterministic rng
        out_data2, _ = DefaultPreprocessor().run_case_npy(
            data, seg, {"spacing": [1.0, 1.0, 1.0]}, pm, cfg, dj)
        assert np.array_equal(out_data, out_data2)
