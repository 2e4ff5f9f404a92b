import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from nnuzoo_tpu.data.augment import (AugmentConfig, augment_train_batch,
                                     get_patch_size, make_seg_targets)
from nnuzoo_tpu.data.dataset import DatasetNumpy, unpack_dataset
from nnuzoo_tpu.data.loader import DevicePrefetcher
from nnuzoo_tpu.data.patch_sampler import PatchSampler, crop_and_pad_nd
from nnuzoo_tpu.plans.label_handling import LabelManager


def _write_case(folder, ident, shape=(1, 24, 28, 20), seed=0):
    import pickle
    rng = np.random.RandomState(seed)
    data = rng.rand(*shape).astype(np.float32)
    seg = (data > 0.7).astype(np.int8)
    np.savez_compressed(f"{folder}/{ident}.npz", data=data, seg=seg)
    fg = np.argwhere(seg == 1)
    props = {"class_locations": {1: fg[rng.choice(len(fg), min(100, len(fg)),
                                                  replace=False)]},
             "spacing": [1.0, 1.0, 1.0]}
    with open(f"{folder}/{ident}.pkl", "wb") as f:
        pickle.dump(props, f)


class TestDataset:
    def test_npz_and_unpack(self, tmp_path):
        folder = str(tmp_path)
        for i in range(3):
            _write_case(folder, f"case_{i}", seed=i)
        ds = DatasetNumpy(folder)
        assert len(ds) == 3
        data, seg, seg_prev, props = ds.load_case("case_0")
        assert data.shape == (1, 24, 28, 20) and seg_prev is None
        unpack_dataset(folder, num_processes=1)
        ds2 = DatasetNumpy(folder)
        data2, seg2, _, _ = ds2.load_case("case_0")
        assert isinstance(data2, np.memmap)
        assert np.array_equal(np.asarray(data2), np.asarray(data))
        assert np.array_equal(np.asarray(seg2), np.asarray(seg))


class TestCropAndPad:
    def test_inside(self):
        arr = np.arange(2 * 4 * 4).reshape(2, 4, 4)
        out = crop_and_pad_nd(arr, [[1, 3], [1, 3]], 0)
        assert out.shape == (2, 2, 2)
        assert np.array_equal(out[0], arr[0, 1:3, 1:3])

    def test_out_of_bounds(self):
        arr = np.ones((1, 4, 4))
        out = crop_and_pad_nd(arr, [[-2, 2], [2, 6]], 0)
        assert out.shape == (1, 4, 4)
        assert out[0, 0, 0] == 0  # padded corner
        assert out[0, 2, 0] == 1  # inside
        assert out[0, 2, 2] == 0  # beyond right edge


class TestPatchSampler:
    def test_batch_shapes_and_oversampling(self, tmp_path):
        folder = str(tmp_path)
        for i in range(3):
            _write_case(folder, f"case_{i}", seed=i)
        ds = DatasetNumpy(folder)
        lm = LabelManager({"background": 0, "fg": 1}, None)
        sampler = PatchSampler(ds, batch_size=4, initial_patch_size=(16, 16, 16),
                               final_patch_size=(12, 12, 12), label_manager=lm,
                               oversample_foreground_percent=0.5, seed=0)
        batch = sampler.generate_train_batch()
        assert batch["data"].shape == (4, 1, 16, 16, 16)
        assert batch["target"].shape == (4, 1, 16, 16, 16)
        assert batch["data"].dtype == np.float32
        assert batch["target"].dtype == np.int16
        # last 50% of batch forced fg
        assert (batch["target"][2] == 1).any()
        assert (batch["target"][3] == 1).any()

    def test_2d_mode(self, tmp_path):
        folder = str(tmp_path)
        _write_case(folder, "case_0")
        ds = DatasetNumpy(folder)
        lm = LabelManager({"background": 0, "fg": 1}, None)
        sampler = PatchSampler(ds, batch_size=2, initial_patch_size=(20, 20),
                               final_patch_size=(16, 16), label_manager=lm,
                               oversample_foreground_percent=0.33, seed=0)
        batch = sampler.generate_train_batch()
        assert batch["data"].shape == (2, 1, 20, 20)

    def test_ignore_label_annotated_key_matches_preprocessor(self, tmp_path):
        # the sampler's annotated-classes key must equal the key the
        # preprocessor stores (tuple(all_labels)) so ignore-label sampling
        # actually centers patches on annotated voxels
        from nnuzoo_tpu.preprocessing.preprocessor import DefaultPreprocessor
        folder = str(tmp_path)
        _write_case(folder, "case_0")
        ds = DatasetNumpy(folder)
        lm = LabelManager({"background": 0, "fg": 1, "ignore": 2}, None)
        assert lm.has_ignore_label
        seg = np.zeros((1, 10, 10, 10), np.int8)
        seg[0, 2:5, 2:5, 2:5] = 1
        seg[0, 8:, 8:, 8:] = 2
        collect = list(lm.foreground_labels) + [lm.all_labels]
        locs = DefaultPreprocessor._sample_foreground_locations(seg, collect)
        sampler = PatchSampler(ds, batch_size=2, initial_patch_size=(8, 8, 8),
                               final_patch_size=(8, 8, 8), label_manager=lm,
                               oversample_foreground_percent=0.0, seed=0)
        assert sampler.annotated_classes_key in locs
        # non-oversampled draws on an ignore dataset center on annotated voxels
        lbs, ubs = sampler.get_bbox((10, 10, 10), force_fg=False,
                                    class_locations=locs)
        center = [lo + 4 for lo in lbs]
        annotated = np.argwhere(seg[0] != 2)
        assert any(np.array_equal(center, a) for a in annotated)
        # force_fg path must drop the all-labels entry when real fg exists
        lbs, ubs = sampler.get_bbox((10, 10, 10), force_fg=True,
                                    class_locations=locs)
        assert seg[0][tuple(lo + 4 for lo in lbs)] == 1

    def test_patch_larger_than_volume(self, tmp_path):
        folder = str(tmp_path)
        _write_case(folder, "case_0", shape=(1, 8, 8, 8))
        ds = DatasetNumpy(folder)
        lm = LabelManager({"background": 0, "fg": 1}, None)
        sampler = PatchSampler(ds, batch_size=2, initial_patch_size=(16, 16, 16),
                               final_patch_size=(16, 16, 16), label_manager=lm,
                               oversample_foreground_percent=0.0, seed=0)
        batch = sampler.generate_train_batch()
        assert batch["data"].shape == (2, 1, 16, 16, 16)


class TestAugment:
    def _cfg(self, ds_scales=None, dim=3):
        ps = (12,) * dim
        ips = (16,) * dim
        return AugmentConfig(patch_size=ps, initial_patch_size=ips,
                             rotation=np.pi / 6, mirror_axes=tuple(range(dim)),
                             use_mask_for_norm=(False,),
                             deep_supervision_scales=ds_scales)

    def test_get_patch_size_inflates(self):
        ips = get_patch_size((64, 64), (-np.pi, np.pi), (-np.pi, np.pi),
                             (-np.pi, np.pi), (0.85, 1.25))
        assert all(i > 64 for i in ips)

    def test_shapes_and_determinism(self):
        cfg = self._cfg(ds_scales=((1.0, 1.0, 1.0), (0.5, 0.5, 0.5)))
        rng = np.random.RandomState(0)
        data = jnp.asarray(rng.rand(2, 1, 16, 16, 16).astype(np.float32))
        seg = jnp.asarray((rng.rand(2, 1, 16, 16, 16) > 0.7).astype(np.int16))
        key = jax.random.PRNGKey(42)
        out, targets = augment_train_batch(cfg, key, data, seg)
        assert out.shape == (2, 1, 12, 12, 12)
        assert len(targets) == 2
        assert targets[0].shape == (2, 1, 12, 12, 12)
        assert targets[1].shape == (2, 1, 6, 6, 6)
        # no -1 left in targets
        assert (targets[0] >= 0).all()
        out2, _ = augment_train_batch(cfg, key, data, seg)
        assert np.allclose(out, out2)
        out3, _ = augment_train_batch(cfg, jax.random.PRNGKey(7), data, seg)
        assert not np.allclose(out, out3)

    def test_identity_when_no_aug(self):
        # rotation prob 0 etc: center crop should match input center
        cfg = AugmentConfig(patch_size=(12, 12, 12), initial_patch_size=(16, 16, 16),
                            rotation=0.0, mirror_axes=(), use_mask_for_norm=(False,),
                            p_rotation=0.0, p_scaling=0.0)
        rng = np.random.RandomState(0)
        data = rng.rand(1, 1, 16, 16, 16).astype(np.float32)
        seg = np.zeros((1, 1, 16, 16, 16), dtype=np.int16)
        key = jax.random.PRNGKey(0)
        out, targets = augment_train_batch(cfg, key, jnp.asarray(data),
                                           jnp.asarray(seg))
        center = data[0, 0, 2:14, 2:14, 2:14]
        # intensity transforms are stochastic; run many keys and find at least one
        # near-identity output is too flaky -- instead check spatial alignment via
        # correlation (intensity ops are monotone-ish)
        o = np.asarray(out[0, 0]).ravel()
        c = center.ravel()
        corr = np.corrcoef(o, c)[0, 1]
        assert corr > 0.5

    def test_regions_conversion(self):
        cfg = AugmentConfig(patch_size=(8, 8), initial_patch_size=(8, 8),
                            rotation=0.0, mirror_axes=(),
                            use_mask_for_norm=(False,),
                            regions=((1, 2), (2,)), p_rotation=0.0, p_scaling=0.0)
        seg = np.zeros((1, 8, 8), dtype=np.int16)
        seg[0, :4] = 1
        seg[0, :2] = 2
        targets = make_seg_targets(cfg, jnp.asarray(seg))
        t = np.asarray(targets[0])
        assert t.shape == (2, 8, 8)
        assert (t[0, :4] == 1).all() and (t[0, 4:] == 0).all()
        assert (t[1, :2] == 1).all() and (t[1, 2:] == 0).all()


def test_prefetcher(tmp_path):
    folder = str(tmp_path)
    for i in range(2):
        _write_case(folder, f"case_{i}", seed=i)
    ds = DatasetNumpy(folder)
    lm = LabelManager({"background": 0, "fg": 1}, None)
    sampler = PatchSampler(ds, batch_size=2, initial_patch_size=(12, 12, 12),
                           final_patch_size=(12, 12, 12), label_manager=lm, seed=0)
    prefetcher = DevicePrefetcher(sampler, buffer_size=2)
    try:
        for _ in range(3):
            batch = next(prefetcher)
            assert isinstance(batch["data"], jax.Array)
            assert batch["data"].shape == (2, 1, 12, 12, 12)
    finally:
        prefetcher.stop()
