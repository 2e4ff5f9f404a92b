import numpy as np
import pytest

from nnuzoo_tpu.planning.topology import get_pool_and_conv_props, pad_shape
from nnuzoo_tpu.planning.planner import estimate_conv_feature_map_elements

from .helpers import make_synthetic_dataset, set_paths


class TestTopology:
    def test_isotropic_3d(self):
        num_pool, pools, convs, patch, div = get_pool_and_conv_props(
            [1.0, 1.0, 1.0], [128, 128, 128], 4, 999999)
        assert num_pool == [5, 5, 5]
        assert pools[0] == [1, 1, 1]
        assert all(p == [2, 2, 2] for p in pools[1:])
        assert convs[-1] == [3, 3, 3]
        assert list(patch) == [128, 128, 128]
        assert list(div) == [32, 32, 32]

    def test_anisotropic(self):
        num_pool, pools, convs, patch, div = get_pool_and_conv_props(
            [5.0, 1.0, 1.0], [16, 256, 256], 4, 999999)
        # axis 0 pools less than axes 1/2
        assert num_pool[0] < num_pool[1] == num_pool[2]
        # first convs have kernel 1 on the coarse axis
        assert convs[0][0] == 1 and convs[0][1] == 3

    def test_pad_shape(self):
        assert list(pad_shape([100, 128], [32, 32])) == [128, 128]
        assert list(pad_shape([128, 128], [32, 32])) == [128, 128]

    def test_2d(self):
        num_pool, pools, convs, patch, div = get_pool_and_conv_props(
            [1.0, 1.0], [256, 256], 4, 999999)
        assert num_pool == [6, 6]
        assert list(patch) == [256, 256]


def test_feature_map_estimate_monotone():
    kw = dict(n_stages=5, features_per_stage=[32, 64, 128, 256, 320],
              strides=[[1, 1, 1]] + [[2, 2, 2]] * 4,
              n_conv_per_stage=[2] * 5, n_conv_per_stage_decoder=[2] * 4,
              num_classes=3)
    small = estimate_conv_feature_map_elements([64, 64, 64], **kw)
    big = estimate_conv_feature_map_elements([128, 128, 128], **kw)
    assert big > small * 7  # roughly 8x voxels


class TestPlanAndPreprocess:
    def test_end_to_end(self, tmp_path):
        raw, pp, res = set_paths(tmp_path)
        make_synthetic_dataset(raw, num_cases=4)
        from nnuzoo_tpu.planning.api import (extract_fingerprints, plan_experiments,
                                             preprocess)
        from nnuzoo_tpu.utilities.io import isfile, join, load_json

        extract_fingerprints([999], num_processes=1, check_dataset_integrity=True)
        fp_file = join(pp, "Dataset999_Synth", "dataset_fingerprint.json")
        assert isfile(fp_file)
        fp = load_json(fp_file)
        assert len(fp["spacings"]) == 4
        assert "0" in fp["foreground_intensity_properties_per_channel"]
        stats = fp["foreground_intensity_properties_per_channel"]["0"]
        assert 10 < stats["mean"] < 90

        plan_experiments([999])
        plans_file = join(pp, "Dataset999_Synth", "nnUNetPlans.json")
        assert isfile(plans_file)
        plans = load_json(plans_file)
        assert "2d" in plans["configurations"]
        assert "3d_fullres" in plans["configurations"]
        cfg3d = plans["configurations"]["3d_fullres"]
        # tiny dataset: patch covers whole median shape (padded)
        assert all(p >= s for p, s in zip(
            cfg3d["patch_size"],
            [round(i) for i in cfg3d["median_image_size_in_voxels"]]))
        assert cfg3d["batch_size"] >= 2
        arch = cfg3d["architecture"]["arch_kwargs"]
        assert arch["n_stages"] == len(arch["strides"]) == len(arch["kernel_sizes"])

        preprocess([999], num_processes=(1, 1, 1))
        data_dir = join(pp, "Dataset999_Synth", "nnUNetPlans_3d_fullres")
        import os
        npzs = [f for f in os.listdir(data_dir) if f.endswith(".npz")]
        pkls = [f for f in os.listdir(data_dir) if f.endswith(".pkl")]
        assert len(npzs) == 4 and len(pkls) == 4
        arr = np.load(join(data_dir, npzs[0]))
        assert "data" in arr and "seg" in arr
        assert arr["data"].ndim == 4 and arr["seg"].ndim == 4
        assert arr["data"].dtype == np.float32
        # gt segmentations copied
        assert os.path.isdir(join(pp, "Dataset999_Synth", "gt_segmentations"))

    def test_integrity_catches_bad_labels(self, tmp_path):
        raw, pp, res = set_paths(tmp_path)
        ds = make_synthetic_dataset(raw, num_cases=2,
                                    labels={"background": 0, "organ": 1})
        # dataset has label 2 in the data? No - make labels claim only {0,1} but write 2
        import os
        from nnuzoo_tpu.imageio.nifti import read_nifti, write_nifti
        f = os.path.join(ds, "labelsTr", "case_000.nii.gz")
        seg, _ = read_nifti(f)
        seg = seg.copy()
        seg[0, 0, 0] = 7
        write_nifti(f, seg.astype(np.uint8), spacing_xyz=(1, 1, 1))
        from nnuzoo_tpu.planning.integrity import verify_dataset_integrity
        with pytest.raises(RuntimeError, match="Unexpected labels"):
            verify_dataset_integrity(ds, num_processes=1)


def test_resenc_planner(tmp_path):
    """ResEncUNetPlanner emits ResidualEncoderUNet plans (reference
    `resencUNet_planner.py:9-33`) that build and run."""
    from .helpers import make_synthetic_dataset, set_paths
    raw, pp, res = set_paths(tmp_path)
    make_synthetic_dataset(raw, num_cases=4)
    from nnuzoo_tpu.planning.api import extract_fingerprints, plan_experiments
    from nnuzoo_tpu.utilities.io import join, load_json

    extract_fingerprints([999], num_processes=1)
    plan_experiments([999], experiment_planner_name="ResEncUNetPlanner")
    plans = load_json(join(pp, "Dataset999_Synth", "nnUNetResEncUNetPlans.json"))
    assert plans["plans_name"] == "nnUNetResEncUNetPlans"
    arch = plans["configurations"]["3d_fullres"]["architecture"]
    assert arch["network_class_name"] == "ResidualEncoderUNet"
    enc = arch["arch_kwargs"]["n_conv_per_stage"]
    assert list(enc)[:4] == [1, 3, 4, 6][:len(enc)]
    assert all(b == 1 for b in arch["arch_kwargs"]["n_conv_per_stage_decoder"])

    # the emitted plans build a working network
    import jax
    import jax.numpy as jnp
    from nnuzoo_tpu.models.dynamic_unet import ResidualEncoderUNet
    from nnuzoo_tpu.plans.plans_handler import PlansManager
    pm = PlansManager(plans)
    cfg = pm.get_configuration("2d")
    net = ResidualEncoderUNet(
        arch_kwargs=cfg.network_arch_init_kwargs, num_classes=3,
        deep_supervision=True)
    x = jnp.zeros((1, 32, 32, 1))
    params = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(params, x, train=False)
    assert outs[0].shape[:3] == (1, 32, 32)
