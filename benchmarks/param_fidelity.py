"""Parameter-count fidelity vs the torch reference (VERDICT #10).

Instantiates every reference net class (via tests/ref_import.py's param-
faithful dependency stubs) and the corresponding nnuzoo_tpu builder at the
paper scale (2d, 224x224, 1 input channel, 3 segmentation heads) and prints a
side-by-side table. Run on CPU:

    JAX_PLATFORMS=cpu python benchmarks/param_fidelity.py [family ...]
"""

import os
import sys
import traceback

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

# the container's sitecustomize re-registers the TPU plugin even when
# JAX_PLATFORMS=cpu; counter-override before any backend initializes
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

PATCH = (224, 224)
IN_CH, OUT_CH = 1, 3


def ref_count(module):
    return sum(p.numel() for p in module.parameters())


def our_count(trainer_name):
    import jax
    import jax.numpy as jnp
    from nnuzoo_tpu.models.registry import get_model_builder
    from benchmarks.zoo_sweep import build_plans
    pm, cfg, dataset_json = build_plans(PATCH)
    model = get_model_builder(trainer_name)(pm, dataset_json, cfg, IN_CH,
                                            deep_supervision=True)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, *PATCH, IN_CH)))
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))


def build_reference(family):
    """Return the instantiated reference net for a trainer name."""
    from ref_import import import_reference_net
    kw = dict(in_ch=IN_CH, out_ch=OUT_CH, deep_supervision=True,
              spatial_dims=2, input_patch_size=PATCH)
    if family == "nnUNetTrainerLM2Net":
        return import_reference_net("nnunetv2/nets/lm2net.py").LM2Net(**kw)
    if family == "nnUNetTrainerLM2NetP":
        return import_reference_net("nnunetv2/nets/lm2net.py").LM2NetP(**kw)
    if family == "nnUNetTrainerLightMamba2Net":
        return import_reference_net(
            "nnunetv2/nets/light_mamba2net.py").LightMamba2Net(**kw)
    if family == "nnUNetTrainerLightMamba2NetP":
        return import_reference_net(
            "nnunetv2/nets/light_mamba2net.py").LightMamba2NetP(**kw)
    if family == "nnUNetTrainerSSND2Net":
        return import_reference_net("nnunetv2/nets/ssnd2net.py").SSND2Net(
            factorization_type="cross-scan", **kw)
    if family == "nnUNetTrainerSSND2NetP":
        return import_reference_net("nnunetv2/nets/ssnd2net.py").SSND2NetP(
            factorization_type="cross-scan", **kw)
    if family == "nnUNetTrainerMambaND2Net":
        return import_reference_net(
            "nnunetv2/nets/mamba_nd2net.py").MambaND2Net(**kw)
    if family == "nnUNetTrainerUNETR2Net":
        return import_reference_net(
            "nnunetv2/nets/unetr2net.py").UNETR2Net(
            spatial_dims=2, in_channels=IN_CH, out_channels=OUT_CH,
            deep_supervision=True, input_patch_size=PATCH)
    if family == "nnUNetTrainerSwT2Net":
        return import_reference_net("nnunetv2/nets/swt2net.py").SwT2Net(
            in_ch=IN_CH, out_ch=OUT_CH, deep_supervision=True)
    if family == "nnUNetTrainerM2Net":
        return import_reference_net("nnunetv2/nets/m2net.py").M2Net(
            in_ch=IN_CH, out_ch=OUT_CH, deep_supervision=True)
    if family == "nnUNetTrainerM2NetP":
        return import_reference_net("nnunetv2/nets/m2net.py").M2NetP(
            in_ch=IN_CH, out_ch=OUT_CH, deep_supervision=True)
    if family == "nnUNetTrainerU2Net":
        return import_reference_net("nnunetv2/nets/u2net.py").U2NET(
            in_ch=IN_CH, out_ch=OUT_CH, deep_supervision=True)
    if family == "nnUNetTrainerU2NetP":
        return import_reference_net("nnunetv2/nets/u2net.py").U2NETP(
            in_ch=IN_CH, out_ch=OUT_CH, deep_supervision=True)
    raise KeyError(family)


DEFAULT = [
    "nnUNetTrainerU2Net", "nnUNetTrainerU2NetP",
    "nnUNetTrainerM2Net", "nnUNetTrainerM2NetP",
    "nnUNetTrainerLM2Net", "nnUNetTrainerLM2NetP",
    "nnUNetTrainerLightMamba2Net", "nnUNetTrainerLightMamba2NetP",
    "nnUNetTrainerSSND2Net", "nnUNetTrainerSSND2NetP",
    "nnUNetTrainerMambaND2Net",
    "nnUNetTrainerUNETR2Net", "nnUNetTrainerSwT2Net",
]


def main():
    names = sys.argv[1:] or DEFAULT
    print(f"{'trainer':35s} {'ours':>10s} {'reference':>10s} {'diff':>8s}")
    for name in names:
        try:
            r = ref_count(build_reference(name))
        except Exception as e:
            print(f"{name:35s} REF FAIL {type(e).__name__}: {str(e)[:100]}")
            traceback.print_exc(limit=2)
            continue
        try:
            o = our_count(name)
        except Exception as e:
            print(f"{name:35s} OURS FAIL {type(e).__name__}: {str(e)[:100]}")
            continue
        print(f"{name:35s} {o/1e6:9.3f}M {r/1e6:9.3f}M {100*(o/r-1):+7.2f}%",
              flush=True)


if __name__ == "__main__":
    main()
