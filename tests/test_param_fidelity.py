"""Parameter-count fidelity vs the torch reference nets (VERDICT #10).

Loads the reference net classes from `/root/reference` via
:mod:`tests.ref_import` (param-faithful stubs for mamba_ssm/monai/timm) and
compares total parameter counts against our builders at the paper scale
(2d 224x224, 1 input channel, 3 heads). The stage tables, block structures,
and projection shapes must line up for these to agree.

Marked slow: each net instantiation traces a large module tree on the 1-core
CPU host. The X2Net minis are covered exactly; the cheap families run by
default.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(Path(__file__).parent))

PATCH = (224, 224)


def _our_count(model):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, *PATCH, 1)))
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))


def _ref_count(module):
    return sum(p.numel() for p in module.parameters())


def test_u2net_param_fidelity():
    from ref_import import import_reference_net
    from nnuzoo_tpu.models.u2net import U2Net
    ref = import_reference_net("nnunetv2/nets/u2net.py")
    for small, cls in ((False, "U2NET"), (True, "U2NETP")):
        r = _ref_count(getattr(ref, cls)(in_ch=1, out_ch=3,
                                         deep_supervision=True))
        o = _our_count(U2Net(num_classes=3, small=small))
        assert abs(o / r - 1) < 0.05, (cls, o, r)


def test_lm2net_mini_exact():
    """The per-stage mini LightMUNet matches the reference LightMUNet
    EXACTLY (param-for-param), for both the Mamba1 (`lm2net.py:223-400`) and
    Mamba2 (`light_mamba2net.py:608-780`) variants."""
    from ref_import import import_reference_net
    from nnuzoo_tpu.models.lm2net import MiniLightMUNet

    for rel, m2 in (("nnunetv2/nets/lm2net.py", False),
                    ("nnunetv2/nets/light_mamba2net.py", True)):
        ref = import_reference_net(rel)
        rm = ref.LightMUNet(spatial_dims=2, in_ch=64, mid_ch=32, out_ch=64,
                            n_layers=4, input_patch_size=(16, 16),
                            add_last=True)
        m = MiniLightMUNet(mid_ch=32, out_ch=64, n_layers=4, dim=2,
                           input_patch_size=(16, 16), add_last=True,
                           use_mamba2=m2)
        shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                                jnp.zeros((1, 16, 16, 64)))
        o = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert o == _ref_count(rm), (rel, o, _ref_count(rm))


def test_dwrsu4f_exact():
    """The LM2Net bottleneck DWRSU4F matches the reference's dw-separable
    RSU4F (`lm2net.py:660-694`) exactly."""
    from ref_import import import_reference_net
    from nnuzoo_tpu.models.lm2net import DWRSU4F
    ref = import_reference_net("nnunetv2/nets/lm2net.py")
    r = _ref_count(ref.RSU4F(64, 32, 64))
    m = DWRSU4F(32, 64, 2)
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 8, 64)))
    o = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    assert o == r, (o, r)


# Reference torch totals at 2d 224x224, in_ch=1, out_ch=3, measured with
# benchmarks/param_fidelity.py (live instantiation via ref_import stubs).
# Kept as recorded constants so the default test run doesn't pay the full
# torch instantiation cost; the live path is benchmarks/param_fidelity.py.
REFERENCE_TOTALS = {
    "nnUNetTrainerU2Net": (44_036_331, 0.005),
    "nnUNetTrainerU2NetP": (1_137_003, 0.005),
    "nnUNetTrainerM2Net": (40_940_000, 0.03),     # ours -0.7%
    "nnUNetTrainerM2NetP": (2_133_000, 0.04),     # ours -2.8%
    "nnUNetTrainerLM2Net": (9_313_000, 0.005),
    "nnUNetTrainerLM2NetP": (1_573_000, 0.005),
    "nnUNetTrainerLightMamba2Net": (34_629_000, 0.005),
    "nnUNetTrainerLightMamba2NetP": (2_584_000, 0.005),
    "nnUNetTrainerSSND2Net": (41_152_000, 0.05),  # dead ref seg heads: -3.6%
    "nnUNetTrainerSSND2NetP": (1_985_000, 0.05),
    "nnUNetTrainerMambaND2Net": (41_389_000, 0.01),
    "nnUNetTrainerUNETR2Net": (136_198_000, 0.005),
    "nnUNetTrainerSwT2Net": (180_603_000, 0.005),
}


@pytest.mark.slow
@pytest.mark.parametrize("family", sorted(REFERENCE_TOTALS))
def test_builder_param_fidelity(family):
    """Every zoo builder's total parameter count matches the reference torch
    net's (recorded constants above) at the paper scale."""
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from benchmarks.param_fidelity import our_count
    ref_n, tol = REFERENCE_TOTALS[family]
    n = our_count(family)
    assert abs(n / ref_n - 1) < tol, (family, n, ref_n)


@pytest.mark.slow
@pytest.mark.parametrize("family,kwargs,ref_rel,ref_cls,ref_kw", [
    ("lm2", dict(small=False, use_mamba2=False, side_kernel=1),
     "nnunetv2/nets/lm2net.py", "LM2Net", {}),
    ("lm2", dict(small=True, use_mamba2=False, side_kernel=1),
     "nnunetv2/nets/lm2net.py", "LM2NetP", {}),
    ("lm2", dict(small=False, use_mamba2=True, side_kernel=1),
     "nnunetv2/nets/light_mamba2net.py", "LightMamba2Net", {}),
    ("lm2", dict(small=True, use_mamba2=True, side_kernel=3),
     "nnunetv2/nets/light_mamba2net.py", "LightMamba2NetP", {}),
])
def test_lm2net_family_param_fidelity(family, kwargs, ref_rel, ref_cls,
                                      ref_kw):
    from ref_import import import_reference_net
    from nnuzoo_tpu.models.lm2net import LM2NetBase
    ref = import_reference_net(ref_rel)
    r = _ref_count(getattr(ref, ref_cls)(
        in_ch=1, out_ch=3, deep_supervision=True, spatial_dims=2,
        input_patch_size=PATCH, **ref_kw))
    o = _our_count(LM2NetBase(num_classes=3, dim=2, patch_size=PATCH,
                              **kwargs))
    assert abs(o / r - 1) < 5e-3, (ref_cls, o, r)
