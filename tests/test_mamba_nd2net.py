"""MambaND2Net (faithful per-stage mini MambaND UNETR-skeletons, reference
`nnunetv2/nets/mamba_nd2net.py:1055-1290` mini, `:1598-1905` outer): shared
UNETR2Net stage tables, MambaND core semantics (axis-order rotation every two
layers, odd-layer reversal, post-norm residual), side-output scales."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_forward_shapes_and_side_scales(rng):
    from nnuzoo_tpu.models.mamba_nd2net import MambaND2Net

    model = MambaND2Net(num_classes=3, spatial_dims=2, deep_supervision=True)
    x = jnp.asarray(rng.randn(1, 64, 64, 2).astype(np.float32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x, train=False)
    assert len(outs) == 7
    # d0/d1 full, d2 1/2, d3 1/4, d4 1/8, d5 1/16, d6 1/16 (stage5->6 keeps
    # resolution; reference patch_merging5 scale (1,1))
    expect = [(64, 64), (64, 64), (32, 32), (16, 16), (8, 8), (4, 4), (4, 4)]
    for o, e in zip(outs, expect):
        assert o.shape == (1, *e, 3), (o.shape, e)
        assert np.isfinite(np.asarray(o)).all()


def test_param_count_224():
    """~54M at 224x224 (mamba cores replace the ViT stacks' 117M)."""
    from nnuzoo_tpu.models.mamba_nd2net import MambaND2Net
    m = MambaND2Net(num_classes=3, spatial_dims=2, patch_size=(224, 224))
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 2)))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    assert 40e6 < n < 70e6, n


def test_mamba_nd_stack_order_rotation(rng):
    """The axis-order rotation must matter: a stack whose input is transposed
    must NOT equal the transposed output (layers 2-3 scan the transposed
    order, breaking the symmetry); and odd-layer reversal must make the stack
    non-equivariant to sequence reversal."""
    from nnuzoo_tpu.models.unetr2net import MambaNDStack

    fs = (4, 6)
    m = MambaNDStack(hidden_size=16, num_layers=4, feat_size=fs)
    x = jnp.asarray(rng.randn(1, fs[0] * fs[1], 16).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y, outs = m.apply(params, x, train=False)
    assert y.shape == x.shape
    assert len(outs) == 4
    # transposing the feature map input changes the result beyond a transpose
    mt = MambaNDStack(hidden_size=16, num_layers=4, feat_size=fs[::-1])
    xt = jnp.transpose(x.reshape(1, *fs, 16), (0, 2, 1, 3)).reshape(
        1, -1, 16)
    yt, _ = mt.apply(params, xt, train=False)
    yt_back = jnp.transpose(yt.reshape(1, fs[1], fs[0], 16),
                            (0, 2, 1, 3)).reshape(1, -1, 16)
    assert not np.allclose(np.asarray(y), np.asarray(yt_back), atol=1e-4)
