"""Fused cross-scan kernel (`ops/cross_scan.py`) vs the pure-XLA oracle:
forward values and ALL gradients (streams + projection weights) must match on
both traversal orientations. Runs the Pallas kernels in interpret mode on CPU."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from nnuzoo_tpu.ops.cross_scan import cross_scan_ref, cross_scan_fused  # noqa: E402
from nnuzoo_tpu.ops.selective_scan import _pick_chunk  # noqa: E402


def _make_inputs(rng, B=2, L=128, G=2, Dh=8, N=4, R=2):
    streams = tuple(jnp.asarray(rng.randn(B, L, Dh).astype(np.float32)) * 0.5
                    for _ in range(G))
    wx = jnp.asarray(rng.randn(G, R + 2 * N, Dh).astype(np.float32)) * 0.2
    wdt = jnp.asarray(rng.randn(G, Dh, R).astype(np.float32)) * 0.2
    dtb = jnp.asarray(rng.randn(G, Dh).astype(np.float32)) * 0.1
    A = -jnp.exp(jnp.asarray(rng.rand(G * Dh, N).astype(np.float32)))
    Ds = jnp.asarray(rng.rand(G * Dh).astype(np.float32))
    return streams, wx, wdt, dtb, A, Ds


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_matches_oracle_fwd_and_grads(rng, reverse):
    streams, wx, wdt, dtb, A, Ds = _make_inputs(rng)
    G, Dh = len(streams), streams[0].shape[-1]
    N = A.shape[1]

    def fused(streams, wx, wdt, dtb, A, Ds):
        # public wrapper: with G*Dh=16 lanes and B=2, nb=2 batch elements are
        # lane-packed, so this also covers the packed layout
        return cross_scan_fused(streams, wx, wdt, dtb, A, Ds, reverse,
                                backend="pallas", interpret=True)

    y_ref = cross_scan_ref(streams, wx, wdt, dtb, A, Ds, reverse)
    y_fused = fused(streams, wx, wdt, dtb, A, Ds)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    # gradient parity on a scalar projection of y
    w_out = jnp.asarray(np.random.RandomState(7).randn(
        *y_ref.shape).astype(np.float32))

    def loss_ref(args):
        return jnp.sum(cross_scan_ref(*args, reverse) * w_out)

    def loss_fused(args):
        return jnp.sum(fused(*args) * w_out)

    args = (streams, wx, wdt, dtb, A, Ds)
    g_ref = jax.grad(loss_ref)(args)
    g_fused = jax.grad(loss_fused)(args)
    names = ["streams", "wx", "wdt", "dtb", "A", "Ds"]
    for name, a, b in zip(names, g_ref, g_fused):
        for ai, bi in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(bi), np.asarray(ai), rtol=2e-4, atol=2e-4,
                err_msg=f"grad mismatch: {name} (reverse={reverse})")


def test_padding_path(rng):
    """L not a multiple of the chunk: the public wrapper pads with zeros;
    results must still match the oracle on the unpadded length."""
    streams, wx, wdt, dtb, A, Ds = _make_inputs(rng, L=150)
    assert 150 % _pick_chunk(150, A.shape[1], A.shape[0]) != 0
    for reverse in (False, True):
        y_ref = cross_scan_ref(streams, wx, wdt, dtb, A, Ds, reverse)
        y = cross_scan_fused(streams, wx, wdt, dtb, A, Ds, reverse,
                             backend="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)


def test_batch_lane_packing_with_pad(rng):
    """nb does not divide B: the wrapper zero-pads the batch (G*Dh=48 lanes ->
    nb=2, B=3 -> one padded element). Forward and stream grads must still
    match the oracle on the real elements."""
    streams, wx, wdt, dtb, A, Ds = _make_inputs(rng, B=3, Dh=24)
    for reverse in (False, True):
        y_ref = cross_scan_ref(streams, wx, wdt, dtb, A, Ds, reverse)
        y = cross_scan_fused(streams, wx, wdt, dtb, A, Ds, reverse,
                             backend="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)
    g_ref = jax.grad(lambda s: jnp.sum(
        cross_scan_ref(s, wx, wdt, dtb, A, Ds, False) ** 2))(streams)
    g = jax.grad(lambda s: jnp.sum(cross_scan_fused(
        s, wx, wdt, dtb, A, Ds, False, backend="pallas",
        interpret=True) ** 2))(streams)
    for ai, bi in zip(g_ref, g):
        np.testing.assert_allclose(np.asarray(bi), np.asarray(ai),
                                   rtol=2e-4, atol=2e-4)


def test_ss2d_module_fused_matches_legacy(rng, monkeypatch):
    """The SS2D flax module must produce identical outputs and input grads on
    the fused path and the legacy (materialized-xs) path."""
    from nnuzoo_tpu.models.ss2d import SS2D

    x = jnp.asarray(rng.randn(2, 12, 10, 16).astype(np.float32))
    mod = SS2D(d_model=16, d_state=4)
    params = mod.init(jax.random.PRNGKey(0), x, train=False)

    monkeypatch.setenv("NNUZOO_SS2D_FUSED", "0")
    y_legacy = mod.apply(params, x, train=False)
    g_legacy = jax.grad(lambda x: jnp.sum(mod.apply(params, x,
                                                    train=False) ** 2))(x)

    monkeypatch.setenv("NNUZOO_SS2D_FUSED", "interpret")
    y_fused = mod.apply(params, x, train=False)
    g_fused = jax.grad(lambda x: jnp.sum(mod.apply(params, x,
                                                   train=False) ** 2))(x)

    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_legacy),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_legacy),
                               rtol=2e-3, atol=2e-4)


def test_ssnd_module_fused_matches_legacy(rng, monkeypatch):
    """Same for the 3D SSND module (G=3 axis orders, K=6 directions)."""
    from nnuzoo_tpu.models.ssnd import SSND

    x = jnp.asarray(rng.randn(1, 6, 8, 10, 16).astype(np.float32))
    mod = SSND(d_model=16, spatial_dims=3, d_state=4)
    params = mod.init(jax.random.PRNGKey(0), x, train=False)

    monkeypatch.setenv("NNUZOO_SS2D_FUSED", "0")
    y_legacy = mod.apply(params, x, train=False)
    monkeypatch.setenv("NNUZOO_SS2D_FUSED", "interpret")
    y_fused = mod.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_legacy),
                               rtol=2e-4, atol=2e-4)


def test_ss2d_module_packed_matches_legacy(rng, monkeypatch):
    """The lane-packed glue path (TPU default) must match the legacy
    (materialized-xs) path: outputs, input grads, and parameter grads —
    the block-diagonal projection matmuls must route gradients back to
    x_proj_weight / dt_projs_weight exactly."""
    from nnuzoo_tpu.models.ss2d import SS2D

    x = jnp.asarray(rng.randn(2, 12, 10, 16).astype(np.float32))
    mod = SS2D(d_model=16, d_state=16)
    params = mod.init(jax.random.PRNGKey(0), x, train=False)

    def loss(p, x):
        return jnp.sum(mod.apply(p, x, train=False) ** 2)

    monkeypatch.setenv("NNUZOO_SS2D_PACKED", "0")
    y_legacy = mod.apply(params, x, train=False)
    gx_l = jax.grad(loss, argnums=1)(params, x)
    gp_l = jax.grad(loss, argnums=0)(params, x)

    monkeypatch.setenv("NNUZOO_SS2D_PACKED", "interpret")
    y_packed = mod.apply(params, x, train=False)
    gx_p = jax.grad(loss, argnums=1)(params, x)
    gp_p = jax.grad(loss, argnums=0)(params, x)

    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_legacy),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_l),
                               rtol=2e-3, atol=2e-4)
    flat_p = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(gp_p)}
    for k, v in jax.tree_util.tree_leaves_with_path(gp_l):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_p[ks]), np.asarray(v), rtol=5e-3, atol=5e-4,
            err_msg=f"param grad mismatch at {ks}")
