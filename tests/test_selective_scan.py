import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from nnuzoo_tpu.ops.selective_scan import (selective_scan, selective_scan_pallas,
                                           selective_scan_ref_jax,
                                           selective_scan_xla)


def _make_inputs(rng, batch=2, dim=4, dstate=8, L=37, groups=None, with_z=True,
                 with_D=True, with_bias=True):
    u = rng.randn(batch, dim, L).astype(np.float32)
    delta = rng.randn(batch, dim, L).astype(np.float32) * 0.5
    A = -np.abs(rng.randn(dim, dstate)).astype(np.float32)
    if groups:
        B = rng.randn(batch, groups, dstate, L).astype(np.float32)
        C = rng.randn(batch, groups, dstate, L).astype(np.float32)
    else:
        B = rng.randn(batch, dstate, L).astype(np.float32)
        C = rng.randn(batch, dstate, L).astype(np.float32)
    D = np.abs(rng.randn(dim)).astype(np.float32) if with_D else None
    z = rng.randn(batch, dim, L).astype(np.float32) if with_z else None
    bias = rng.randn(dim).astype(np.float32) * 0.1 if with_bias else None
    return u, delta, A, B, C, D, z, bias


def _numpy_oracle(u, delta, A, B, C, D, z, bias, softplus=True):
    """Literal numpy transcription of the reference recurrence."""
    u, delta, A = u.astype(np.float64), delta.astype(np.float64), A.astype(np.float64)
    if bias is not None:
        delta = delta + bias[None, :, None]
    if softplus:
        delta = np.log1p(np.exp(delta))
    batch, dim, L = u.shape
    N = A.shape[1]
    if B.ndim == 4:
        H = dim // B.shape[1]
        Bx = np.repeat(B, H, axis=1).astype(np.float64)
        Cx = np.repeat(C, H, axis=1).astype(np.float64)
    else:
        Bx = np.broadcast_to(B[:, None].astype(np.float64), (batch, dim, N, L))
        Cx = np.broadcast_to(C[:, None].astype(np.float64), (batch, dim, N, L))
    h = np.zeros((batch, dim, N))
    ys = np.zeros((batch, dim, L))
    for t in range(L):
        dA = np.exp(delta[:, :, t, None] * A[None])
        dBu = delta[:, :, t, None] * Bx[:, :, :, t] * u[:, :, t, None]
        h = dA * h + dBu
        ys[:, :, t] = (h * Cx[:, :, :, t]).sum(-1)
    out = ys if D is None else ys + u * D[None, :, None]
    if z is not None:
        out = out * (z / (1 + np.exp(-z)))
    return out


class TestAgainstOracle:
    @pytest.mark.parametrize("groups", [None, 2])
    def test_ref_jax(self, rng, groups):
        inputs = _make_inputs(rng, groups=groups)
        expected = _numpy_oracle(*inputs)
        got = selective_scan_ref_jax(*[jnp.asarray(x) if x is not None else None
                                       for x in inputs], delta_softplus=True)
        assert np.allclose(np.asarray(got), expected, atol=1e-3, rtol=1e-4), \
            np.abs(np.asarray(got) - expected).max()

    @pytest.mark.parametrize("groups", [None, 2])
    @pytest.mark.parametrize("L", [16, 37, 260])
    def test_xla_chunked(self, rng, groups, L):
        inputs = _make_inputs(rng, L=L, groups=groups)
        expected = _numpy_oracle(*inputs)
        got = selective_scan_xla(*[jnp.asarray(x) if x is not None else None
                                   for x in inputs], delta_softplus=True, chunk=32)
        assert np.allclose(np.asarray(got), expected, atol=1e-3, rtol=1e-4), \
            np.abs(np.asarray(got) - expected).max()

    @pytest.mark.parametrize("groups", [None, 2])
    def test_pallas_interpret(self, rng, groups):
        inputs = _make_inputs(rng, dim=8, L=37, groups=groups)
        expected = _numpy_oracle(*inputs)
        got = selective_scan_pallas(*[jnp.asarray(x) if x is not None else None
                                      for x in inputs], delta_softplus=True,
                                    interpret=True)
        assert np.allclose(np.asarray(got), expected, atol=1e-3, rtol=1e-4), \
            np.abs(np.asarray(got) - expected).max()

    def test_no_optionals(self, rng):
        u, delta, A, B, C, _, _, _ = _make_inputs(rng, with_z=False, with_D=False,
                                                  with_bias=False)
        expected = _numpy_oracle(u, delta, A, B, C, None, None, None, softplus=False)
        got = selective_scan_xla(jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
                                 jnp.asarray(B), jnp.asarray(C))
        assert np.allclose(np.asarray(got), expected, atol=1e-3, rtol=1e-4)


class TestGradients:
    def test_xla_grad_matches_ref_grad(self, rng):
        inputs = _make_inputs(rng, batch=1, dim=3, dstate=4, L=19)
        args = [jnp.asarray(x) if x is not None else None for x in inputs]

        def loss_fn(impl):
            def f(u, delta, A, B, C, D, z, bias):
                out = impl(u, delta, A, B, C, D, z, bias, delta_softplus=True)
                return jnp.sum(out ** 2)
            return f

        g_ref = jax.grad(loss_fn(selective_scan_ref_jax), argnums=(0, 1, 2, 3, 4))(*args)
        g_xla = jax.grad(loss_fn(selective_scan_xla), argnums=(0, 1, 2, 3, 4))(*args)
        for gr, gx, name in zip(g_ref, g_xla, "u delta A B C".split()):
            assert np.allclose(np.asarray(gr), np.asarray(gx), atol=1e-3), \
                f"{name}: {np.abs(np.asarray(gr) - np.asarray(gx)).max()}"

    def test_pallas_grad_matches_ref_grad(self, rng):
        inputs = _make_inputs(rng, batch=1, dim=4, dstate=4, L=19, groups=2)
        args = [jnp.asarray(x) if x is not None else None for x in inputs]

        def f_ref(u, delta, A, B, C, D, z, bias):
            return jnp.sum(selective_scan_ref_jax(
                u, delta, A, B, C, D, z, bias, delta_softplus=True) ** 2)

        def f_pal(u, delta, A, B, C, D, z, bias):
            return jnp.sum(selective_scan_pallas(
                u, delta, A, B, C, D, z, bias, delta_softplus=True,
                interpret=True) ** 2)

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(*args)
        g_pal = jax.grad(f_pal, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(*args)
        for gr, gp, name in zip(g_ref, g_pal, "u delta A B C D z bias".split()):
            assert np.allclose(np.asarray(gr), np.asarray(gp), atol=2e-3), \
                f"{name}: {np.abs(np.asarray(gr) - np.asarray(gp)).max()}"


class TestFusedKernelPaths:
    """Exact parity for the hierarchical fast paths: L long enough that the
    chunked kernel takes the T % seq == 0 branch (fused-y forward; fused or
    2-pass backward), across multiple chunks so the inter-chunk carry and the
    reverse-order adjoint carry are both exercised. The small-L tests above
    (L=19/37) only ever hit the Hillis-Steele fallback."""

    @pytest.mark.parametrize("bwd_mode", ["fused", "2pass"])
    def test_multichunk_fwd_and_grad_match_ref(self, rng, bwd_mode, monkeypatch):
        import os
        monkeypatch.setenv("NNUZOO_SCAN_BWD", bwd_mode)
        monkeypatch.setenv("NNUZOO_SCAN_CHUNK", "128")
        # L = 2 chunks of 128; seq=16 divides T -> fused paths active
        inputs = _make_inputs(rng, batch=2, dim=4, dstate=4, L=256, groups=2)
        args = [jnp.asarray(x) if x is not None else None for x in inputs]

        expected = _numpy_oracle(*inputs)
        got = selective_scan_pallas(*args, delta_softplus=True, interpret=True)
        assert np.allclose(np.asarray(got), expected, atol=2e-3, rtol=1e-4), \
            np.abs(np.asarray(got) - expected).max()

        def f_ref(u, delta, A, B, C, D, z, bias):
            return jnp.sum(selective_scan_ref_jax(
                u, delta, A, B, C, D, z, bias, delta_softplus=True) ** 2)

        def f_pal(u, delta, A, B, C, D, z, bias):
            return jnp.sum(selective_scan_pallas(
                u, delta, A, B, C, D, z, bias, delta_softplus=True,
                interpret=True) ** 2)

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(*args)
        g_pal = jax.grad(f_pal, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(*args)
        for gr, gp, name in zip(g_ref, g_pal, "u delta A B C D z bias".split()):
            scale = max(1.0, float(jnp.max(jnp.abs(gr))))
            err = np.abs(np.asarray(gr) - np.asarray(gp)).max()
            assert err < 2e-3 * scale, f"{bwd_mode} {name}: {err} (scale {scale})"


def test_dispatcher_runs(rng):
    inputs = _make_inputs(rng, L=16)
    args = [jnp.asarray(x) if x is not None else None for x in inputs]
    out = selective_scan(*args, delta_softplus=True)
    assert out.shape == args[0].shape


class TestSSD:
    """Mamba2 chunked SSD (ops/ssd.py) vs the per-timestep recurrence."""

    def _inputs(self, B=2, L=100, H=4, P=8, G=2, N=16, seed=0):
        rng = np.random.RandomState(seed)
        return (jnp.asarray(rng.randn(B, L, H, P).astype(np.float32)),
                jnp.asarray(rng.randn(B, L, H).astype(np.float32)),
                -jnp.asarray(rng.rand(H).astype(np.float32) * 4 + 0.5),
                jnp.asarray(rng.randn(B, L, G, N).astype(np.float32)),
                jnp.asarray(rng.randn(B, L, G, N).astype(np.float32)),
                jnp.asarray(rng.rand(H).astype(np.float32)),
                jnp.asarray(rng.randn(H).astype(np.float32)))

    def test_matches_recurrence(self):
        from nnuzoo_tpu.ops.ssd import ssd_chunked, ssd_ref
        x, dt, A, B, C, D, db = self._inputs()
        y_ref = np.asarray(ssd_ref(x, dt, A, B, C, D, db))
        # chunk sizes that do / don't divide L (pad path)
        for Q in (32, 64):
            y = np.asarray(ssd_chunked(x, dt, A, B, C, D, db, chunk_size=Q))
            np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)

    def test_grads_match_recurrence(self):
        from nnuzoo_tpu.ops.ssd import ssd_chunked, ssd_ref
        x, dt, A, B, C, D, db = self._inputs(B=1, L=48, H=2, P=4, G=1, N=8)

        def loss(fn, *args):
            return jnp.sum(fn(*args) ** 2)

        g_c = jax.grad(lambda *a: loss(ssd_chunked, *a), argnums=(0, 1, 2, 3, 4))(
            x, dt, A, B, C)
        g_r = jax.grad(lambda *a: loss(ssd_ref, *a), argnums=(0, 1, 2, 3, 4))(
            x, dt, A, B, C)
        for a, b in zip(g_c, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)

    def test_mamba2_block_backends_agree(self):
        """The SSD path and the Mamba1-kernel broadcast path compute the same
        function (reference semantics: mamba_ssm.modules.mamba2.Mamba2)."""
        import os
        from nnuzoo_tpu.models.mamba import Mamba2Block
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 64, 16).astype(np.float32))
        blk = Mamba2Block(d_model=16, d_state=16, headdim=8)
        params = blk.init(jax.random.PRNGKey(0), x)
        old = os.environ.get("NNUZOO_SCAN_BACKEND")
        try:
            os.environ["NNUZOO_SCAN_BACKEND"] = "mamba1"
            y_m1 = np.asarray(blk.apply(params, x))
            os.environ.pop("NNUZOO_SCAN_BACKEND")
            y_ssd = np.asarray(blk.apply(params, x))
        finally:
            if old is not None:
                os.environ["NNUZOO_SCAN_BACKEND"] = old
            else:
                os.environ.pop("NNUZOO_SCAN_BACKEND", None)
        np.testing.assert_allclose(y_ssd, y_m1, rtol=2e-3, atol=2e-3)


def test_blkd_bf16_operands():
    """bf16 u/B/C operands on the pallas path (fp32 in-VMEM math, fp32 delta):
    matches the fp32 path within bf16 quantization error; grads flow."""
    from nnuzoo_tpu.ops.selective_scan import selective_scan_blkd
    interp = jax.devices()[0].platform != "tpu"   # CPU suite: interpret mode
    rng = np.random.RandomState(0)
    B, L, K, Dh, N = 2, 256, 4, 32, 16
    u = jnp.asarray(rng.randn(B, L, K, Dh).astype(np.float32))
    delta = jnp.asarray(rng.randn(B, L, K, Dh).astype(np.float32))
    A = -jnp.abs(jnp.asarray(rng.randn(K * Dh, N).astype(np.float32)))
    Bm = jnp.asarray(rng.randn(B, L, K, N).astype(np.float32))
    Cm = jnp.asarray(rng.randn(B, L, K, N).astype(np.float32))

    y32 = selective_scan_blkd(u, delta, A, Bm, Cm, delta_softplus=True,
                              backend="pallas", interpret=interp)
    y16 = selective_scan_blkd(u.astype(jnp.bfloat16), delta, A,
                              Bm.astype(jnp.bfloat16),
                              Cm.astype(jnp.bfloat16), delta_softplus=True,
                              backend="pallas", interpret=interp)
    assert y16.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(y32)))
    assert float(jnp.max(jnp.abs(y16.astype(jnp.float32) - y32))) < 0.03 * scale

    def loss(u_, b_, c_):
        return jnp.sum(selective_scan_blkd(
            u_, delta, A, b_, c_, delta_softplus=True, backend="pallas",
            interpret=interp).astype(jnp.float32) ** 2)

    gu, gb, gc = jax.grad(loss, argnums=(0, 1, 2))(
        u.astype(jnp.bfloat16), Bm.astype(jnp.bfloat16),
        Cm.astype(jnp.bfloat16))
    assert gu.dtype == jnp.bfloat16
    for g in (gu, gb, gc):
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())


def test_huge_kd_vmem_fallback():
    """Shapes whose kernel tile would blow Mosaic's 16 MB scoped VMEM (the
    SwinUMamba stage-4 canonical crash: L=56, KD=6144) must dispatch to the
    XLA scan and still match the reference recurrence."""
    from nnuzoo_tpu.ops.selective_scan import (_pallas_vmem_fits,
                                               selective_scan_blkd,
                                               selective_scan_packed,
                                               selective_scan_ref_jax)
    assert _pallas_vmem_fits(16, 128)       # flagship shape stays on pallas
    assert _pallas_vmem_fits(16, 3072)      # SwinUMamba stage 3: still fits
    assert not _pallas_vmem_fits(16, 6144)  # SwinUMamba stage 4: falls back

    rng = np.random.RandomState(0)
    B, L, K, Dh, N = 1, 8, 4, 1536, 16      # KD = 6144
    u = rng.randn(B, L, K, Dh).astype(np.float32)
    delta = rng.rand(B, L, K, Dh).astype(np.float32)
    A = -np.abs(rng.randn(K * Dh, N).astype(np.float32))
    Bm = rng.randn(B, L, K, N).astype(np.float32)
    Cm = rng.randn(B, L, K, N).astype(np.float32)
    D = rng.randn(K * Dh).astype(np.float32)

    # "pallas" request at this shape must transparently take the XLA path
    y = selective_scan_blkd(jnp.asarray(u), jnp.asarray(delta), jnp.asarray(A),
                            jnp.asarray(Bm), jnp.asarray(Cm), D=jnp.asarray(D),
                            delta_softplus=True, backend="pallas")

    # oracle in mamba convention: (B, dim=K*Dh, L), grouped B/C (B, K, N, L)
    u_c = np.transpose(u, (0, 2, 3, 1)).reshape(B, K * Dh, L)
    d_c = np.transpose(delta, (0, 2, 3, 1)).reshape(B, K * Dh, L)
    y_ref = selective_scan_ref_jax(
        jnp.asarray(u_c), jnp.asarray(d_c), jnp.asarray(A),
        jnp.asarray(np.transpose(Bm, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(Cm, (0, 2, 3, 1))), D=jnp.asarray(D),
        delta_softplus=True)
    y_ref = jnp.transpose(y_ref.reshape(B, K, Dh, L), (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-4,
                               rtol=2e-4)

    # packed entry falls back identically
    bc = np.concatenate([Bm, Cm], axis=3).reshape(B, L, K * 2 * N)
    y_p = selective_scan_packed(
        jnp.asarray(u.reshape(B, L, K * Dh)),
        jnp.asarray(delta.reshape(B, L, K * Dh)),
        jnp.asarray(A.T), jnp.asarray(bc), D=jnp.asarray(D),
        delta_softplus=True)
    np.testing.assert_allclose(np.asarray(y_p),
                               np.asarray(y).reshape(B, L, K * Dh), atol=1e-5)
