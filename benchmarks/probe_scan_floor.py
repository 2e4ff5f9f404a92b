"""Decompose the scan kernel's forward time at the canonical stage-1 shape.

Runs a family of kernels that share the REAL fwd kernel's grid, BlockSpecs and
operand dtypes but do staged subsets of its body:

    copy      y = u (DMA + grid overhead floor)
    unpack    y = rowsum(Bx + Cx)            (the lane->(N,Dh) broadcast cost)
    exp2      y = rowsum(exp2(delta*A2))     (the (T,N,KD) transcendental)
    dabu      y = rowsum(dA + dBu)           (exp2 + operand construction)
    scan1     pass-1 subchunk scan only
    full      the real _fwd_kernel

Each stage's time minus the previous isolates one component. Timings fence
with device-side scalar sums (the axon relay makes block_until_ready a no-op).

    python benchmarks/probe_scan_floor.py [--chunk 128] [--seq 16]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib

# nnuzoo_tpu.ops.__init__ rebinds the attribute `selective_scan` to the
# FUNCTION, so a plain `import nnuzoo_tpu.ops.selective_scan as ss` would
# bind that function, not the module
ss = importlib.import_module("nnuzoo_tpu.ops.selective_scan")

B, L, K, Dh, N = 12, 256 * 224, 4, 32, 16
KD = K * Dh


def bench(fn, args, reps=8, rounds=3):
    out = fn(*args)
    f = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = []
    for _ in range(rounds):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        f += float(jax.tree_util.tree_leaves(out)[0].sum())
        best.append((time.time() - t0) / reps * 1e3)
    return float(np.median(best))


def nplane_kernel(u_ref, delta_ref, a_mat_ref, bc_ref, s_ref, y_ref, carry_ref,
                  h_scratch, *, stage: str, seq: int):
    """State space as N separate (T, KD) planes. B/C unpack happens on the
    MXU: per plane n, [Bx_n | Cx_n] (T, 2KD) = bc (T, 2KN) @ S_n (2KN, 2KD)
    with S a constant 0/1 selection operand — no lane->sublane transpose.

    stage="munpack": matmul unpack only (compare against "unpack").
    stage="mfull":   the complete fwd math in plane layout.
    """
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    T = u_ref.shape[1]
    u = u_ref[0].astype(jnp.float32)          # (T, KD)
    delta = delta_ref[0].astype(jnp.float32)  # (T, KD)
    A = a_mat_ref[...]                        # (N, KD)
    bc = bc_ref[0]                            # (T, 2KN) bf16
    carry_ref[0, 0] = h_scratch[...]
    A2 = A * ss._LOG2E

    KDl = u.shape[1]
    if stage == "munpack":
        acc = jnp.zeros((T, KDl), jnp.float32)
        for n in range(N):
            # DEFAULT precision: bc is bf16 data and S is a 0/1 matrix exactly
            # representable in bf16, so bf16xbf16->f32 MXU accumulate is exact.
            # (HIGHEST with bf16 operands fails Mosaic: "Bad lhs type".)
            bxcx = jax.lax.dot_general(
                bc, s_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (T, 2KD)
            acc = acc + bxcx[:, :KDl] + bxcx[:, KDl:]
        y_ref[0] = acc.astype(y_ref.dtype)
        return

    if stage == "m1unpack":
        # single (T, 2KN) @ (2KN, N*2KD) matmul; planes live side by side on
        # lanes and are sliced out at 2KD granularity (lane-aligned).
        allp = jax.lax.dot_general(
            bc, s_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (T, N*2KD)
        acc = jnp.zeros((T, KDl), jnp.float32)
        for n in range(N):
            sl = allp[:, n * 2 * KDl:(n + 1) * 2 * KDl]
            acc = acc + sl[:, :KDl] + sl[:, KDl:]
        y_ref[0] = acc.astype(y_ref.dtype)
        return

    if stage == "m2full":
        # MXU unpack with planes STACKED ON THE LEADING AXIS: (N, T, 2KD).
        # Leading-dim stacking is layout-free (tile buffers concatenate), and
        # every subchunk-scan op below runs on (N, ns, KD) = 16-vreg slabs
        # across all planes at once — vs mfull's per-plane (ns, KD) 1-vreg ops.
        ns = T // seq
        du = delta * u                                   # (T, KD)
        planes = [
            jax.lax.dot_general(bc, s_ref[n], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            for n in range(N)]
        allp = jnp.stack(planes, axis=0)                 # (N, T, 2KD)
        Bx = allp[:, :, :KDl].reshape(N, ns, seq, KDl)
        Cx = allp[:, :, KDl:].reshape(N, ns, seq, KDl)
        d4 = delta.reshape(1, ns, seq, KDl)
        du4 = du.reshape(1, ns, seq, KDl)
        dA = jnp.exp2(d4 * A2[:, None, None, :])         # (N, ns, seq, KD)
        dBu = du4 * Bx
        # pass 1: subchunk b-totals, all planes at once
        cur_b = dBu[:, :, 0]
        for s in range(1, seq):
            cur_b = dA[:, :, s] * cur_b + dBu[:, :, s]
        dsum = jnp.sum(d4, axis=2)                       # (1, ns, KD)
        tot_a = jnp.exp2(dsum * A2[:, None, :])          # (N, ns, KD)
        h = h_scratch[...]                               # (N, KD)
        hs = [None] * ns
        for i in range(ns):
            hs[i] = h
            h = tot_a[:, i] * h + cur_b[:, i]
        h_scratch[...] = h
        st = jnp.stack(hs, axis=1)                       # (N, ns, KD)
        yp = [None] * seq
        for s in range(seq):
            st = dA[:, :, s] * st + dBu[:, :, s]
            yp[s] = st * Cx[:, :, s]
        yfull = jnp.stack(yp, axis=2)                    # (N, ns, seq, KD)
        y = jnp.sum(yfull, axis=0).reshape(T, KDl)       # 15 adds of 16 vregs
        y_ref[0] = y.astype(y_ref.dtype)
        return

    if stage == "mfull":
        ns = T // seq
        du = delta * u                                   # (T, KD)
        d4 = delta.reshape(ns, seq, KDl)
        du4 = du.reshape(ns, seq, KDl)
        dsum = jnp.sum(d4, axis=1)                       # (ns, KD)
        h0 = h_scratch[...]                              # (N, KD)
        ys = [jnp.zeros((ns, KDl), jnp.float32) for _ in range(seq)]
        h_exit = []
        for n in range(N):
            bxcx = jax.lax.dot_general(
                bc, s_ref[n], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (T, 2KD)
            Bx = bxcx[:, :KDl].reshape(ns, seq, KDl)
            Cx = bxcx[:, KDl:].reshape(ns, seq, KDl)
            A2n = A2[n]                                  # (KD,)
            dA = jnp.exp2(d4 * A2n[None, None, :])       # (ns, seq, KD)
            dBu = du4 * Bx
            # pass 1: subchunk b-totals
            cur_b = dBu[:, 0]
            for s in range(1, seq):
                cur_b = dA[:, s] * cur_b + dBu[:, s]
            tot_a = jnp.exp2(dsum * A2n[None, :])        # (ns, KD)
            # entering carry per subchunk (sequential tiny combine)
            hs = [None] * ns
            h = h0[n]
            for i in range(ns):
                hs[i] = h
                h = tot_a[i] * h + cur_b[i]
            h_exit.append(h)
            st = jnp.stack(hs, axis=0)                   # (ns, KD)
            # pass 2: states on the fly, contracted immediately
            for s in range(seq):
                st = dA[:, s] * st + dBu[:, s]
                ys[s] = ys[s] + st * Cx[:, s]
        y_ref[0] = jnp.stack(ys, axis=1).reshape(T, KDl).astype(y_ref.dtype)
        h_scratch[...] = jnp.stack(h_exit, axis=0)
        return
    raise ValueError(stage)


def run_nplane(stage, T, seq, u, dt, bc, A_t, Smat):
    nl = L // T
    grid = (B, nl)
    if stage.startswith("m1"):
        # flatten planes onto lanes: (1, 2KN, N*2KD)
        Smat = jnp.transpose(Smat, (1, 0, 2)).reshape(
            1, 2 * K * N, N * 2 * KD)
    ud_spec = pl.BlockSpec((1, T, KD), lambda b, l: (b, l, 0))
    a_spec = pl.BlockSpec((N, KD), lambda b, l: (0, 0))
    bc_spec = pl.BlockSpec((1, T, 2 * K * N), lambda b, l: (b, l, 0))
    s_spec = pl.BlockSpec(Smat.shape, lambda b, l: (0, 0, 0))
    carry_spec = pl.BlockSpec((1, 1, N, KD), lambda b, l: (b, l, 0, 0))

    @jax.jit
    def f(u, dt, bc):
        y, _ = pl.pallas_call(
            partial(nplane_kernel, stage=stage, seq=seq),
            grid=grid,
            in_specs=[ud_spec, ud_spec, a_spec, bc_spec, s_spec],
            out_specs=(ud_spec, carry_spec),
            out_shape=(jax.ShapeDtypeStruct((B, L, KD), u.dtype),
                       jax.ShapeDtypeStruct((B, nl, N, KD), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((N, KD), jnp.float32)],
        )(u, dt, A_t, bc, Smat)
        return y

    return f


def make_selection(K, Dh, N, dtype):
    """S (N, 2KN, 2KD): S[n, k*2N+n, k*Dh+d] = 1 and
    S[n, k*2N+N+n, KD+k*Dh+d] = 1 — bc @ S_n == [Bx_n | Cx_n]."""
    KD = K * Dh
    S = np.zeros((N, 2 * K * N, 2 * KD), np.float32)
    for n in range(N):
        for k in range(K):
            S[n, k * 2 * N + n, k * Dh:(k + 1) * Dh] = 1.0
            S[n, k * 2 * N + N + n, KD + k * Dh:KD + (k + 1) * Dh] = 1.0
    return jnp.asarray(S, dtype)


def staged_kernel(u_ref, delta_ref, a_mat_ref, bc_ref, y_ref, carry_ref,
                  h_scratch, *, stage: str, seq: int):
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    if stage == "copy":
        y_ref[0] = u_ref[0]
        carry_ref[0, 0] = h_scratch[...]
        return

    u = u_ref[0].astype(jnp.float32)
    delta = delta_ref[0].astype(jnp.float32)
    A = a_mat_ref[...]
    carry_ref[0, 0] = h_scratch[...]
    A2 = A * ss._LOG2E

    if stage == "unpack":
        Bx, Cx = ss._unpack_bc_lanes(bc_ref[0].astype(jnp.float32), K, Dh, N)
        y_ref[0] = jnp.sum(Bx + Cx, axis=1).astype(y_ref.dtype)
        return
    if stage == "exp2":
        dA = jnp.exp2(delta[:, None, :] * A2[None, :, :])
        y_ref[0] = jnp.sum(dA, axis=1).astype(y_ref.dtype)
        return
    if stage == "dabu":
        Bx, Cx = ss._unpack_bc_lanes(bc_ref[0].astype(jnp.float32), K, Dh, N)
        dA = jnp.exp2(delta[:, None, :] * A2[None, :, :])
        dBu = (delta * u)[:, None, :] * Bx
        y_ref[0] = jnp.sum(dA + dBu + Cx, axis=1).astype(y_ref.dtype)
        return
    if stage == "scan1":
        Bx, Cx = ss._unpack_bc_lanes(bc_ref[0].astype(jnp.float32), K, Dh, N)
        dA = jnp.exp2(delta[:, None, :] * A2[None, :, :])
        dBu = (delta * u)[:, None, :] * Bx
        T = delta.shape[0]
        ns = T // seq
        a4 = dA.reshape(ns, seq, N, KD)
        b4 = dBu.reshape(ns, seq, N, KD)
        cur_b = b4[:, 0]
        for s in range(1, seq):
            cur_b = a4[:, s] * cur_b + b4[:, s]
        tot = jnp.sum(cur_b, axis=1)                            # (ns, KD)
        y_ref[0] = jnp.broadcast_to(tot[:, None, :],
                                    (ns, seq, tot.shape[-1])
                                    ).reshape(T, -1).astype(y_ref.dtype)
        return
    raise ValueError(stage)


def run_staged(stage, T, seq, u, dt, bc, A_t):
    nl = L // T
    grid = (B, nl)
    ud_spec = pl.BlockSpec((1, T, KD), lambda b, l: (b, l, 0))
    a_spec = pl.BlockSpec((N, KD), lambda b, l: (0, 0))
    bc_spec = pl.BlockSpec((1, T, 2 * K * N), lambda b, l: (b, l, 0))
    carry_spec = pl.BlockSpec((1, 1, N, KD), lambda b, l: (b, l, 0, 0))

    @jax.jit
    def f(u, dt, bc):
        y, _ = pl.pallas_call(
            partial(staged_kernel, stage=stage, seq=seq),
            grid=grid,
            in_specs=[ud_spec, ud_spec, a_spec, bc_spec],
            out_specs=(ud_spec, carry_spec),
            out_shape=(jax.ShapeDtypeStruct((B, L, KD), u.dtype),
                       jax.ShapeDtypeStruct((B, nl, N, KD), jnp.float32)),
            scratch_shapes=[pltpu.VMEM((N, KD), jnp.float32)],
        )(u, dt, A_t, bc)
        return y

    return f


if __name__ == "__main__":
    chunk = 128
    seq = 16
    for i, a in enumerate(sys.argv):
        if a == "--chunk":
            chunk = int(sys.argv[i + 1])
        if a == "--seq":
            seq = int(sys.argv[i + 1])
    os.environ["NNUZOO_SCAN_CHUNK"] = str(chunk)
    os.environ["NNUZOO_SCAN_SEQ"] = str(seq)

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(B, L, KD).astype(np.float32)).astype(jnp.bfloat16)
    dt = jnp.asarray(rng.rand(B, L, KD).astype(np.float32) * 0.5)
    bc = jnp.asarray(rng.randn(B, L, 2 * K * N).astype(np.float32)
                     ).astype(jnp.bfloat16)
    A_t = -jnp.exp(jnp.asarray(rng.rand(N, KD).astype(np.float32)))
    D = jnp.asarray(rng.randn(KD).astype(np.float32))

    stages = ["copy", "unpack", "exp2", "dabu", "scan1"]
    if "--nplane-only" in sys.argv:
        stages = []
    prev = 0.0
    for stage in stages:
        t = bench(run_staged(stage, chunk, seq, u, dt, bc, A_t), (u, dt, bc))
        print(f"{stage:8s}: {t:7.2f} ms  (delta {t - prev:+7.2f})", flush=True)
        prev = t

    if stages:
        def full(u, dt, bc):
            return ss.selective_scan_packed(u, dt, A_t, bc, D=D)

        t = bench(jax.jit(full), (u, dt, bc))
        print(f"{'full':8s}: {t:7.2f} ms  (delta {t - prev:+7.2f})", flush=True)

    # ---- N-plane (MXU-unpack) variants ----
    Smat = make_selection(K, Dh, N, bc.dtype)
    for stage in ["munpack", "m1unpack", "mfull", "m2full"]:
        t = bench(run_nplane(stage, chunk, seq, u, dt, bc, A_t, Smat),
                  (u, dt, bc))
        print(f"{stage:8s}: {t:7.2f} ms", flush=True)
