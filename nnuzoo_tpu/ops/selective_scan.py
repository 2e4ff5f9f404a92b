"""Mamba selective scan for TPU.

Replaces the CUDA ``selective_scan_cuda`` extension. Semantics exactly follow the
reference recurrence (`nnunetv2/nets/seg_mamba/selective_scan_interface.py:86-152`):

    delta' = softplus(delta + delta_bias)            (optional)
    h_t    = exp(delta'_t * A) * h_{t-1} + delta'_t * B_t * u_t     (fp32 state)
    y_t    = C_t . h_t  (+ D * u)  (* silu(z))

Public API shapes (mamba convention): u/delta/z (B, D, L); A (D, N);
B/C (B, N, L) or grouped (B, G, N, L); D (D,); delta_bias (D,).

Implementations:

- :func:`selective_scan_ref_jax` — per-timestep ``lax.scan``; ground truth for tests.
- :func:`selective_scan_xla` — chunked scan: ``lax.scan`` over L-chunks with
  ``lax.associative_scan`` inside. O(L log T) work, bounded memory, autodiff.
- :func:`selective_scan_pallas` — Pallas TPU kernel with custom VJP. Forward:
  grid (G, L-chunks sequential), VMEM-resident (T, N, D) tiles, exp(delta*A)
  computed in-kernel (never hits HBM), Hillis-Steele intra-chunk scan, fp32 carry
  in VMEM scratch, per-chunk boundary states saved for the backward. Backward:
  one reverse-ordered kernel that recomputes states from the saved chunk carries
  and runs the adjoint reverse scan — flash-attention-style recomputation, nothing
  of size O(L*N*D) ever materializes in HBM.

``selective_scan`` dispatches: Pallas on TPU, XLA elsewhere.
"""

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# ------------------------------------------------------------------ normalization
def _apply_delta_bias(delta, delta_bias, delta_softplus):
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return delta


def _expand_bc(Bmat, Cmat, dim):
    """B/C (batch, N, L) or (batch, G, N, L) -> (batch, D, N, L) broadcast views."""
    Bmat = Bmat.astype(jnp.float32)
    Cmat = Cmat.astype(jnp.float32)
    if Bmat.ndim == 4:
        Bmat = jnp.repeat(Bmat, dim // Bmat.shape[1], axis=1)
    else:
        Bmat = jnp.broadcast_to(Bmat[:, None],
                                (Bmat.shape[0], dim, Bmat.shape[1], Bmat.shape[2]))
    if Cmat.ndim == 4:
        Cmat = jnp.repeat(Cmat, dim // Cmat.shape[1], axis=1)
    else:
        Cmat = jnp.broadcast_to(Cmat[:, None],
                                (Cmat.shape[0], dim, Cmat.shape[1], Cmat.shape[2]))
    return Bmat, Cmat


def _finalize(y, u32, D, z, dtype_in):
    out = y if D is None else y + u32 * D.astype(jnp.float32)[None, :, None]
    if z is not None:
        out = out * jax.nn.silu(z.astype(jnp.float32))
    return out.astype(dtype_in)


# ------------------------------------------------------------------ reference
def selective_scan_ref_jax(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                           delta_softplus=False, return_last_state=False):
    """Direct per-timestep recurrence; the test oracle."""
    dtype_in = u.dtype
    u32 = u.astype(jnp.float32)
    delta32 = _apply_delta_bias(delta, delta_bias, delta_softplus)
    A32 = A.astype(jnp.float32)
    B32, C32 = _expand_bc(B, C, u.shape[1])

    deltaA = jnp.exp(jnp.einsum("bdl,dn->bdln", delta32, A32))
    deltaB_u = jnp.einsum("bdl,bdnl,bdl->bdln", delta32, B32, u32)

    def step(h, inputs):
        dA_t, dBu_t, C_t = inputs
        h = dA_t * h + dBu_t
        return h, jnp.sum(h * C_t, axis=-1)

    batch, dim, dstate = u.shape[0], A.shape[0], A.shape[1]
    h0 = jnp.zeros((batch, dim, dstate), jnp.float32)
    xs = (jnp.moveaxis(deltaA, 2, 0), jnp.moveaxis(deltaB_u, 2, 0),
          jnp.moveaxis(C32, 3, 0))
    last, ys = jax.lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 2)
    out = _finalize(y, u32, D, z, dtype_in)
    return (out, last) if return_last_state else out


# ------------------------------------------------------------------ XLA chunked
def selective_scan_xla(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                       delta_softplus=False, return_last_state=False,
                       chunk: int = 128):
    """Chunked associative scan, pure XLA, autodiff-differentiable."""
    dtype_in = u.dtype
    u32 = u.astype(jnp.float32)
    delta32 = _apply_delta_bias(delta, delta_bias, delta_softplus)
    A32 = A.astype(jnp.float32)
    B32, C32 = _expand_bc(B, C, u.shape[1])

    batch, dim, L = u32.shape
    dstate = A32.shape[1]
    pad = (-L) % chunk
    if pad:
        u32p = jnp.pad(u32, ((0, 0), (0, 0), (0, pad)))
        delta32 = jnp.pad(delta32, ((0, 0), (0, 0), (0, pad)))
        B32 = jnp.pad(B32, ((0, 0), (0, 0), (0, 0), (0, pad)))
        C32 = jnp.pad(C32, ((0, 0), (0, 0), (0, 0), (0, pad)))
    else:
        u32p = u32
    Lp = L + pad
    nc = Lp // chunk

    u_c = jnp.moveaxis(u32p.reshape(batch, dim, nc, chunk), 2, 0)
    d_c = jnp.moveaxis(delta32.reshape(batch, dim, nc, chunk), 2, 0)
    B_c = jnp.moveaxis(B32.reshape(batch, dim, dstate, nc, chunk), 3, 0)
    C_c = jnp.moveaxis(C32.reshape(batch, dim, dstate, nc, chunk), 3, 0)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    def chunk_step(h, inputs):
        u_t, d_t, B_t, C_t = inputs
        dA = jnp.exp(d_t[:, :, None, :] * A32[None, :, :, None])
        dBu = d_t[:, :, None, :] * B_t * u_t[:, :, None, :]
        a_cum, b_cum = jax.lax.associative_scan(combine, (dA, dBu), axis=3)
        states = a_cum * h[..., None] + b_cum
        y = jnp.sum(states * C_t, axis=2)
        return states[..., -1], y

    h0 = jnp.zeros((batch, dim, dstate), jnp.float32)
    last, ys = jax.lax.scan(chunk_step, h0, (u_c, d_c, B_c, C_c))
    y = jnp.moveaxis(ys, 0, 2).reshape(batch, dim, Lp)[:, :, :L]
    out = _finalize(y, u32, D, z, dtype_in)
    return (out, last) if return_last_state else out


# ===================================================================== Pallas
_LOG2E = 1.4426950408889634  # exp(x) == exp2(x * log2(e)); exp2 is ~2.3x
#                              cheaper than exp on the v5e VPU

# Kernel contract ("K-packed"): the K cross-scan directions live in the CHANNEL
# (lane) dimension, so small per-direction widths (e.g. SS2D d_inner=32, K=4)
# still fill the 128-lane VPU. Shapes:
#   u, delta : (B, L, K*Dh) fp32, L % T == 0    (pure reshape of (B, L, K, Dh))
#   A        : (N, K*Dh)    fp32
#   Bmat,Cmat: (B, L, K, N) fp32 (per-direction; expanded across Dh in-kernel)
#   y        : (B, L, K*Dh)
#   carries  : (B, NL, N, K*Dh) chunk-entry states saved for the backward.
# K and Dh are static. K=1 recovers the plain (grouped-by-batch) scan.

def _hillis_steele(a, b, up: bool = False):
    """Flat Hillis-Steele scan over axis 0 (fallback for short/ragged T).

    up=False (prefix): h_t = a_t h_{t-1} + b_t. up=True (suffix):
    h_t = a_t h_{t+1} + b_t. Returns (a_cum, b_cum) with
    h_t = a_cum_t * h_boundary + b_cum_t."""
    T = a.shape[0]
    d = 1
    while d < T:
        if up:
            a_sh = jnp.concatenate([a[d:], jnp.ones_like(a[:d])], axis=0)
            b_sh = jnp.concatenate([b[d:], jnp.zeros_like(b[:d])], axis=0)
        else:
            a_sh = jnp.concatenate([jnp.ones_like(a[:d]), a[:-d]], axis=0)
            b_sh = jnp.concatenate([jnp.zeros_like(b[:d]), b[:-d]], axis=0)
        b = a * b_sh + b
        a = a * a_sh
        d *= 2
    return a, b


def _scan_pair(a, b, up: bool = False, seq: int = 16):
    """Linear-recurrence scan over axis 0, hierarchical.

    Same contract as :func:`_hillis_steele` but ~3x fewer VPU ops at T=128:
    flat HS costs 3*log2(T) multiply-adds per element plus two full-array
    shifts per round; here subchunks of ``seq`` positions scan SEQUENTIALLY
    (vectorized across the T/seq subchunks: 3 ops/element total), the
    subchunk totals combine with a tiny HS over T/seq entries, and a final
    broadcast applies the inter-subchunk carries (3 ops/element). The scan
    kernels are VPU-compute-bound on v5e, so this is a direct step-time cut.
    """
    T = a.shape[0]
    if T <= seq or T % seq:
        return _hillis_steele(a, b, up)
    ns = T // seq
    rest = a.shape[1:]
    a4 = a.reshape(ns, seq, *rest)
    b4 = b.reshape(ns, seq, *rest)
    order = range(seq - 1, -1, -1) if up else range(seq)
    outs_a = [None] * seq
    outs_b = [None] * seq
    cur_a = cur_b = None
    for s in order:
        if cur_a is None:
            cur_a, cur_b = a4[:, s], b4[:, s]
        else:
            cur_b = a4[:, s] * cur_b + b4[:, s]
            cur_a = a4[:, s] * cur_a
        outs_a[s] = cur_a
        outs_b[s] = cur_b
    # combine subchunk totals (the loop ends holding them), then the
    # EXCLUSIVE cum is the carry entering each subchunk
    ca, cb = _hillis_steele(cur_a, cur_b, up)
    if up:
        ca = jnp.concatenate([ca[1:], jnp.ones_like(ca[:1])], axis=0)
        cb = jnp.concatenate([cb[1:], jnp.zeros_like(cb[:1])], axis=0)
    else:
        ca = jnp.concatenate([jnp.ones_like(ca[:1]), ca[:-1]], axis=0)
        cb = jnp.concatenate([jnp.zeros_like(cb[:1]), cb[:-1]], axis=0)
    a_out = jnp.stack([outs_a[s] * ca for s in range(seq)], axis=1)
    b_out = jnp.stack([outs_a[s] * cb + outs_b[s] for s in range(seq)], axis=1)
    return a_out.reshape(T, *rest), b_out.reshape(T, *rest)


def _scan_states(a, b, h0, up: bool = False, seq: int = 16):
    """Linear-recurrence scan that folds the boundary-carry application into
    the hierarchical combine: returns the STATES directly given the entering
    carry ``h0`` (shape = a.shape[1:]).

    up=False: h_t = a_t h_{t-1} + b_t with h_{-1} = h0.
    up=True (suffix): h_t = a_t h_{t+1} + b_t with h_T = h0.

    vs ``_scan_pair`` + ``a_cum * h0 + b_cum``: the per-element inter-subchunk
    carry broadcast (2 ops) and the boundary application (2 ops) collapse into
    ONE fused multiply-add per element — the carries combine sequentially at
    subchunk granularity (T/seq tiny (rest,)-shaped steps), which is exact, not
    an approximation. The scan kernels are VPU-instruction-bound on v5e, so
    this is a direct step-time cut."""
    T = a.shape[0]
    if T <= seq or T % seq:
        ca, cb = _hillis_steele(a, b, up)
        return ca * h0[None] + cb
    ns = T // seq
    rest = a.shape[1:]
    a4 = a.reshape(ns, seq, *rest)
    b4 = b.reshape(ns, seq, *rest)
    order = range(seq - 1, -1, -1) if up else range(seq)
    outs_a = [None] * seq
    outs_b = [None] * seq
    cur_a = cur_b = None
    for s in order:
        if cur_a is None:
            cur_a, cur_b = a4[:, s], b4[:, s]
        else:
            cur_b = a4[:, s] * cur_b + b4[:, s]
            cur_a = a4[:, s] * cur_a
        outs_a[s] = cur_a
        outs_b[s] = cur_b
    # entering carry per subchunk, combined sequentially over the ns totals
    # ((ns, rest)-shaped slices; ns-1 tiny FMAs)
    hs = [None] * ns
    idx = range(ns - 1, -1, -1) if up else range(ns)
    h = h0
    for i in idx:
        hs[i] = h
        h = cur_a[i] * h + cur_b[i]
    hstack = jnp.stack(hs, axis=0)[:, None]                     # (ns,1,*rest)
    states = (jnp.stack(outs_a, axis=1) * hstack +
              jnp.stack(outs_b, axis=1))
    return states.reshape(T, *rest)


def _subchunk_carries(tot_a, tot_b, h0, up: bool):
    """Sequential combine over the ns subchunk totals: returns the (ns, *rest)
    stack of boundary states ENTERING each subchunk (from the left for
    prefix scans, from the right for suffix scans) plus the chunk-exit state.
    ns is small (T/seq), so these are tiny (rest,)-shaped FMAs."""
    ns = tot_a.shape[0]
    hs = [None] * ns
    idx = range(ns - 1, -1, -1) if up else range(ns)
    h = h0
    for i in idx:
        hs[i] = h
        h = tot_a[i] * h + tot_b[i]
    return jnp.stack(hs, axis=0), h


def _scan_fused_y(dA, dBu, dsum, A2, h0, Cx, seq: int = 16):
    """Forward scan with the output contraction FUSED into the second pass:
    returns (y (T, KD), chunk-exit state (N, KD)) without ever materializing
    the (T, N, KD) state stack.

    Two-pass structure (the kernels are VPU-instruction-bound, so every
    per-element op counts):
      pass 1  — sequential subchunk scan of the b-part only (ONE fused
                multiply-add per element; the old `_scan_states` also chained
                the a-products, +1 op/el);
      totals  — per-subchunk decay totals come from exp(A * subchunk-delta-sum)
                (exp of the SUM == product of the exps, at 1/seq the element
                count) instead of the per-element product chain;
      pass 2  — re-run the recurrence with the true entering carries folded in
                (one FMA) and contract each step against C immediately
                (multiply + N-axis add), emitting (ns, KD) rows.
    """
    T, N, KD = dA.shape
    ns = T // seq
    a4 = dA.reshape(ns, seq, N, KD)
    b4 = dBu.reshape(ns, seq, N, KD)
    c4 = Cx.reshape(ns, seq, N, KD)
    # pass 1: subchunk b-totals
    cur_b = b4[:, 0]
    for s in range(1, seq):
        cur_b = a4[:, s] * cur_b + b4[:, s]
    tot_a = jnp.exp2(dsum[:, None, :] * A2[None, :, :])        # (ns, N, KD)
    hs, _ = _subchunk_carries(tot_a, cur_b, h0, up=False)
    # pass 2: states on the fly, contracted straight into y
    st = hs
    ys = []
    for s in range(seq):
        st = a4[:, s] * st + b4[:, s]
        ys.append(jnp.sum(st * c4[:, s], axis=1))              # (ns, KD)
    y = jnp.stack(ys, axis=1).reshape(T, KD)
    h_exit = jnp.squeeze(jax.lax.slice_in_dim(st, ns - 1, ns, axis=0), axis=0)
    return y, h_exit


def _scan_states_2pass(a, b, dsum, A2, h0, up: bool = False, seq: int = 16):
    """Like :func:`_scan_states` but with the a-product chain replaced by
    exp2-of-subchunk-delta-sums (``dsum`` (ns, KD); pass a=alpha, A2=A*log2e
    and the SHIFTED delta sums for suffix scans). Materializes the (T, N, KD)
    states (the backward needs them elementwise). Saves 1 op/element over
    `_scan_states` and the (T,N,KD) outs_a stack."""
    T = a.shape[0]
    ns = T // seq
    rest = a.shape[1:]
    a4 = a.reshape(ns, seq, *rest)
    b4 = b.reshape(ns, seq, *rest)
    order = list(range(seq - 1, -1, -1)) if up else list(range(seq))
    cur_b = b4[:, order[0]]
    for s in order[1:]:
        cur_b = a4[:, s] * cur_b + b4[:, s]
    tot_a = jnp.exp2(dsum[:, None, :] * A2[None, :, :])
    hs, _ = _subchunk_carries(tot_a, cur_b, h0, up)
    st = hs
    outs = [None] * seq
    for s in order:
        st = a4[:, s] * st + b4[:, s]
        outs[s] = st
    return jnp.stack(outs, axis=1).reshape(T, *rest)


def _unpack_bc_lanes(M, K: int, Dh: int, N: int):
    """(T, K*2N) packed [B_k | C_k] lane blocks -> two (T, N, K*Dh) arrays.

    The packed layout keeps the B/C coefficients lane-compact in HBM: the old
    (B, L, K, N) operand tiled as T(8,128) padded N=16 lanes to 128 (8-16x HBM
    blowup, see the r2 OOM dump); (B, L, K*2N) is exactly 128 lanes for the
    SS2D K=4, N=16 case."""
    T = M.shape[0]
    b_parts, c_parts = [], []
    for k in range(K):
        bk = jax.lax.slice_in_dim(M, k * 2 * N, k * 2 * N + N, axis=1)  # (T, N)
        ck = jax.lax.slice_in_dim(M, k * 2 * N + N, (k + 1) * 2 * N, axis=1)
        b_parts.append(jnp.broadcast_to(bk[:, :, None], (T, N, Dh)))
        c_parts.append(jnp.broadcast_to(ck[:, :, None], (T, N, Dh)))
    return jnp.concatenate(b_parts, axis=2), jnp.concatenate(c_parts, axis=2)


def _pack_bc_grads(dB, dC, K: int, Dh: int, N: int):
    """Two (T, N, K*Dh) gradient tiles -> packed (T, K*2N) by summing each
    direction's Dh lane block."""
    parts = []
    for k in range(K):
        db_k = jnp.sum(jax.lax.slice_in_dim(dB, k * Dh, (k + 1) * Dh, axis=2),
                       axis=2)                                  # (T, N)
        dc_k = jnp.sum(jax.lax.slice_in_dim(dC, k * Dh, (k + 1) * Dh, axis=2),
                       axis=2)
        parts.extend([db_k, dc_k])
    return jnp.concatenate(parts, axis=1)                       # (T, K*2N)


def _selection_matrix(K: int, Dh: int, N: int, dtype) -> jnp.ndarray:
    """Constant 0/1 selection operand S (N, 2KN, 2KD) with
    ``bc (T, 2KN) @ S[n] == [Bx_n | Cx_n] (T, 2KD)`` — the B/C lane unpack as
    an MXU matmul instead of lane slices + lane->sublane broadcasts (which cost
    ~17 ms/chunk-set at the canonical stage-1 shape, ~70%% of the old forward
    kernel; probe_scan_floor.py). Each output column has exactly one nonzero
    row, so the matmul is an exact copy even with bf16 operands; the same
    operand packs B/C GRADIENTS in the backward via the transposed contraction
    ``[dB_n | dC_n] (T, 2KD) @ S[n]^T`` (summing each direction's Dh lane
    block, exactly `_pack_bc_grads`)."""
    KD = K * Dh
    S = np.zeros((N, 2 * K * N, 2 * KD), np.float32)
    for n in range(N):
        for k in range(K):
            S[n, k * 2 * N + n, k * Dh:(k + 1) * Dh] = 1.0
            S[n, k * 2 * N + N + n, KD + k * Dh:KD + (k + 1) * Dh] = 1.0
    return jnp.asarray(S, dtype)


def _mxu_unpack_bc(bc, s_ref, N: int):
    """bc (T, 2KN) -> Bx, Cx stacked plane-major (N, T, KD) via N MXU matmuls.
    Leading-axis stacking is layout-free, and all scan math downstream runs on
    (N, ns, KD) full-width slabs."""
    KD = s_ref.shape[2] // 2
    planes = [
        jax.lax.dot_general(bc, s_ref[n], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for n in range(N)]
    allp = jnp.stack(planes, axis=0)                      # (N, T, 2KD)
    return (jax.lax.slice_in_dim(allp, 0, KD, axis=2),
            jax.lax.slice_in_dim(allp, KD, 2 * KD, axis=2))


def _mxu_pack_bc_grads(dB, dC, s_ref, N: int, out_dtype):
    """Stacked (N, T, KD) B/C gradients -> packed (T, 2KN) via the transposed
    selection contraction (sums each direction's Dh lane block on the MXU)."""
    dBC = jnp.concatenate([dB, dC], axis=2)               # (N, T, 2KD)
    acc = None
    for n in range(N):
        part = jax.lax.dot_general(
            dBC[n], s_ref[n], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (T, 2KN)
        acc = part if acc is None else acc + part
    return acc.astype(out_dtype)


def _fwd_kernel_mxu(u_ref, delta_ref, a_mat_ref, bc_ref, s_ref, y_ref,
                    carry_ref, h_scratch, *, K: int, Dh: int, N: int,
                    seq: int):
    """Forward kernel, MXU-unpack + plane-stacked layout. Same math as
    :func:`_fwd_kernel`/`_scan_fused_y` with the B/C lane unpack moved onto the
    MXU (probe_scan_floor.py: 20.4 vs 25.3 ms at the canonical stage-1 shape,
    chunk 256). Requires T % seq == 0 and T > seq."""
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    u = u_ref[0].astype(jnp.float32)          # (T, KD)
    delta = delta_ref[0].astype(jnp.float32)  # (T, KD)
    A = a_mat_ref[...]                        # (N, KD) fp32
    carry_ref[0, 0] = h_scratch[...]

    T = delta.shape[0]
    KD = K * Dh
    ns = T // seq
    A2 = A * _LOG2E
    Bx, Cx = _mxu_unpack_bc(bc_ref[0], s_ref, N)
    Bx = Bx.reshape(N, ns, seq, KD)
    Cx = Cx.reshape(N, ns, seq, KD)
    d4 = delta.reshape(1, ns, seq, KD)
    du4 = (delta * u).reshape(1, ns, seq, KD)
    dA = jnp.exp2(d4 * A2[:, None, None, :])              # (N, ns, seq, KD)
    dBu = du4 * Bx
    # pass 1: subchunk b-totals, all planes at once
    cur_b = dBu[:, :, 0]
    for s in range(1, seq):
        cur_b = dA[:, :, s] * cur_b + dBu[:, :, s]
    dsum = jnp.sum(d4, axis=2)                            # (1, ns, KD)
    tot_a = jnp.exp2(dsum * A2[:, None, :])               # (N, ns, KD)
    # entering carry per subchunk (tiny sequential combine over ns)
    h = h_scratch[...]
    hs = [None] * ns
    for i in range(ns):
        hs[i] = h
        h = tot_a[:, i] * h + cur_b[:, i]
    h_scratch[...] = h
    st = jnp.stack(hs, axis=1)                            # (N, ns, KD)
    # pass 2: states on the fly, contracted straight into y
    yp = [None] * seq
    for s in range(seq):
        st = dA[:, :, s] * st + dBu[:, :, s]
        yp[s] = st * Cx[:, :, s]
    y = jnp.sum(jnp.stack(yp, axis=2), axis=0)            # (ns, seq, KD)
    y_ref[0] = y.reshape(T, KD).astype(y_ref.dtype)


def _bwd_kernel_mxu(u_ref, delta_ref, a_mat_ref, bc_ref, s_ref, dy_ref,
                    carry_ref, du_ref, ddelta_ref, dbc_ref, da_out_ref,
                    g_scratch, da_scratch, *, K: int, Dh: int, N: int,
                    seq: int):
    """Backward kernel, MXU-unpack/pack + plane-stacked layout. Same adjoint
    math as :func:`_bwd_kernel` (chunks in reverse L order, recompute states
    from the saved entry carry, suffix adjoint scan) with BOTH the B/C unpack
    and the gradient lane-pack on the MXU, and every subchunk-scan op running
    on (N, ns, KD) full-width slabs."""
    l_idx = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(l_idx == 0)
    def _init():
        g_scratch[...] = jnp.zeros_like(g_scratch)
        da_scratch[...] = jnp.zeros_like(da_scratch)

    u = u_ref[0].astype(jnp.float32)
    delta = delta_ref[0].astype(jnp.float32)
    A = a_mat_ref[...]
    dy = dy_ref[0].astype(jnp.float32)
    h_in = carry_ref[0, 0]                                # (N, KD)

    T = delta.shape[0]
    KD = K * Dh
    ns = T // seq
    A2 = A * _LOG2E
    Bx, Cx = _mxu_unpack_bc(bc_ref[0], s_ref, N)
    Bx = Bx.reshape(N, ns, seq, KD)
    Cx = Cx.reshape(N, ns, seq, KD)
    d4 = delta.reshape(1, ns, seq, KD)
    u4 = u.reshape(1, ns, seq, KD)
    du4 = (delta * u).reshape(1, ns, seq, KD)
    dy4 = dy.reshape(1, ns, seq, KD)
    dA = jnp.exp2(d4 * A2[:, None, None, :])              # (N, ns, seq, KD)
    dBu = du4 * Bx
    q = Cx * dy4

    # ---- adjoint suffix scan ------------------------------------------
    # alpha_t = dA_{t+1}: within a subchunk alpha[:, :, s] == dA[:, :, s+1];
    # the last position couples to the NEXT subchunk's first dA (identity at
    # the chunk end — the inter-chunk coupling is pre-folded into g_scratch).
    cur_q = q[:, :, seq - 1]
    for s in range(seq - 2, -1, -1):
        cur_q = dA[:, :, s + 1] * cur_q + q[:, :, s]
    dfull = jnp.sum(d4, axis=2)                           # (1, ns, KD)
    # shifted delta sums cover positions i*seq+1 .. i*seq+seq
    dsh = dfull - d4[:, :, 0] + jnp.concatenate(
        [d4[:, 1:, 0], jnp.zeros((1, 1, KD), jnp.float32)], axis=1)
    tot_a_sh = jnp.exp2(dsh * A2[:, None, :])             # (N, ns, KD)
    g = g_scratch[...]
    gs = [None] * ns
    for i in range(ns - 1, -1, -1):
        gs[i] = g
        g = tot_a_sh[:, i] * g + cur_q[:, i]
    alpha_last = jnp.concatenate(
        [dA[:, 1:, 0], jnp.ones((N, 1, KD), jnp.float32)], axis=1)
    st_g = jnp.stack(gs, axis=1)                          # (N, ns, KD)
    G_slabs = [None] * seq
    for s in range(seq - 1, -1, -1):
        a_s = alpha_last if s == seq - 1 else dA[:, :, s + 1]
        st_g = a_s * st_g + q[:, :, s]
        G_slabs[s] = st_g
    G = jnp.stack(G_slabs, axis=2)                        # (N, ns, seq, KD)
    # g entering the PREVIOUS chunk (processed next): g_{-1} = dA_0 * G_0
    g_scratch[...] = dA[:, 0, 0] * G[:, 0, 0]

    # ---- forward recompute + gradients --------------------------------
    cur_b = dBu[:, :, 0]
    for s in range(1, seq):
        cur_b = dA[:, :, s] * cur_b + dBu[:, :, s]
    tot_a = jnp.exp2(dfull * A2[:, None, :])
    h = h_in
    hs = [None] * ns
    for i in range(ns):
        hs[i] = h
        h = tot_a[:, i] * h + cur_b[:, i]
    st = jnp.stack(hs, axis=1)                            # (N, ns, KD)

    # cross-plane (axis-0) and cross-subchunk (axis-1) reductions are written
    # as static slice-add loops: Mosaic rejects multi_reduction over the
    # leading implicit dim of a 3D vector ("Unsupported output implicit
    # dimension"), and leading-axis slices are layout-free.
    def _sum_planes(x):                                   # (N, ns, KD) -> (ns, KD)
        acc = x[0]
        for n in range(1, N):
            acc = acc + x[n]
        return acc

    da_acc = da_scratch[...]
    dd_slabs = [None] * seq
    du_slabs = [None] * seq
    dB_slabs = [None] * seq
    dC_slabs = [None] * seq
    for s in range(seq):
        g_s = G[:, :, s]
        h_prev = st
        st = dA[:, :, s] * st + dBu[:, :, s]
        gdA_dA = (g_s * h_prev) * dA[:, :, s]             # (N, ns, KD)
        GB = _sum_planes(g_s * Bx[:, :, s])               # (ns, KD)
        dd_slabs[s] = (_sum_planes(gdA_dA * A[:, None, :]) +
                       GB * u4[0, :, s])
        du_slabs[s] = GB * d4[0, :, s]
        dB_slabs[s] = g_s * du4[:, :, s]
        dC_slabs[s] = st * dy4[:, :, s]
        gd = gdA_dA * d4[:, :, s]                         # (N, ns, KD)
        for i in range(ns):
            da_acc = da_acc + gd[:, i]
    da_scratch[...] = da_acc

    ddelta_ref[0] = jnp.stack(dd_slabs, axis=1).reshape(T, KD).astype(
        ddelta_ref.dtype)
    du_ref[0] = jnp.stack(du_slabs, axis=1).reshape(T, KD).astype(du_ref.dtype)
    dB = jnp.stack(dB_slabs, axis=2).reshape(N, T, KD)
    dC = jnp.stack(dC_slabs, axis=2).reshape(N, T, KD)
    dbc_ref[0] = _mxu_pack_bc_grads(dB, dC, s_ref, N, dbc_ref.dtype)

    @pl.when(l_idx == nl - 1)
    def _write_da():
        da_out_ref[0] = da_scratch[...]


def _fwd_kernel(u_ref, delta_ref, a_mat_ref, bc_ref, y_ref, carry_ref,
                h_scratch, *, K: int, Dh: int, N: int):
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    # operands may arrive bf16 (bf16 training halves the scan's HBM traffic,
    # its dominant cost); all math runs fp32 in VMEM
    u = u_ref[0].astype(jnp.float32)          # (T, KD)
    delta = delta_ref[0].astype(jnp.float32)  # (T, KD)
    A = a_mat_ref[...]                        # (N, KD) fp32
    Bx, Cx = _unpack_bc_lanes(bc_ref[0].astype(jnp.float32), K, Dh, N)

    carry_ref[0, 0] = h_scratch[...]  # state entering this chunk

    A2 = A * _LOG2E
    dA = jnp.exp2(delta[:, None, :] * A2[None, :, :])        # (T, N, KD)
    dBu = (delta * u)[:, None, :] * Bx
    T, seq = delta.shape[0], int(os.environ.get("NNUZOO_SCAN_SEQ", "16"))
    if T > seq and T % seq == 0:
        dsum = jnp.sum(delta.reshape(T // seq, seq, -1), axis=1)
        y, h_exit = _scan_fused_y(dA, dBu, dsum, A2, h_scratch[...], Cx, seq)
        y_ref[0] = y.astype(y_ref.dtype)
        h_scratch[...] = h_exit
    else:
        states = _scan_states(dA, dBu, h_scratch[...])        # (T, N, KD)
        y_ref[0] = jnp.sum(states * Cx, axis=1).astype(y_ref.dtype)
        h_scratch[...] = jnp.squeeze(
            jax.lax.slice_in_dim(states, T - 1, T, axis=0), axis=0)


def _bwd_kernel_fused(u_ref, delta_ref, a_mat_ref, bc_ref, dy_ref, carry_ref,
                      du_ref, ddelta_ref, dbc_ref, da_out_ref,
                      g_scratch, da_scratch, *, K: int, Dh: int, N: int,
                      seq: int):
    """Fused backward: same math as :func:`_bwd_kernel` with the gradient
    element-wise work folded INTO the second-pass scan loops, so the kernel
    never materializes the full (T, N, KD) `states`/`h_prev`/`alpha` arrays or
    stacks G — the kernels are VPU-instruction-bound, and each avoided
    materialization is a full-array move. Requires T % seq == 0.

    Structure:
      adjoint pass A1 (descending)  — subchunk suffix q-totals (1 FMA/el)
      carries                       — exp(shifted-dsum x A) totals + tiny combine
      adjoint pass A2 (descending)  — G slabs, kept as a per-s list (no stack)
      forward pass F1 (ascending)   — subchunk dBu-totals (1 FMA/el)
      carries                       — exp(dsum x A) totals + tiny combine
      forward pass F2 (ascending)   — recompute state slab, consume G slab,
                                      emit all five gradient contributions
    """
    l_idx = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(l_idx == 0)
    def _init():
        g_scratch[...] = jnp.zeros_like(g_scratch)
        da_scratch[...] = jnp.zeros_like(da_scratch)

    u = u_ref[0].astype(jnp.float32)
    delta = delta_ref[0].astype(jnp.float32)
    A = a_mat_ref[...]
    Bx, Cx = _unpack_bc_lanes(bc_ref[0].astype(jnp.float32), K, Dh, N)
    dy = dy_ref[0].astype(jnp.float32)
    h_in = carry_ref[0, 0]

    T = delta.shape[0]
    ns = T // seq
    KD = K * Dh
    # exp2 is ~2.3x cheaper than exp on the v5e VPU (probe_vpu_ops); fold
    # log2(e) into A once per chunk ((N, KD) — negligible)
    A2 = A * _LOG2E
    dA = jnp.exp2(delta[:, None, :] * A2[None, :, :])         # (T, N, KD)
    du_el = delta * u                                          # (T, KD)
    dBu = du_el[:, None, :] * Bx
    q = Cx * dy[:, None, :]

    dA4 = dA.reshape(ns, seq, N, KD)
    dBu4 = dBu.reshape(ns, seq, N, KD)
    q4 = q.reshape(ns, seq, N, KD)
    Bx4 = Bx.reshape(ns, seq, N, KD)
    u4 = u.reshape(ns, seq, KD)
    d4 = delta.reshape(ns, seq, KD)
    du4 = du_el.reshape(ns, seq, KD)
    dy4 = dy.reshape(ns, seq, KD)

    # alpha_t = dA_{t+1}: within a subchunk alpha4[:, s] == dA4[:, s+1]; the
    # last position couples to the NEXT subchunk's first dA (ones at chunk end)
    alpha_last = jnp.concatenate(
        [dA4[1:, 0], jnp.ones((1, N, KD), jnp.float32)], axis=0)   # (ns,N,KD)

    # ---- adjoint suffix scan -------------------------------------------
    # pass A1: subchunk suffix totals of q under alpha
    cur_q = q4[:, seq - 1]
    for s in range(seq - 2, -1, -1):
        cur_q = dA4[:, s + 1] * cur_q + q4[:, s]
    # subchunk decay totals for alpha = exp(A * sum of SHIFTED deltas):
    # shifted delta sums cover positions j*seq+1 .. j*seq+seq
    dfull = jnp.sum(d4, axis=1)                                # (ns, KD)
    dsh = dfull - d4[:, 0] + jnp.concatenate(
        [d4[1:, 0], jnp.zeros((1, KD), jnp.float32)], axis=0)  # (ns, KD)
    tot_a_sh = jnp.exp2(dsh[:, None, :] * A2[None, :, :])      # (ns, N, KD)
    gs, _ = _subchunk_carries(tot_a_sh, cur_q, g_scratch[...], up=True)
    # pass A2: G slabs (kept as a per-s python list — never stacked)
    G_slabs = [None] * seq
    st_g = gs
    for s in range(seq - 1, -1, -1):
        a_s = alpha_last if s == seq - 1 else dA4[:, s + 1]
        st_g = a_s * st_g + q4[:, s]
        G_slabs[s] = st_g
    # g entering the PREVIOUS chunk (processed next, reverse order) from the
    # right: g_{-1} = dA_0 * G_0
    g_scratch[...] = dA4[0, 0] * G_slabs[0][0]

    # ---- forward recompute + fused gradients ---------------------------
    cur_b = dBu4[:, 0]
    for s in range(1, seq):
        cur_b = dA4[:, s] * cur_b + dBu4[:, s]
    tot_a = jnp.exp2(dfull[:, None, :] * A2[None, :, :])
    hs, _ = _subchunk_carries(tot_a, cur_b, h_in, up=False)

    st = hs
    da_acc = da_scratch[...]
    dd_slabs = [None] * seq
    du_slabs = [None] * seq
    dbc_slabs = [None] * seq
    for s in range(seq):
        g = G_slabs[s]
        h_prev = st
        st = dA4[:, s] * st + dBu4[:, s]
        gdA_dA = (g * h_prev) * dA4[:, s]                      # (ns, N, KD)
        GB = jnp.sum(g * Bx4[:, s], axis=1)                    # (ns, KD)
        dd_slabs[s] = jnp.sum(gdA_dA * A[None], axis=1) + GB * u4[:, s]
        du_slabs[s] = GB * d4[:, s]
        dbc_slabs[s] = _pack_bc_grads(g * du4[:, s][:, None, :],
                                      st * dy4[:, s][:, None, :], K, Dh, N)
        da_acc = da_acc + jnp.sum(gdA_dA * d4[:, s][:, None, :], axis=0)
    da_scratch[...] = da_acc

    ddelta_ref[0] = jnp.stack(dd_slabs, axis=1).reshape(T, KD).astype(
        ddelta_ref.dtype)
    du_ref[0] = jnp.stack(du_slabs, axis=1).reshape(T, KD).astype(du_ref.dtype)
    dbc_ref[0] = jnp.stack(dbc_slabs, axis=1).reshape(
        T, 2 * K * N).astype(dbc_ref.dtype)

    @pl.when(l_idx == nl - 1)
    def _write_da():
        da_out_ref[0] = da_scratch[...]


def _bwd_kernel(u_ref, delta_ref, a_mat_ref, bc_ref, dy_ref, carry_ref,
                du_ref, ddelta_ref, dbc_ref, da_out_ref,
                g_scratch, da_scratch, *, K: int, Dh: int, N: int):
    """Processes chunks in REVERSE L order (the wrapper flips the index map).
    Recomputes in-chunk states from the saved carry, then the adjoint:
        g_t = C_t dy_t + dA_{t+1} g_{t+1};  d(dA)_t = g_t h_{t-1};  d(dBu)_t = g_t
    """
    l_idx = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(l_idx == 0)
    def _init():
        g_scratch[...] = jnp.zeros_like(g_scratch)
        da_scratch[...] = jnp.zeros_like(da_scratch)

    u = u_ref[0].astype(jnp.float32)
    delta = delta_ref[0].astype(jnp.float32)
    A = a_mat_ref[...]
    Bx, Cx = _unpack_bc_lanes(bc_ref[0].astype(jnp.float32), K, Dh, N)
    dy = dy_ref[0].astype(jnp.float32)
    h_in = carry_ref[0, 0]  # (N, KD) state entering this chunk

    # recompute forward states for this chunk
    A2 = A * _LOG2E
    dA = jnp.exp2(delta[:, None, :] * A2[None, :, :])
    dBu = (delta * u)[:, None, :] * Bx
    T, seq = delta.shape[0], int(os.environ.get("NNUZOO_SCAN_SEQ", "16"))
    two_pass = T > seq and T % seq == 0
    if two_pass:
        dsum = jnp.sum(delta.reshape(T // seq, seq, -1), axis=1)
        states = _scan_states_2pass(dA, dBu, dsum, A2, h_in, seq=seq)
    else:
        states = _scan_states(dA, dBu, h_in)
    h_prev = jnp.concatenate([h_in[None], states[:-1]], axis=0)

    # adjoint suffix scan (shift-UP; Mosaic has no `rev`): alpha_t = dA_{t+1}
    # (fill 1 at t=T-1); g_t = sum_{s>=t} (prod_{t<r<=s} dA_r) q_s with the
    # chunk-exit carry entering from the right.
    q = Cx * dy[:, None, :]                                   # (T, N, KD)
    alpha = jnp.concatenate([dA[1:], jnp.ones_like(dA[:1])], axis=0)
    if two_pass:
        # alpha's decays follow the UP-shifted delta (0-filled at T-1)
        delta_sh = jnp.concatenate(
            [delta[1:], jnp.zeros_like(delta[:1])], axis=0)
        dsum_sh = jnp.sum(delta_sh.reshape(T // seq, seq, -1), axis=1)
        G = _scan_states_2pass(alpha, q, dsum_sh, A2, g_scratch[...],
                               up=True, seq=seq)             # g_t (T, N, KD)
    else:
        G = _scan_states(alpha, q, g_scratch[...], up=True)
    first = lambda x: jnp.squeeze(jax.lax.slice_in_dim(x, 0, 1, axis=0), axis=0)
    g_scratch[...] = first(dA) * first(G)

    gdA_dA = (G * h_prev) * dA                                # shared factor
    GB = jnp.sum(G * Bx, axis=1)                              # (T, KD)
    ddelta_ref[0] = (jnp.sum(gdA_dA * A[None], axis=1) +
                     GB * u).astype(ddelta_ref.dtype)
    du_ref[0] = (GB * delta).astype(du_ref.dtype)
    dbc_ref[0] = _pack_bc_grads(G * (delta * u)[:, None, :],
                                states * dy[:, None, :], K, Dh, N
                                ).astype(dbc_ref.dtype)
    da_scratch[...] += jnp.sum(gdA_dA * delta[:, None, :], axis=0)

    @pl.when(l_idx == nl - 1)
    def _write_da():
        da_out_ref[0] = da_scratch[...]


def _pallas_vmem_fits(dstate: int, KD: int) -> bool:
    """Mosaic's scoped-VMEM ceiling is 16 MB; the backward kernel's live set
    measures ~6 fp32 (T, N, KD) tiles at the minimum chunk T=8 (SwinUMamba's
    stage-4 scan — L=56, KD=4*1536=6144 — OOMed the canonical 256x224 b12
    compile at 18.68 MB). Shapes beyond ~14 MB fall back to the XLA chunked
    scan: they are the small-L / huge-KD deep stages where the kernel's
    sequential-grid advantage is marginal anyway."""
    return 6 * 8 * dstate * max(KD, 128) * 4 <= 14 * 1024 * 1024


def _pick_chunk(L: int, dstate: int, dim: int) -> int:
    """Largest power-of-two chunk with ~6 (T, N, KD) fp32 tiles under ~8 MB VMEM,
    capped at 128 by default (the unrolled in-chunk scan at T=256 blew up the
    Mosaic compiler in earlier revisions; override the cap for experiments with
    NNUZOO_SCAN_CHUNK). Tiles are lane-padded to 128 internally, so budget with
    max(dim, 128)."""
    import os
    env = os.environ.get("NNUZOO_SCAN_CHUNK")
    if env:  # direct override (experiments); still never exceeds L
        return int(max(8, min(int(env), L)))
    budget = 8 * 1024 * 1024
    t = budget // max(1, 6 * dstate * max(dim, 128) * 4)
    t = 2 ** int(math.floor(math.log2(max(t, 8))))
    return int(max(8, min(t, 128, L)))


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _scan_core_pallas(u, delta, A, bc, interpret=False):
    """u/delta (B, L, KD); A (N, KD); bc (B, L, K*2N) packed per-direction
    [B_k | C_k] lane blocks. Returns y (B, L, KD)."""
    y, _ = _scan_core_pallas_fwd(u, delta, A, bc, interpret)
    return y


def _scan_core_pallas_fwd(u, delta, A, bc, interpret=False):
    batch, L, KD = u.shape
    dstate = A.shape[0]
    K = bc.shape[2] // (2 * dstate)
    Dh = KD // K
    T = _pick_chunk(L, dstate, KD)
    assert L % T == 0, f"L={L} must be a multiple of chunk {T}"
    nl = L // T

    grid = (batch, nl)
    ud_spec = pl.BlockSpec((1, T, KD), lambda b, l: (b, l, 0))
    a_spec = pl.BlockSpec((dstate, KD), lambda b, l: (0, 0))
    bc_spec = pl.BlockSpec((1, T, 2 * K * dstate), lambda b, l: (b, l, 0))
    carry_spec = pl.BlockSpec((1, 1, dstate, KD), lambda b, l: (b, l, 0, 0))

    seq = int(os.environ.get("NNUZOO_SCAN_SEQ", "16"))
    use_mxu = (T > seq and T % seq == 0 and
               os.environ.get("NNUZOO_SCAN_MXU", "1") != "0")
    if use_mxu:
        S = _selection_matrix(K, Dh, dstate, bc.dtype)
        s_spec = pl.BlockSpec(S.shape, lambda b, l: (0, 0, 0))
        kern = partial(_fwd_kernel_mxu, K=K, Dh=Dh, N=dstate, seq=seq)
        in_specs = [ud_spec, ud_spec, a_spec, bc_spec, s_spec]
        operands = (u, delta, A, bc, S)
    else:
        kern = partial(_fwd_kernel, K=K, Dh=Dh, N=dstate)
        in_specs = [ud_spec, ud_spec, a_spec, bc_spec]
        operands = (u, delta, A, bc)

    y, carries = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(ud_spec, carry_spec),
        out_shape=(jax.ShapeDtypeStruct((batch, L, KD), u.dtype),
                   jax.ShapeDtypeStruct((batch, nl, dstate, KD), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dstate, KD), jnp.float32)],
        interpret=interpret,
    )(*operands)
    # names let an outer remat/checkpoint policy choose to SAVE the scan
    # outputs instead of re-running the kernel forward during backward
    # (m2net._stage_blocks uses save_only_these_names on these)
    y = _checkpoint_name(y, "scan_y")
    carries = _checkpoint_name(carries, "scan_carries")
    return y, (u, delta, A, bc, carries)


def _scan_core_pallas_bwd(interpret, residuals, dy):
    u, delta, A, bc, carries = residuals
    batch, L, KD = u.shape
    dstate = A.shape[0]
    K = bc.shape[2] // (2 * dstate)
    Dh = KD // K
    T = _pick_chunk(L, dstate, KD)
    nl = L // T

    grid = (batch, nl)
    rev = lambda b, l: (b, nl - 1 - l, 0)
    ud_spec = pl.BlockSpec((1, T, KD), rev)
    a_spec = pl.BlockSpec((dstate, KD), lambda b, l: (0, 0))
    bc_spec = pl.BlockSpec((1, T, 2 * K * dstate), rev)
    carry_spec = pl.BlockSpec((1, 1, dstate, KD),
                              lambda b, l: (b, nl - 1 - l, 0, 0))
    da_spec = pl.BlockSpec((1, dstate, KD), lambda b, l: (b, 0, 0))

    # Kernel choice: the MXU-unpack/pack plane-stacked kernel is the default
    # (both the B/C lane unpack and the gradient lane pack ride the MXU).
    # NNUZOO_SCAN_MXU=0 falls back to the 2-pass lane-unpack kernel;
    # NNUZOO_SCAN_BWD=fused keeps the old fully-fused experiment.
    seq = int(os.environ.get("NNUZOO_SCAN_SEQ", "16"))
    subchunked = T > seq and T % seq == 0
    use_mxu = subchunked and os.environ.get("NNUZOO_SCAN_MXU", "1") != "0"
    use_fused = (subchunked and not use_mxu and
                 os.environ.get("NNUZOO_SCAN_BWD", "2pass") == "fused")
    if use_mxu:
        S = _selection_matrix(K, Dh, dstate, bc.dtype)
        s_spec = pl.BlockSpec(S.shape, lambda b, l: (0, 0, 0))
        kern = partial(_bwd_kernel_mxu, K=K, Dh=Dh, N=dstate, seq=seq)
        in_specs = [ud_spec, ud_spec, a_spec, bc_spec, s_spec, ud_spec,
                    carry_spec]
        operands = (u, delta, A, bc, S, dy, carries)
    else:
        kern = (partial(_bwd_kernel_fused, K=K, Dh=Dh, N=dstate, seq=seq)
                if use_fused else partial(_bwd_kernel, K=K, Dh=Dh, N=dstate))
        in_specs = [ud_spec, ud_spec, a_spec, bc_spec, ud_spec, carry_spec]
        operands = (u, delta, A, bc, dy, carries)
    du, ddelta, dbc, dA = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(ud_spec, ud_spec, bc_spec, da_spec),
        out_shape=(jax.ShapeDtypeStruct((batch, L, KD), u.dtype),
                   jax.ShapeDtypeStruct((batch, L, KD), delta.dtype),
                   jax.ShapeDtypeStruct((batch, L, 2 * K * dstate), bc.dtype),
                   jax.ShapeDtypeStruct((batch, dstate, KD), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dstate, KD), jnp.float32),
                        pltpu.VMEM((dstate, KD), jnp.float32)],
        interpret=interpret,
    )(*operands)
    # dA per-batch partials -> sum over batch
    return du, ddelta, jnp.sum(dA, axis=0), dbc


_scan_core_pallas.defvjp(_scan_core_pallas_fwd, _scan_core_pallas_bwd)


def _run_packed_scan(u, delta, A_t, Bmat, Cmat, interpret=False):
    """Common padding + kernel invocation. u/delta (B, L, K, Dh) fp32 (delta
    already softplus'ed); A_t (N, K*Dh); Bmat/Cmat (B, L, K, N).
    Returns y (B, L, K, Dh).

    B and C are packed into one lane-compact (B, L, K*2N) operand: per
    direction k the lanes hold [B_k(N) | C_k(N)]. For SS2D (K=4, N=16) this is
    exactly one 128-lane tile; the old (B, L, K, N) operands were tiled
    T(8,128) with 8-16x HBM padding."""
    batch, L, K, Dh = u.shape
    dstate = A_t.shape[0]
    u_k = u.reshape(batch, L, K * Dh)
    delta_k = delta.reshape(batch, L, K * Dh)
    bc = jnp.concatenate([Bmat, Cmat], axis=3).reshape(
        batch, L, K * 2 * dstate)

    T = _pick_chunk(max(L, 8), dstate, K * Dh)
    lpad = (-L) % T
    if lpad:
        u_k = jnp.pad(u_k, ((0, 0), (0, lpad), (0, 0)))
        delta_k = jnp.pad(delta_k, ((0, 0), (0, lpad), (0, 0)))
        bc = jnp.pad(bc, ((0, 0), (0, lpad), (0, 0)))
    y = _scan_core_pallas(u_k, delta_k, A_t, bc, interpret)
    return y[:, :L].reshape(batch, L, K, Dh)


def selective_scan_blkd(u, delta, A, Bmat, Cmat, D=None, delta_bias=None,
                        delta_softplus=True, backend: Optional[str] = None,
                        interpret: bool = False):
    """Layout-optimized entry for cross-scan modules.

    u/delta (B, L, K, Dh); A (K*Dh, N) (row k*Dh+d); Bmat/Cmat (B, L, K, N);
    D/delta_bias (K*Dh,). Returns y (B, L, K, Dh). The K directions are packed
    into the lane dimension so small Dh still fills the VPU, and the big
    activations reach the kernel via pure reshape (no relayout)."""
    batch, L, K, Dh = u.shape
    dstate = A.shape[1]
    if backend is None:
        platform = jax.devices()[0].platform
        backend = "pallas" if platform == "tpu" else "xla"
    if backend == "pallas" and not _pallas_vmem_fits(dstate, K * Dh):
        backend = "xla"

    # bf16 u/B/C stay bf16 on the pallas path (the kernel upcasts in VMEM;
    # the fp32 state/carry never leaves the chip) — big cut in scan HBM
    # traffic under bf16 training. delta stays fp32 (mamba convention: the
    # exp(delta*A) decay is precision-sensitive).
    compute_dtype = jnp.bfloat16 if (u.dtype == jnp.bfloat16 and
                                     backend == "pallas") else jnp.float32
    u32 = u.astype(compute_dtype)
    delta32 = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta32 = delta32 + delta_bias.astype(jnp.float32).reshape(1, 1, K, Dh)
    if delta_softplus:
        delta32 = jax.nn.softplus(delta32)

    if backend == "pallas":
        A_t = jnp.transpose(A.astype(jnp.float32), (1, 0))  # (N, K*Dh)
        y = _run_packed_scan(u32, delta32, A_t, Bmat.astype(compute_dtype),
                             Cmat.astype(compute_dtype), interpret)
    else:
        # mamba-convention fallback (CPU tests / explicit override)
        u_c = jnp.transpose(u32, (0, 2, 3, 1)).reshape(batch, K * Dh, L)
        d_c = jnp.transpose(delta32, (0, 2, 3, 1)).reshape(batch, K * Dh, L)
        y_c = selective_scan_xla(u_c, d_c, A,
                                 jnp.transpose(Bmat, (0, 2, 3, 1)),
                                 jnp.transpose(Cmat, (0, 2, 3, 1)),
                                 delta_softplus=False)
        y = jnp.transpose(y_c.reshape(batch, K, Dh, L), (0, 3, 1, 2))
    if D is not None:
        y = y + u32 * D.astype(jnp.float32).reshape(1, 1, K, Dh)
    return y


def selective_scan_packed(u, delta, A_t, bc, D=None, delta_bias=None,
                          delta_softplus=True, interpret=False):
    """Fully lane-packed entry (pallas only): operands arrive in EXACTLY the
    kernel layout, so no reshapes/relayouts happen outside the kernel.

    u/delta (B, L, K*Dh) with direction-major lane blocks; A_t (N, K*Dh);
    bc (B, L, K*2N) packed per-direction [B_k | C_k] lanes; D/delta_bias
    (K*Dh,). For SS2D (K=4, Dh=32, N=16) every operand is exactly one
    128-lane tile — the layout-padding pathology of the unpacked
    (B, L, K, Dh)/(B, L, K, N) intermediates (lane pad 4-8x) never occurs.
    Returns y (B, L, K*Dh) promoted like :func:`selective_scan_blkd`.
    """
    batch, L, KD = u.shape
    dstate = A_t.shape[0]
    if not _pallas_vmem_fits(dstate, KD):
        # huge-KD fallback: unpack the lane-compact bc and run the XLA scan
        K = bc.shape[2] // (2 * dstate)
        Dh = KD // K
        bc4 = bc.reshape(batch, L, K, 2 * dstate)
        y4 = selective_scan_blkd(
            u.reshape(batch, L, K, Dh), delta.reshape(batch, L, K, Dh),
            jnp.transpose(A_t, (1, 0)), bc4[..., :dstate], bc4[..., dstate:],
            D=D, delta_bias=delta_bias, delta_softplus=delta_softplus,
            backend="xla")
        return y4.reshape(batch, L, KD)
    compute_dtype = jnp.bfloat16 if u.dtype == jnp.bfloat16 else jnp.float32
    u_k = u.astype(compute_dtype)
    bc_k = bc.astype(compute_dtype)
    delta32 = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta32 = delta32 + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta32 = jax.nn.softplus(delta32)
    T = _pick_chunk(max(L, 8), dstate, KD)
    lpad = (-L) % T
    if lpad:
        u_p = jnp.pad(u_k, ((0, 0), (0, lpad), (0, 0)))
        delta32 = jnp.pad(delta32, ((0, 0), (0, lpad), (0, 0)))
        bc_k = jnp.pad(bc_k, ((0, 0), (0, lpad), (0, 0)))
    else:
        u_p = u_k
    y = _scan_core_pallas(u_p, delta32, A_t, bc_k, interpret)[:, :L]
    if D is not None:
        y = y + u_k * D.astype(jnp.float32)[None, None, :]
    return y


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus=False, return_last_state=False,
                          interpret: bool = False):
    """Mamba-convention wrapper (u/delta (batch, dim, L), grouped or plain B/C)
    around the packed kernel."""
    assert not return_last_state, "return_last_state unsupported on the pallas path"
    dtype_in = u.dtype
    batch, dim, L = u.shape
    dstate = A.shape[1]
    if not _pallas_vmem_fits(dstate, dim):
        return selective_scan_xla(u, delta, A, B, C, D, z, delta_bias,
                                  delta_softplus, return_last_state)

    u32 = u.astype(jnp.float32)
    delta32 = _apply_delta_bias(delta, delta_bias, delta_softplus)

    if B.ndim == 4:
        K = B.shape[1]
    else:
        K = 1
        B = B[:, None]
        C = C[:, None]
    Dh = dim // K

    # (batch, dim=K*Dh, L) -> (batch, L, K, Dh)
    u_p = jnp.transpose(u32.reshape(batch, K, Dh, L), (0, 3, 1, 2))
    d_p = jnp.transpose(delta32.reshape(batch, K, Dh, L), (0, 3, 1, 2))
    B_p = jnp.transpose(B.astype(jnp.float32), (0, 3, 1, 2))  # (batch, L, K, N)
    C_p = jnp.transpose(C.astype(jnp.float32), (0, 3, 1, 2))
    A_t = jnp.transpose(A.astype(jnp.float32), (1, 0))        # (N, K*Dh)

    y_p = _run_packed_scan(u_p, d_p, A_t, B_p, C_p, interpret)
    y = jnp.transpose(y_p, (0, 2, 3, 1)).reshape(batch, dim, L)
    return _finalize(y, u32, D, z, dtype_in)


def selective_scan(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                   delta_softplus=False, return_last_state=False,
                   backend: Optional[str] = None, chunk: int = 128):
    """Dispatching entry point. backend: None (auto: pallas on TPU) | 'pallas' |
    'xla' | 'ref'."""
    if backend is None:
        platform = jax.devices()[0].platform
        backend = "pallas" if platform == "tpu" and not return_last_state else "xla"
    if backend == "ref":
        return selective_scan_ref_jax(u, delta, A, B, C, D, z, delta_bias,
                                      delta_softplus, return_last_state)
    if backend == "pallas":
        return selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias,
                                     delta_softplus, return_last_state)
    return selective_scan_xla(u, delta, A, B, C, D, z, delta_bias, delta_softplus,
                              return_last_state, chunk=chunk)
