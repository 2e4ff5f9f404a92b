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
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

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
# Kernel-level contract (groups folded into the leading axis by the wrapper):
#   u, delta : (G, L, D)   fp32, L % T == 0, D % 128 == 0
#   A        : (G, N, D)   fp32 (tiled per group by the wrapper; cheap)
#   Bmat,Cmat: (G, L, N)   fp32
#   y        : (G, L, D)
#   carries  : (G, NL, N, D) chunk-boundary states (input to each chunk), saved
#              by the forward for backward recomputation.

def _hillis_steele(a, b):
    """Inclusive scan over axis 0 of (T, N, D): h_t = a_t*h_{t-1} + b_t with h_-1=0.
    Returns cumulative (a_cum, b_cum): h_t = a_cum_t * h_init + b_cum_t."""
    T = a.shape[0]
    d = 1
    while d < T:
        a_sh = jnp.concatenate([jnp.ones_like(a[:d]), a[:-d]], axis=0)
        b_sh = jnp.concatenate([jnp.zeros_like(b[:d]), b[:-d]], axis=0)
        b = a * b_sh + b
        a = a * a_sh
        d *= 2
    return a, b


def _fwd_kernel(u_ref, delta_ref, a_mat_ref, b_ref, c_ref, y_ref, carry_ref,
                h_scratch):
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    u = u_ref[0]          # (T, D)
    delta = delta_ref[0]  # (T, D)
    A = a_mat_ref[0]      # (N, D)
    Bm = b_ref[0]         # (T, N)
    Cm = c_ref[0]         # (T, N)

    carry_ref[0, 0] = h_scratch[...]  # state entering this chunk

    dA = jnp.exp(delta[:, None, :] * A[None, :, :])          # (T, N, D)
    dBu = (delta * u)[:, None, :] * Bm[:, :, None]            # (T, N, D)
    a_cum, b_cum = _hillis_steele(dA, dBu)
    states = a_cum * h_scratch[...][None] + b_cum             # (T, N, D)
    y_ref[0] = jnp.sum(states * Cm[:, :, None], axis=1)       # (T, D)
    T = states.shape[0]
    h_scratch[...] = jnp.squeeze(
        jax.lax.slice_in_dim(states, T - 1, T, axis=0), axis=0)


def _bwd_kernel(u_ref, delta_ref, a_mat_ref, b_ref, c_ref, dy_ref, carry_ref,
                du_ref, ddelta_ref, db_ref, dc_ref, da_out_ref,
                g_scratch, da_scratch):
    """Processes chunks in REVERSE L order (wrapper flips the chunk index map).
    Recomputes in-chunk states from the saved carry, then the adjoint:
        g_t = C_t dy_t + a_{t+1} g_{t+1}
        ddA_t = g_t * h_{t-1};  ddBu_t = g_t
    """
    l_idx = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(l_idx == 0)
    def _init():
        g_scratch[...] = jnp.zeros_like(g_scratch)
        da_scratch[...] = jnp.zeros_like(da_scratch)

    u = u_ref[0]
    delta = delta_ref[0]
    A = a_mat_ref[0]
    Bm = b_ref[0]
    Cm = c_ref[0]
    dy = dy_ref[0]
    h_in = carry_ref[0, 0]  # (N, D) state entering this chunk

    # recompute forward states for this chunk
    dA = jnp.exp(delta[:, None, :] * A[None, :, :])
    dBu = (delta * u)[:, None, :] * Bm[:, :, None]
    a_cum, b_cum = _hillis_steele(dA, dBu)
    states = a_cum * h_in[None] + b_cum                       # h_t, t in chunk
    h_prev = jnp.concatenate([h_in[None], states[:-1]], axis=0)  # h_{t-1}

    # adjoint suffix scan (no flip -- Mosaic lacks `rev`):
    #   G_t = q_t + dA_{t+1} G_{t+1},  q_t = C_t dy_t,
    #   carry_in = dA_{chunk_end} * G_{chunk_end} from the later chunk.
    # Hillis-Steele with shift-UP: alpha_t = dA_{t+1} (fill 1 at t=T-1);
    # after the scan, Q_t = sum_{s>=t} (prod dA) q_s and alpha_t = prod_{r>t} dA_r,
    # so G = Q + alpha * carry_in.
    q = Cm[:, :, None] * dy[:, None, :]                       # (T, N, D)
    alpha = jnp.concatenate([dA[1:], jnp.ones_like(dA[:1])], axis=0)
    d = 1
    while d < q.shape[0]:
        alpha_sh = jnp.concatenate([alpha[d:], jnp.ones_like(alpha[:d])], axis=0)
        q_sh = jnp.concatenate([q[d:], jnp.zeros_like(q[:d])], axis=0)
        q = q + alpha * q_sh
        alpha = alpha * alpha_sh
        d *= 2
    G = q + alpha * g_scratch[...][None]                      # g_t (T, N, D)
    # carry for the next (earlier) chunk: dA_{first} * g_{first}
    first = lambda x: jnp.squeeze(jax.lax.slice_in_dim(x, 0, 1, axis=0), axis=0)
    g_scratch[...] = first(dA) * first(G)

    # gradients
    gdA = G * h_prev                                          # d/d(dA)
    # d delta: from dA=exp(delta*A): gdA * dA * A ; from dBu: G * B * u
    ddelta_ref[0] = (jnp.sum(gdA * dA * A[None], axis=1) +
                     jnp.sum(G * Bm[:, :, None], axis=1) * u)
    du_ref[0] = jnp.sum(G * Bm[:, :, None], axis=1) * delta
    db_ref[0] = jnp.sum(G * (delta * u)[:, None, :], axis=2)  # (T, N)
    dc_ref[0] = jnp.sum(states * dy[:, None, :], axis=2)      # (T, N)
    # dA accumulates over chunks; write once at the last grid step
    da_scratch[...] += jnp.sum(gdA * dA * delta[:, None, :], axis=0)

    @pl.when(l_idx == nl - 1)
    def _write_da():
        da_out_ref[0] = da_scratch[...]


def _pick_chunk(L: int, dstate: int, dim: int) -> int:
    """Largest power-of-two chunk with ~6 (T, N, D) fp32 tiles under ~8 MB VMEM.
    VMEM tiles are lane-padded to 128 internally, so budget with max(dim, 128)."""
    budget = 8 * 1024 * 1024
    t = budget // max(1, 6 * dstate * max(dim, 128) * 4)
    t = 2 ** int(math.floor(math.log2(max(t, 8))))
    return int(max(8, min(t, 512, L)))


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _scan_core_pallas(u, delta, A, Bmat, Cmat, interpret=False):
    """Kernel contract shapes; returns y (G, L, D). fp32 in/out."""
    y, _ = _scan_core_pallas_fwd(u, delta, A, Bmat, Cmat, interpret)
    return y


def _scan_core_pallas_fwd(u, delta, A, Bmat, Cmat, interpret=False):
    G, L, dim = u.shape
    dstate = A.shape[1]
    T = _pick_chunk(L, dstate, dim)
    assert L % T == 0, f"L={L} must be a multiple of chunk {T}"
    nl = L // T

    grid = (G, nl)
    ud_spec = pl.BlockSpec((1, T, dim), lambda g, l: (g, l, 0))
    a_spec = pl.BlockSpec((1, dstate, dim), lambda g, l: (g, 0, 0))
    bc_spec = pl.BlockSpec((1, T, dstate), lambda g, l: (g, l, 0))
    carry_spec = pl.BlockSpec((1, 1, dstate, dim), lambda g, l: (g, l, 0, 0))

    y, carries = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[ud_spec, ud_spec, a_spec, bc_spec, bc_spec],
        out_specs=(ud_spec, carry_spec),
        out_shape=(jax.ShapeDtypeStruct((G, L, dim), jnp.float32),
                   jax.ShapeDtypeStruct((G, nl, dstate, dim), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dstate, dim), jnp.float32)],
        interpret=interpret,
    )(u, delta, A, Bmat, Cmat)
    return y, (u, delta, A, Bmat, Cmat, carries)


def _scan_core_pallas_bwd(interpret, residuals, dy):
    u, delta, A, Bmat, Cmat, carries = residuals
    G, L, dim = u.shape
    dstate = A.shape[1]
    T = _pick_chunk(L, dstate, dim)
    nl = L // T

    grid = (G, nl)
    # reverse chunk order via the index map
    rev = lambda g, l: (g, nl - 1 - l, 0)
    ud_spec = pl.BlockSpec((1, T, dim), rev)
    a_spec = pl.BlockSpec((1, dstate, dim), lambda g, l: (g, 0, 0))
    bc_spec = pl.BlockSpec((1, T, dstate), rev)
    carry_spec = pl.BlockSpec((1, 1, dstate, dim),
                              lambda g, l: (g, nl - 1 - l, 0, 0))
    da_spec = pl.BlockSpec((1, dstate, dim), lambda g, l: (g, 0, 0))

    du, ddelta, dB, dC, dA = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[ud_spec, ud_spec, a_spec, bc_spec, bc_spec, ud_spec, carry_spec],
        out_specs=(ud_spec, ud_spec, bc_spec, bc_spec, da_spec),
        out_shape=(jax.ShapeDtypeStruct((G, L, dim), jnp.float32),
                   jax.ShapeDtypeStruct((G, L, dim), jnp.float32),
                   jax.ShapeDtypeStruct((G, L, dstate), jnp.float32),
                   jax.ShapeDtypeStruct((G, L, dstate), jnp.float32),
                   jax.ShapeDtypeStruct((G, dstate, dim), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((dstate, dim), jnp.float32),
                        pltpu.VMEM((dstate, dim), jnp.float32)],
        interpret=interpret,
    )(u, delta, A, Bmat, Cmat, dy, carries)
    return du, ddelta, dA, dB, dC


_scan_core_pallas.defvjp(_scan_core_pallas_fwd, _scan_core_pallas_bwd)


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus=False, return_last_state=False,
                          interpret: bool = False):
    """Mamba-convention wrapper around the Pallas core. Groups are folded into the
    leading axis; D (the channel dim) is padded to a multiple of 128 lanes; L is
    padded to the chunk size (padded steps have delta=0 => exp(0*A)=1, B*u=0: the
    state passes through unchanged and padded y is discarded)."""
    assert not return_last_state, "return_last_state unsupported on the pallas path"
    dtype_in = u.dtype
    batch, dim, L = u.shape
    dstate = A.shape[1]

    u32 = u.astype(jnp.float32)
    delta32 = _apply_delta_bias(delta, delta_bias, delta_softplus)
    A32 = A.astype(jnp.float32)

    # fold groups into the leading axis
    if B.ndim == 4:
        ngroups = B.shape[1]
    else:
        ngroups = 1
        B = B[:, None]
        C = C[:, None]
    gdim = dim // ngroups
    G = batch * ngroups

    def fold_u(x):  # (batch, dim, L) -> (G, L, gdim)
        x = x.reshape(batch, ngroups, gdim, L)
        return jnp.transpose(x, (0, 1, 3, 2)).reshape(G, L, gdim)

    u_k = fold_u(u32)
    delta_k = fold_u(delta32)
    A_k = jnp.transpose(A32.reshape(ngroups, gdim, dstate), (0, 2, 1))  # (ng, N, gdim)
    A_k = jnp.broadcast_to(A_k[None], (batch, ngroups, dstate, gdim)).reshape(
        G, dstate, gdim)
    B_k = jnp.transpose(B.astype(jnp.float32), (0, 1, 3, 2)).reshape(G, L, dstate)
    C_k = jnp.transpose(C.astype(jnp.float32), (0, 1, 3, 2)).reshape(G, L, dstate)

    # Mosaic pads tiles to the 128-lane boundary internally; no host-side channel
    # padding needed (it would materialize huge padded copies in HBM). Only pad
    # very small channel dims up to the fp32 sublane multiple.
    dpad = (-gdim) % 8 if gdim < 8 else 0
    if dpad:
        u_k = jnp.pad(u_k, ((0, 0), (0, 0), (0, dpad)))
        delta_k = jnp.pad(delta_k, ((0, 0), (0, 0), (0, dpad)))
        A_k = jnp.pad(A_k, ((0, 0), (0, 0), (0, dpad)))
    T = _pick_chunk(max(L, 8), dstate, gdim + dpad)
    lpad = (-L) % T
    if lpad:
        u_k = jnp.pad(u_k, ((0, 0), (0, lpad), (0, 0)))
        delta_k = jnp.pad(delta_k, ((0, 0), (0, lpad), (0, 0)))
        B_k = jnp.pad(B_k, ((0, 0), (0, lpad), (0, 0)))
        C_k = jnp.pad(C_k, ((0, 0), (0, lpad), (0, 0)))

    y_k = _scan_core_pallas(u_k, delta_k, A_k, B_k, C_k, interpret)

    y = y_k[:, :L, :gdim].reshape(batch, ngroups, L, gdim)
    y = jnp.transpose(y, (0, 1, 3, 2)).reshape(batch, dim, L)
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
