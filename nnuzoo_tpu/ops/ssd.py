"""Mamba2 SSD (state-space duality) — chunked scan, TPU-native.

Replaces the Triton SSD kernels behind ``mamba_ssm.modules.mamba2.Mamba2``
(reference import `nnunetv2/nets/light_mamba2net.py:5`). Semantics: per-head
SCALAR decay, recurrence

    h_t = exp(dt_t * A_h) * h_{t-1} + dt_t * B_t x_t ;  y_t = C_t . h_t (+ D x)

The chunked formulation (Dao & Gu, "Transformers are SSMs", 2024) splits L into
chunks of Q tokens and turns almost all work into batched matmuls, which is the
right decomposition for the MXU (the per-timestep Mamba1 recurrence is
VPU-bound):

  intra-chunk   Y[i] += sum_{j<=i}  (C_i.B_j) exp(cum_i - cum_j) dt_j x_j
                -> one (Q, Q) masked "attention" matmul per chunk
  chunk states  S_c   = sum_j exp(cum_end - cum_j) B_j (dt_j x_j)^T
  state scan    H_c   = d_{c-1} H_{c-1} + S_{c-1}     (associative over chunks)
  inter-chunk   Y[i] += exp(cum_i) C_i . H_c

All decay factors are exp of non-positive numbers -> everything is <= 1 and
the computation is stable in fp32.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk_size", "dt_softplus"))
def ssd_chunked(x, dt, A, B, C, D: Optional[jax.Array] = None,
                dt_bias: Optional[jax.Array] = None,
                chunk_size: int = 128, dt_softplus: bool = True):
    """x (batch, L, H, P); dt (batch, L, H); A (H,) negative;
    B/C (batch, L, G, N) with H % G == 0; D (H,) skip. Returns (batch, L, H, P).
    """
    out_dtype = x.dtype
    # fp32 inputs get true-fp32 matmuls (the MXU's DEFAULT precision runs
    # single-pass bf16, ~4e-3 relative error on these contractions); bf16
    # training keeps the fast path
    prec = (jax.lax.Precision.HIGHEST if out_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    Bt, L, H, P = x.shape
    G, N = B.shape[2], B.shape[3]
    assert H % G == 0, (H, G)

    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)

    Q = min(chunk_size, L)
    pad = (-L) % Q
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Lp = L + pad
    nc = Lp // Q

    # expand groups to heads (zoo uses G=1, so this is a broadcast view)
    rep = H // G
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=2)   # (B, Lp, H, N)
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=2)

    a = dt * A.astype(jnp.float32)[None, None, :]          # (B, Lp, H) <= 0
    xdt = x.astype(jnp.float32) * dt[..., None]            # (B, Lp, H, P)

    # chunk views
    a_c = a.reshape(Bt, nc, Q, H)
    x_c = xdt.reshape(Bt, nc, Q, H, P)
    B_c = Bh.reshape(Bt, nc, Q, H, N)
    C_c = Ch.reshape(Bt, nc, Q, H, N)

    cum = jnp.cumsum(a_c, axis=2)                          # (B, nc, Q, H)

    # ---------------- intra-chunk: masked (Q, Q) attention-style matmul
    scores = jnp.einsum("bcihn,bcjhn->bchij", C_c, B_c,
                        preferred_element_type=jnp.float32, precision=prec)
    # decay[b, c, h, i, j] = exp(cum_i - cum_j); valid only for j <= i. Mask
    # the exponent (not the product) — for j > i it is positive and exp would
    # overflow to inf, poisoning the backward pass with 0*inf.
    diff = (cum[:, :, :, None, :].transpose(0, 1, 4, 2, 3) -
            cum[:, :, None, :, :].transpose(0, 1, 4, 2, 3))
    mask = jnp.tril(jnp.ones((Q, Q), bool))
    decay = jnp.exp(jnp.where(mask[None, None, None], diff, -jnp.inf))
    M = scores * decay
    y = jnp.einsum("bchij,bcjhp->bcihp", M, x_c,
                   preferred_element_type=jnp.float32, precision=prec)

    # ---------------- chunk states and associative state passing
    decay_to_end = jnp.exp(cum[:, :, -1:, :] - cum)        # (B, nc, Q, H)
    S = jnp.einsum("bcjhn,bcjhp->bchnp", B_c * decay_to_end[..., None], x_c,
                   preferred_element_type=jnp.float32, precision=prec)     # (B, nc, H, N, P)
    d_chunk = jnp.exp(cum[:, :, -1, :])                    # (B, nc, H)

    def combine(left, right):
        d1, s1 = left
        d2, s2 = right
        return d1 * d2, s1 * d2[:, :, :, None, None] + s2

    d_end, S_end = jax.lax.associative_scan(combine, (d_chunk, S), axis=1)
    # initial state of chunk c = state at the end of chunk c-1
    H0 = jnp.concatenate([jnp.zeros_like(S_end[:, :1]), S_end[:, :-1]], axis=1)

    # ---------------- inter-chunk contribution
    y = y + jnp.einsum("bcihn,bchnp->bcihp", C_c * jnp.exp(cum)[..., None], H0,
                       preferred_element_type=jnp.float32, precision=prec)

    y = y.reshape(Bt, Lp, H, P)[:, :L]
    if D is not None:
        y = y + x.astype(jnp.float32)[:, :L] * D.astype(jnp.float32)[None, None, :, None]
    return y.astype(out_dtype)


def ssd_ref(x, dt, A, B, C, D=None, dt_bias=None, dt_softplus: bool = True):
    """Per-timestep reference recurrence (ground truth for tests)."""
    Bt, L, H, P = x.shape
    G, N = B.shape[2], B.shape[3]
    rep = H // G
    cdt = jnp.promote_types(jnp.float32, x.dtype)   # fp64 under x64 tests
    A = A.astype(cdt)
    Bh = jnp.repeat(B.astype(cdt), rep, axis=2)
    Ch = jnp.repeat(C.astype(cdt), rep, axis=2)
    dt = dt.astype(cdt)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(cdt)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    xf = x.astype(cdt)

    def step(h, inp):
        xt, dtt, bt, ct = inp     # (B,H,P), (B,H), (B,H,N), (B,H,N)
        decay = jnp.exp(dtt * A[None])                     # (B,H)
        h = h * decay[..., None, None] + \
            jnp.einsum("bhn,bhp->bhnp", bt, xt * dtt[..., None])
        y = jnp.einsum("bhn,bhnp->bhp", ct, h)
        return h, y

    h0 = jnp.zeros((Bt, H, N, P), cdt)
    _, ys = jax.lax.scan(step, h0, (xf.transpose(1, 0, 2, 3),
                                    dt.transpose(1, 0, 2),
                                    Bh.transpose(1, 0, 2, 3),
                                    Ch.transpose(1, 0, 2, 3)))
    y = ys.transpose(1, 0, 2, 3)
    if D is not None:
        y = y + xf * D.astype(jnp.float32)[None, None, :, None]
    return y.astype(x.dtype)
