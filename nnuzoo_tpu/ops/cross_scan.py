"""Fused cross-scan for SS2D/SSND: projections + selective scan in one kernel.

The SS2D block (reference `nnunetv2/nets/m2net.py:39-226`) builds K=2G scan
directions (G axis orders, each forward + reversed), projects each direction to
(dt, B, C), and runs K selective scans. Materializing those intermediates is
the dominant HBM cost of the X2Net models at full resolution: the K-stacked
``xs`` (K*Dh lanes), the fp32 ``x_dbl``/``delta``, and the packed B/C operands
together cost ~4x the traffic of the conv streams themselves.

This module fuses the whole chain into the scan kernel. Two kernel launches
cover the K directions:

- ``reverse=False``: the G forward directions, chunks walked left-to-right.
- ``reverse=True``:  the G reversed directions. Chunks are walked
  right-to-left via the BlockSpec index map and the in-chunk scan runs in
  suffix form, so the reversed sequences are NEVER materialized (a reverse
  scan is just a scan with mirrored traversal).

Per kernel, HBM sees only: the G conv streams (Dh lanes each, read), y
(G*Dh lanes, written in natural spatial order — no un-flip needed), and the
per-chunk boundary states for the backward. ``delta = softplus(u @ Wx @ Wdt +
bias)``, ``B``, ``C``, ``exp(delta*A)`` and the D-term all live in VMEM only.

Lane packing: the scan kernels are GRID-OVERHEAD-bound on v5e (thousands of
sequential chunk steps), so when G*Dh < 128 the kernel packs ``nb = 128 //
(G*Dh)`` batch elements into the lane dimension (layout ``[b0:(g0|g1) |
b1:(g0|g1)]``) — full-width VPU tiles and an nb-times smaller grid.

The backward recomputes in-chunk states from the saved carries
(flash-attention style, same as `selective_scan.py`) and additionally
accumulates the projection-weight gradients (dWx, dWdt, dbias, dA, dD) in
VMEM scratch, writing per-batch-group partials once at the last grid step.

Semantics oracle: :func:`cross_scan_ref` (pure XLA, autodiff) — the fused path
must match it to fp32 tolerance; see `tests/test_cross_scan.py`.
"""

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from .selective_scan import _pick_chunk, _scan_pair, selective_scan_blkd

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


# ------------------------------------------------------------------ reference
def cross_scan_ref(streams: Sequence[jax.Array], x_proj_weight, dt_weight,
                   dt_bias, A, Ds, reverse: bool = False) -> jax.Array:
    """Pure-XLA oracle/fallback. streams: G arrays (B, L, Dh); x_proj_weight
    (G, R+2N, Dh); dt_weight (G, Dh, R); dt_bias (G, Dh); A (G*Dh, N) (the
    already-negated continuous-time matrix); Ds (G*Dh,).
    Returns y (B, L, G*Dh) in natural (unflipped) sequence order."""
    G = len(streams)
    N = A.shape[1]
    R = x_proj_weight.shape[1] - 2 * N
    xs = jnp.stack(streams, 2)                      # (B, L, G, Dh)
    if reverse:
        xs = jnp.flip(xs, 1)
    x_dbl = jnp.einsum("blgd,gcd->blgc", xs.astype(jnp.float32),
                       x_proj_weight.astype(jnp.float32))
    dts, Bs, Cs = jnp.split(x_dbl, [R, R + N], axis=-1)
    dts = jnp.einsum("blgr,gdr->blgd", dts, dt_weight.astype(jnp.float32))
    y = selective_scan_blkd(xs, dts, A, Bs, Cs, D=Ds,
                            delta_bias=dt_bias.reshape(-1),
                            delta_softplus=True, backend="xla")
    if reverse:
        y = jnp.flip(y, 1)
    B_, L = xs.shape[0], xs.shape[1]
    return y.reshape(B_, L, G * xs.shape[-1]).astype(streams[0].dtype)


# ------------------------------------------------------------------ kernels
def _hs(a, b, up: bool):
    """Linear-recurrence scan over axis 0 (hierarchical, see
    `selective_scan._scan_pair`). up=False (prefix): h_t = a_t h_{t-1} + b_t,
    h_{-1}=0. up=True (suffix): h_t = a_t h_{t+1} + b_t, h_T=0. Returns
    (a_cum, b_cum) with h_t = a_cum_t * h_boundary + b_cum_t."""
    return _scan_pair(a, b, up)


def _row(x, i):
    return jnp.squeeze(jax.lax.slice_in_dim(x, i, i + 1, axis=0), axis=0)


def _projections(stream_refs, wx_ref, wdt_ref, dtb_ref, nb, G, Dh, N, R):
    """In-VMEM prologue shared by fwd and bwd. Lane layout: nb batch elements
    x G directions x Dh, i.e. lanes [b, g, d]. One small dot per (b, g) —
    Mosaic rejects sublane concatenation of lane-offset vectors, so the
    nb-stacked variant cannot compile; per-(b, g) dots are the round-2 per-g
    pattern, which lowers cleanly. Returns lane-packed u/delta (T, nb*G*Dh),
    Bx/Cx (T, N, nb*G*Dh), and per_bg[g][b] = (u_bg (T, Dh), dts_bg (T, R))
    for the weight-gradient dots."""
    f32 = jnp.float32
    T = stream_refs[0].shape[1]
    per_bg = [[None] * nb for _ in range(G)]
    u_bg = [[None] * G for _ in range(nb)]
    delta_bg = [[None] * G for _ in range(nb)]
    b_bg = [[None] * G for _ in range(nb)]
    c_bg = [[None] * G for _ in range(nb)]
    for g in range(G):
        wx = wx_ref[g].astype(f32)                                # (R+2N, Dh)
        wdt = wdt_ref[g].astype(f32)                              # (Dh, R)
        dtb = dtb_ref[g].astype(f32)
        for b in range(nb):
            u_g = stream_refs[g][b].astype(f32)                   # (T, Dh)
            x_dbl = jax.lax.dot_general(u_g, wx, (((1,), (1,)), ((), ())),
                                        preferred_element_type=f32)
            dts = jax.lax.slice_in_dim(x_dbl, 0, R, axis=1)       # (T, R)
            bg = jax.lax.slice_in_dim(x_dbl, R, R + N, axis=1)    # (T, N)
            cg = jax.lax.slice_in_dim(x_dbl, R + N, R + 2 * N, axis=1)
            raw = jax.lax.dot_general(dts, wdt, (((1,), (1,)), ((), ())),
                                      preferred_element_type=f32)  # (T, Dh)
            raw = raw + dtb[None, :]
            per_bg[g][b] = (u_g, dts)
            u_bg[b][g] = u_g
            delta_bg[b][g] = jax.nn.softplus(raw)
            b_bg[b][g] = jnp.broadcast_to(bg[:, :, None], (T, N, Dh))
            c_bg[b][g] = jnp.broadcast_to(cg[:, :, None], (T, N, Dh))
    u = jnp.concatenate([u_bg[b][g] for b in range(nb) for g in range(G)],
                        axis=1)                   # (T, nb*G*Dh)
    delta = jnp.concatenate(
        [delta_bg[b][g] for b in range(nb) for g in range(G)], axis=1)
    Bx = jnp.concatenate([b_bg[b][g] for b in range(nb) for g in range(G)],
                         axis=2)                  # (T, N, nb*G*Dh)
    Cx = jnp.concatenate([c_bg[b][g] for b in range(nb) for g in range(G)],
                         axis=2)
    return u, delta, Bx, Cx, per_bg


def _fwd_kernel(*refs, nb: int, G: int, Dh: int, N: int, R: int,
                reverse: bool):
    stream_refs = refs[:G]
    (wx_ref, wdt_ref, dtb_ref, a_ref, ds_ref,
     y_ref, carry_ref, h_scratch) = refs[G:]
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    u, delta, Bx, Cx, _ = _projections(stream_refs, wx_ref, wdt_ref, dtb_ref,
                                       nb, G, Dh, N, R)
    A = a_ref[...].astype(jnp.float32)                    # (N, nb*G*Dh)

    carry_ref[0, 0] = h_scratch[...]       # boundary state entering the chunk

    dA = jnp.exp(delta[:, None, :] * A[None, :, :])       # (T, N, nb*G*Dh)
    dBu = (delta * u)[:, None, :] * Bx
    a_cum, b_cum = _hs(dA, dBu, up=reverse)
    states = a_cum * h_scratch[...][None] + b_cum
    y = jnp.sum(states * Cx, axis=1) + u * ds_ref[0].astype(jnp.float32)[None]
    T = y.shape[0]
    GD = G * Dh
    for b in range(nb):
        y_ref[b] = jax.lax.slice_in_dim(y, b * GD, (b + 1) * GD,
                                        axis=1).astype(y_ref.dtype)
    h_scratch[...] = _row(states, 0) if reverse else _row(states, T - 1)


def _bwd_kernel(*refs, nb: int, G: int, Dh: int, N: int, R: int,
                reverse: bool):
    stream_refs = refs[:G]
    (wx_ref, wdt_ref, dtb_ref, a_ref, ds_ref, dy_ref, carry_ref,
     du_ref, dwx_ref, dwdt_ref, dtb_out_ref, da_out_ref, dds_ref,
     g_scratch, dwx_s, dwdt_s, dtb_s, da_s, dds_s) = refs[G:]
    l_idx = pl.program_id(1)
    nl = pl.num_programs(1)
    f32 = jnp.float32

    @pl.when(l_idx == 0)
    def _init():
        g_scratch[...] = jnp.zeros_like(g_scratch)
        dwx_s[...] = jnp.zeros_like(dwx_s)
        dwdt_s[...] = jnp.zeros_like(dwdt_s)
        dtb_s[...] = jnp.zeros_like(dtb_s)
        da_s[...] = jnp.zeros_like(da_s)
        dds_s[...] = jnp.zeros_like(dds_s)

    u, delta, Bx, Cx, per_bg = _projections(stream_refs, wx_ref, wdt_ref,
                                            dtb_ref, nb, G, Dh, N, R)
    A = a_ref[...].astype(f32)
    Ds = ds_ref[0].astype(f32)
    dy = jnp.concatenate([dy_ref[b].astype(f32) for b in range(nb)],
                         axis=1)                                # (T, nbGD)
    h_in = carry_ref[0, 0]                                      # (N, nbGD)

    # recompute this chunk's states from the saved boundary carry
    dA = jnp.exp(delta[:, None, :] * A[None, :, :])
    dBu = (delta * u)[:, None, :] * Bx
    a_cum, b_cum = _hs(dA, dBu, up=reverse)
    states = a_cum * h_in[None] + b_cum
    T = states.shape[0]

    # adjoint scan. prefix fwd (h_t = dA_t h_{t-1} + dBu_t) has suffix
    # adjoint g_t = C_t dy_t + dA_{t+1} g_{t+1}; the suffix fwd mirrors it.
    q = Cx * dy[:, None, :]
    if not reverse:
        h_adj = jnp.concatenate([h_in[None], states[:-1]], axis=0)  # h_{t-1}
        alpha = jnp.concatenate([dA[1:], jnp.ones_like(dA[:1])], axis=0)
        a_cum2, q_cum = _hs(alpha, q, up=True)
        Gt = q_cum + a_cum2 * g_scratch[...][None]
        g_scratch[...] = _row(dA, 0) * _row(Gt, 0)
    else:
        h_adj = jnp.concatenate([states[1:], h_in[None]], axis=0)   # h_{t+1}
        alpha = jnp.concatenate([jnp.ones_like(dA[:1]), dA[:-1]], axis=0)
        a_cum2, q_cum = _hs(alpha, q, up=False)
        Gt = q_cum + a_cum2 * g_scratch[...][None]
        g_scratch[...] = _row(dA, T - 1) * _row(Gt, T - 1)

    gdA = Gt * h_adj
    GB = jnp.sum(Gt * Bx, axis=1)                               # (T, nbGD)
    ddelta = jnp.sum(gdA * dA * A[None], axis=1) + GB * u
    du = GB * delta + dy * Ds[None]
    da_s[...] += jnp.sum(gdA * dA * delta[:, None, :], axis=0)
    dds_s[...] += jnp.sum(dy * u, axis=0)[None]

    dB_full = Gt * (delta * u)[:, None, :]                      # (T, N, nbGD)
    dC_full = states * dy[:, None, :]
    # softplus'(raw) = sigmoid(raw) = 1 - exp(-softplus(raw)) = 1 - exp(-delta)
    draw = ddelta * (1.0 - jnp.exp(-delta))

    GD = G * Dh
    lane = lambda t, b, g: jax.lax.slice_in_dim(
        t, (b * G + g) * Dh, (b * G + g) * Dh + Dh, axis=-1)
    # one small dot per (b, g): Mosaic cannot concat lane-offset vectors along
    # sublanes, so the nb-stacked dots are not lowerable; accumulate the
    # per-(b, g) weight-grad partials into the VMEM scratches instead
    du_extra = [[None] * G for _ in range(nb)]
    for g in range(G):
        wdt_g = wdt_ref[g].astype(f32)                          # (Dh, R)
        wx_g = wx_ref[g].astype(f32)                            # (R+2N, Dh)
        dwdt_acc = dwx_acc = dtb_acc = None
        for b in range(nb):
            u_g, dts_g = per_bg[g][b]
            draw_g = lane(draw, b, g)                           # (T, Dh)
            dB_g = jnp.sum(lane(dB_full, b, g), axis=2)         # (T, N)
            dC_g = jnp.sum(lane(dC_full, b, g), axis=2)
            d_dts_g = jax.lax.dot_general(draw_g, wdt_g,
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=f32)  # (T, R)
            dwdt_b = jax.lax.dot_general(draw_g, dts_g,
                                         (((0,), (0,)), ((), ())),
                                         preferred_element_type=f32)  # (Dh, R)
            d_xdbl_g = jnp.concatenate([d_dts_g, dB_g, dC_g],
                                       axis=1)                  # (T, R+2N)
            du_extra[b][g] = jax.lax.dot_general(
                d_xdbl_g, wx_g, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                     # (T, Dh)
            dwx_b = jax.lax.dot_general(d_xdbl_g, u_g,
                                        (((0,), (0,)), ((), ())),
                                        preferred_element_type=f32)
            dtb_b = jnp.sum(draw_g, axis=0)
            dwdt_acc = dwdt_b if dwdt_acc is None else dwdt_acc + dwdt_b
            dwx_acc = dwx_b if dwx_acc is None else dwx_acc + dwx_b
            dtb_acc = dtb_b if dtb_acc is None else dtb_acc + dtb_b
        dwdt_s[g] += dwdt_acc
        dwx_s[g] += dwx_acc
        dtb_s[g] += dtb_acc
    for b in range(nb):
        du_b = jax.lax.slice_in_dim(du, b * GD, (b + 1) * GD, axis=1) + \
            jnp.concatenate(du_extra[b], axis=1)
        du_ref[b] = du_b.astype(du_ref.dtype)

    @pl.when(l_idx == nl - 1)
    def _write_weight_grads():
        dwx_ref[0] = dwx_s[...]
        dwdt_ref[0] = dwdt_s[...]
        dtb_out_ref[0] = dtb_s[...]
        da_out_ref[0] = da_s[...]
        dds_ref[0] = dds_s[...]


# ------------------------------------------------------------------ wrappers
@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _cross_scan_pallas(streams, wx, wdt, dtb, a_t, ds, nb, reverse, interpret):
    """streams: G x (B, L, Dh) with B % nb == 0; a_t (N, nb*G*Dh) pre-tiled;
    ds (1, nb*G*Dh) pre-tiled. Returns y (B, L, G*Dh)."""
    y, _ = _cross_scan_pallas_fwd(streams, wx, wdt, dtb, a_t, ds,
                                  nb, reverse, interpret)
    return y


def _specs(T, nl, nb, G, Dh, N, R, reverse):
    if reverse:
        lmap = lambda b, l: (b, nl - 1 - l, 0)
        cmap = lambda b, l: (b, nl - 1 - l, 0, 0)
    else:
        lmap = lambda b, l: (b, l, 0)
        cmap = lambda b, l: (b, l, 0, 0)
    stream_spec = pl.BlockSpec((nb, T, Dh), lmap)
    y_spec = pl.BlockSpec((nb, T, G * Dh), lmap)
    carry_spec = pl.BlockSpec((1, 1, N, nb * G * Dh), cmap)
    wx_spec = pl.BlockSpec((G, R + 2 * N, Dh), lambda b, l: (0, 0, 0))
    wdt_spec = pl.BlockSpec((G, Dh, R), lambda b, l: (0, 0, 0))
    dtb_spec = pl.BlockSpec((G, Dh), lambda b, l: (0, 0))
    a_spec = pl.BlockSpec((N, nb * G * Dh), lambda b, l: (0, 0))
    ds_spec = pl.BlockSpec((1, nb * G * Dh), lambda b, l: (0, 0))
    return stream_spec, y_spec, carry_spec, wx_spec, wdt_spec, dtb_spec, \
        a_spec, ds_spec


def _cross_scan_pallas_fwd(streams, wx, wdt, dtb, a_t, ds, nb, reverse,
                           interpret):
    G = len(streams)
    batch, L, Dh = streams[0].shape
    N = a_t.shape[0]
    R = wx.shape[1] - 2 * N
    T = _pick_chunk(L, N, nb * G * Dh)
    assert L % T == 0, f"L={L} must be a multiple of chunk {T}"
    assert batch % nb == 0, (batch, nb)
    nl = L // T
    ngrp = batch // nb
    (stream_spec, y_spec, carry_spec, wx_spec, wdt_spec, dtb_spec, a_spec,
     ds_spec) = _specs(T, nl, nb, G, Dh, N, R, reverse)

    y, carries = pl.pallas_call(
        partial(_fwd_kernel, nb=nb, G=G, Dh=Dh, N=N, R=R, reverse=reverse),
        grid=(ngrp, nl),
        in_specs=[stream_spec] * G + [wx_spec, wdt_spec, dtb_spec, a_spec,
                                      ds_spec],
        out_specs=(y_spec, carry_spec),
        out_shape=(jax.ShapeDtypeStruct((batch, L, G * Dh), streams[0].dtype),
                   jax.ShapeDtypeStruct((ngrp, nl, N, nb * G * Dh),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, nb * G * Dh), jnp.float32)],
        interpret=interpret,
    )(*streams, wx, wdt, dtb, a_t, ds)
    # same checkpoint names as selective_scan: an outer remat policy keeps the
    # scan outputs so the fwd kernel is not re-run during backward
    y = _checkpoint_name(y, "scan_y")
    carries = _checkpoint_name(carries, "scan_carries")
    return y, (streams, wx, wdt, dtb, a_t, ds, carries)


def _cross_scan_pallas_bwd(nb, reverse, interpret, residuals, dy):
    streams, wx, wdt, dtb, a_t, ds, carries = residuals
    G = len(streams)
    batch, L, Dh = streams[0].shape
    N = a_t.shape[0]
    R = wx.shape[1] - 2 * N
    T = _pick_chunk(L, N, nb * G * Dh)
    nl = L // T
    ngrp = batch // nb
    # the backward walks chunks opposite to the forward
    (stream_spec, y_spec, carry_spec, wx_spec, wdt_spec, dtb_spec, a_spec,
     ds_spec) = _specs(T, nl, nb, G, Dh, N, R, not reverse)

    batch_map = lambda nd: pl.BlockSpec(
        (1,) + nd, lambda b, l, _n=len(nd): (b,) + (0,) * _n)
    du, dwx, dwdt, dtb_g, da, dds = pl.pallas_call(
        partial(_bwd_kernel, nb=nb, G=G, Dh=Dh, N=N, R=R, reverse=reverse),
        grid=(ngrp, nl),
        in_specs=[stream_spec] * G + [wx_spec, wdt_spec, dtb_spec, a_spec,
                                      ds_spec, y_spec, carry_spec],
        out_specs=(y_spec, batch_map((G, R + 2 * N, Dh)),
                   batch_map((G, Dh, R)), batch_map((G, Dh)),
                   batch_map((N, nb * G * Dh)), batch_map((1, nb * G * Dh))),
        out_shape=(
            jax.ShapeDtypeStruct((batch, L, G * Dh), streams[0].dtype),
            jax.ShapeDtypeStruct((ngrp, G, R + 2 * N, Dh), jnp.float32),
            jax.ShapeDtypeStruct((ngrp, G, Dh, R), jnp.float32),
            jax.ShapeDtypeStruct((ngrp, G, Dh), jnp.float32),
            jax.ShapeDtypeStruct((ngrp, N, nb * G * Dh), jnp.float32),
            jax.ShapeDtypeStruct((ngrp, 1, nb * G * Dh), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, nb * G * Dh), jnp.float32),
                        pltpu.VMEM((G, R + 2 * N, Dh), jnp.float32),
                        pltpu.VMEM((G, Dh, R), jnp.float32),
                        pltpu.VMEM((G, Dh), jnp.float32),
                        pltpu.VMEM((N, nb * G * Dh), jnp.float32),
                        pltpu.VMEM((1, nb * G * Dh), jnp.float32)],
        interpret=interpret,
    )(*streams, wx, wdt, dtb, a_t, ds, dy, carries)
    d_streams = tuple(
        du[:, :, g * Dh:(g + 1) * Dh].astype(streams[g].dtype)
        for g in range(G))
    GD = G * Dh
    da_sum = jnp.sum(da.reshape(ngrp, N, nb, GD), axis=(0, 2))   # (N, GD)
    dds_sum = jnp.sum(dds.reshape(ngrp, 1, nb, GD), axis=(0, 2))  # (1, GD)
    # grads must match the (pre-tiled) a_t/ds input shapes
    return (d_streams, jnp.sum(dwx, 0).astype(wx.dtype),
            jnp.sum(dwdt, 0).astype(wdt.dtype),
            jnp.sum(dtb_g, 0).astype(dtb.dtype),
            jnp.tile(da_sum, (1, nb)).astype(a_t.dtype) / nb,
            jnp.tile(dds_sum, (1, nb)).astype(ds.dtype) / nb)


_cross_scan_pallas.defvjp(_cross_scan_pallas_fwd, _cross_scan_pallas_bwd)


# ------------------------------------------------------------------ public
def cross_scan_fused(streams: Sequence[jax.Array], x_proj_weight, dt_weight,
                     dt_bias, A, Ds, reverse: bool = False,
                     backend: Optional[str] = None,
                     interpret: bool = False) -> jax.Array:
    """Fused projections + selective scan over G directions of one traversal
    orientation.

    streams: G arrays (B, L, Dh) — the per-axis-order sequences (e.g. row-major
    and column-major flattenings of the conv output). Always the FORWARD
    sequences; ``reverse=True`` scans them back-to-front without materializing
    flips. x_proj_weight (G, R+2N, Dh); dt_weight (G, Dh, R); dt_bias (G, Dh);
    A (G*Dh, N) already negated (``-exp(A_log)``); Ds (G*Dh,).

    Returns y (B, L, G*Dh) in natural sequence order (dir g in lanes
    [g*Dh:(g+1)*Dh]), including the ``u * D`` skip term.
    """
    if backend is None:
        backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    if backend != "pallas" or not _HAS_PALLAS:
        return cross_scan_ref(streams, x_proj_weight, dt_weight, dt_bias,
                              A, Ds, reverse)
    G = len(streams)
    batch, L, Dh = streams[0].shape
    N = A.shape[1]
    # pack batch elements into spare lanes (full VPU width + smaller grid)
    nb = max(1, min(batch, 128 // (G * Dh)))
    bpad = (-batch) % nb
    a_t = jnp.tile(jnp.transpose(A.astype(jnp.float32), (1, 0)), (1, nb))
    ds2 = jnp.tile(Ds.astype(jnp.float32).reshape(1, G * Dh), (1, nb))
    T = _pick_chunk(max(L, 8), N, nb * G * Dh)
    lpad = (-L) % T
    if lpad or bpad:
        # zero padding is safe in both directions: u=0 -> dBu=0, so the state
        # entering the real data stays 0 (delta>0 from the bias only decays 0)
        streams = [jnp.pad(s, ((0, bpad), (0, lpad), (0, 0))) for s in streams]
    y = _cross_scan_pallas(tuple(streams), x_proj_weight.astype(jnp.float32),
                           dt_weight.astype(jnp.float32),
                           dt_bias.astype(jnp.float32), a_t,
                           ds2, nb, reverse, interpret)
    return y[:batch, :L]
