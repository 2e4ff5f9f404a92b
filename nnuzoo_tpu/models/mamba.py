"""Mamba sequence blocks on the TPU selective-scan kernel.

Replaces ``mamba_ssm.Mamba`` (used by LightMUNet `nnunetv2/nets/LightMUNet.py:6`,
lm2net, mamba_nd2net) and the vendored bidirectional/trimodal variant
(`nnunetv2/nets/seg_mamba/mamba_simple.py:37-448`): in_proj -> depthwise causal
conv1d + SiLU -> x_proj (dt, B, C) -> selective scan -> gate * silu(z) -> out_proj.

``bimamba_type``:
- None: unidirectional.
- 'v1'/'v2' ("bidirectional"): second parameter set scans the flipped sequence,
  outputs added.
- 'v3' ("spatial", SegMamba's trimodal): adds a third scan over the
  slice-transposed sequence (nslices grouping).

Mamba2 (SSD, `mamba_ssm.modules.mamba2.Mamba2` used by light_mamba2net): scalar
A per head with head grouping -- expressed through the same kernel with N-state
B/C and scalar decay; see :class:`Mamba2Block`.
"""

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.selective_scan import selective_scan
from .ss2d import a_log_init, dt_bias_init, scan_backend


def _causal_conv1d(x, kernel, bias=None):
    """x (B, L, D), depthwise causal conv along L with kernel (K, D)."""
    K = kernel.shape[0]
    xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
    out = 0
    for k in range(K):
        out = out + xp[:, k:k + x.shape[1]] * kernel[k]
    if bias is not None:
        out = out + bias
    return out


class _ScanBranch(nn.Module):
    """One directional scan parameter set: conv1d + x_proj + dt_proj + A/D."""
    d_inner: int
    d_state: int
    dt_rank: int
    d_conv: int
    name_suffix: str = ""

    @nn.compact
    def __call__(self, x_bld):
        """x (B, L, d_inner) -> scan output (B, L, d_inner), no gating."""
        B_, L, D = x_bld.shape
        conv_w = self.param(f"conv1d_weight", nn.initializers.lecun_normal(),
                            (self.d_conv, self.d_inner))
        conv_b = self.param(f"conv1d_bias", nn.initializers.zeros,
                            (self.d_inner,))
        x = nn.silu(_causal_conv1d(x_bld, conv_w, conv_b))

        x_dbl = nn.Dense(self.dt_rank + 2 * self.d_state, use_bias=False,
                         name="x_proj")(x)
        dt, Bmat, Cmat = jnp.split(x_dbl, [self.dt_rank,
                                           self.dt_rank + self.d_state], -1)
        from .ss2d import centered_uniform
        dt_std = self.dt_rank ** -0.5
        dt_w = self.param("dt_proj_weight", centered_uniform(dt_std),
                          (self.d_inner, self.dt_rank))
        dt_b = self.param("dt_proj_bias", dt_bias_init(), (self.d_inner,))
        delta = jnp.einsum("blr,dr->bld", dt, dt_w)

        A_log = self.param("A_log", a_log_init(self.d_state),
                           (self.d_inner, self.d_state))
        D_skip = self.param("D", nn.initializers.ones, (self.d_inner,))
        A = -jnp.exp(A_log.astype(jnp.float32))

        y = selective_scan(
            jnp.transpose(x, (0, 2, 1)), jnp.transpose(delta, (0, 2, 1)), A,
            jnp.transpose(Bmat, (0, 2, 1)), jnp.transpose(Cmat, (0, 2, 1)),
            D=D_skip, delta_bias=dt_b, delta_softplus=True,
            backend=scan_backend())
        return jnp.transpose(y, (0, 2, 1))


class MambaBlock(nn.Module):
    """Drop-in for mamba_ssm.Mamba: x (B, L, d_model) -> (B, L, d_model)."""
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    bimamba_type: Optional[str] = None  # None | 'v1' | 'v2' | 'v3'
    nslices: Optional[int] = None       # for 'v3' spatial branch

    @nn.compact
    def __call__(self, x):
        d_inner = int(self.expand * self.d_model)
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        xs, z = jnp.split(xz, 2, -1)

        y = _ScanBranch(d_inner, self.d_state, dt_rank, self.d_conv,
                        name="fwd")(xs)
        if self.bimamba_type in ("v1", "v2"):
            y_b = _ScanBranch(d_inner, self.d_state, dt_rank, self.d_conv,
                              name="bwd")(jnp.flip(xs, 1))
            y = y + jnp.flip(y_b, 1)
        if self.bimamba_type == "v3":
            assert self.nslices is not None, "v3 (spatial) needs nslices"
            B_, L, D = xs.shape
            ns = self.nslices
            per = L // ns
            # slice-major reordering: (B, ns, per, D) -> (B, per, ns, D) flatten
            xs_s = xs.reshape(B_, ns, per, D).transpose(0, 2, 1, 3).reshape(
                B_, L, D)
            y_s = _ScanBranch(d_inner, self.d_state, dt_rank, self.d_conv,
                              name="spatial")(xs_s)
            y_s = y_s.reshape(B_, per, ns, D).transpose(0, 2, 1, 3).reshape(
                B_, L, D)
            y_b = _ScanBranch(d_inner, self.d_state, dt_rank, self.d_conv,
                              name="bwd")(jnp.flip(xs, 1))
            y = y + jnp.flip(y_b, 1) + y_s

        y = y * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class Mamba2Block(nn.Module):
    """Mamba2 / SSD (replaces the Triton `mamba_ssm.modules.mamba2.Mamba2` used
    by light_mamba2net): multi-head with SCALAR decay per head, shared B/C across
    head channels (ngroups=1), RMSNorm gating. Expressed through the same
    selective-scan kernel: per head, A is a scalar so the (D, N) A matrix is the
    broadcast of one value; head channels share delta."""
    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64

    @nn.compact
    def __call__(self, x):
        d_inner = int(self.expand * self.d_model)
        nheads = max(1, d_inner // self.headdim)
        headdim = d_inner // nheads
        B_, L, _ = x.shape
        N = self.d_state

        # in_proj emits z, x, B, C, dt together (mamba2 layout)
        zxbcdt = nn.Dense(2 * d_inner + 2 * N + nheads, use_bias=False,
                          name="in_proj")(x)
        z, xs, Bmat, Cmat, dt = jnp.split(
            zxbcdt, [d_inner, 2 * d_inner, 2 * d_inner + N, 2 * d_inner + 2 * N],
            -1)

        conv_w = self.param("conv1d_weight", nn.initializers.lecun_normal(),
                            (self.d_conv, d_inner + 2 * N))
        conv_b = self.param("conv1d_bias", nn.initializers.zeros,
                            (d_inner + 2 * N,))
        xbc = nn.silu(_causal_conv1d(jnp.concatenate([xs, Bmat, Cmat], -1),
                                     conv_w, conv_b))
        xs, Bmat, Cmat = jnp.split(xbc, [d_inner, d_inner + N], -1)

        A_log = self.param("A_log",
                           lambda k, s: jnp.log(jax.random.uniform(
                               k, s, minval=1.0, maxval=16.0)), (nheads,))
        dt_bias = self.param("dt_bias", dt_bias_init(), (nheads,))
        D_skip = self.param("D", nn.initializers.ones, (nheads,))
        A = -jnp.exp(A_log.astype(jnp.float32))

        if scan_backend() == "mamba1":
            # legacy path: express through the Mamba1 selective-scan kernel by
            # broadcasting the per-head scalar A over channels and states
            A_full = jnp.repeat(A, headdim)[:, None] * jnp.ones((1, N))
            delta = jnp.repeat(dt, headdim, axis=-1)      # (B, L, d_inner)
            delta_bias = jnp.repeat(dt_bias, headdim)
            D_full = jnp.repeat(D_skip, headdim)
            y = selective_scan(
                jnp.transpose(xs, (0, 2, 1)), jnp.transpose(delta, (0, 2, 1)),
                A_full, jnp.transpose(Bmat, (0, 2, 1)),
                jnp.transpose(Cmat, (0, 2, 1)), D=D_full,
                delta_bias=delta_bias, delta_softplus=True)
            y = jnp.transpose(y, (0, 2, 1))
        else:
            # chunked SSD (state-space duality): the scalar-decay structure
            # turns the scan into masked matmuls on the MXU (ops/ssd.py)
            from ..ops.ssd import ssd_chunked
            xh = xs.reshape(B_, L, nheads, headdim)
            y = ssd_chunked(xh, dt, A,
                            Bmat[:, :, None, :], Cmat[:, :, None, :],
                            D=D_skip, dt_bias=dt_bias, chunk_size=128)
            y = y.reshape(B_, L, d_inner)

        # gated RMSNorm (mamba2)
        y = y * nn.silu(z)
        y = y * jax.lax.rsqrt(jnp.mean(y ** 2, -1, keepdims=True) + 1e-5)
        y = y * self.param("norm_weight", nn.initializers.ones, (d_inner,))
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class RMSNorm(nn.Module):
    """Replaces the Triton fused rms_norm_fn (reference `mamba_nd2net.py:27`);
    XLA fuses this fine."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        return x * jax.lax.rsqrt(jnp.mean(x ** 2, -1, keepdims=True)
                                 + self.epsilon) * scale
