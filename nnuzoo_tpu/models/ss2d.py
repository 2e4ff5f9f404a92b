"""SS2D: 4-direction visual selective scan (reference: `nnunetv2/nets/m2net.py:39-226`,
same module in SwinUMamba/LightSS2DMambaUNet/swt2net).

Channels-last Flax implementation. The 4 scan directions (row-major, column-major,
and their reverses) become K=4 groups of one batched selective-scan call, which the
Pallas kernel folds into its grid. Parameter initialization matches the reference:
S4D-real ``A = 1..N`` (stored as log), ``D = 1``, dt projection with
uniform(+-rank^-0.5) weight and inverse-softplus-distributed bias.

Backend selection: ``NNUZOO_SCAN_BACKEND`` env (pallas|xla|ref) or auto
(pallas on TPU).
"""

import math
import os
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cross_scan import cross_scan_fused
from ..ops.selective_scan import (selective_scan, selective_scan_blkd,
                                  selective_scan_packed)


def scan_backend() -> Optional[str]:
    return os.environ.get("NNUZOO_SCAN_BACKEND") or None


def packed_glue_mode(backend: Optional[str]) -> Optional[str]:
    """Lane-packed glue path selection (opt-in).

    Builds every kernel operand as a (B, L, K*Dh) / (B, L, K*2N) lane-compact
    tensor via direction-block-diagonal matmuls (for SS2D: exactly 128 lanes
    each), so the (B, L, K, Dh)/(B, L, K, N) intermediates of the legacy glue
    never materialize. Measured on-chip at the canonical stage-1 shape
    (b12 256x224 C=16) it is PAR WITH the legacy glue (fwd+bwd 124 vs 118 ms;
    the round-2 lane-packed B/C operands already removed the padding blowup,
    and the block-diagonal projections add MXU work), so it stays opt-in:
    NNUZOO_SS2D_PACKED: "1" enables on the pallas backend, "interpret" forces
    kernel interpret mode (CPU tests), unset/"0" disables."""
    env = os.environ.get("NNUZOO_SS2D_PACKED")
    if env == "interpret":
        return "interpret"
    if env != "1":
        return None
    eff = backend or ("pallas" if jax.devices()[0].platform == "tpu" else "xla")
    return "pallas" if eff == "pallas" else None


def fused_scan_mode() -> Optional[str]:
    """Fused cross-scan path selection. NNUZOO_SS2D_FUSED: "1" forces the
    Pallas kernels, "interpret" forces interpret mode (CPU tests), "0"/unset
    disables. Currently OPT-IN: the scan kernels are grid-overhead-bound on
    v5e (5k+ sequential chunk steps at canonical scale), so the two-launch
    fused variant measured SLOWER than the single legacy launch despite ~3x
    less HBM traffic (micro: 91 vs 64 ms fwd at stage-1 shape). Flips to
    default-on when the single-launch bidirectional variant wins."""
    env = os.environ.get("NNUZOO_SS2D_FUSED")
    if env == "interpret":
        return "interpret"
    if env == "1":
        return "pallas"
    return None


def centered_uniform(scale):
    """U(-scale, scale) initializer (param value == effective weight; the
    previous shift-after-param pattern broke pretrained weight transfer)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def dt_bias_init(dt_min=0.001, dt_max=0.1, dt_init_floor=1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(jax.random.uniform(key, shape, dtype) *
                     (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, dt_init_floor, None)
        return dt + jnp.log(-jnp.expm1(-dt))  # inverse softplus
    return init


def a_log_init(d_state):
    def init(key, shape, dtype=jnp.float32):
        # shape (..., d, n): S4D real init A = 1..N per channel
        n = shape[-1]
        a = jnp.arange(1, n + 1, dtype=dtype)
        return jnp.broadcast_to(jnp.log(a), shape)
    return init


class SS2D(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: Optional[int] = None  # default ceil(d_model/16)
    dropout: float = 0.0
    conv_bias: bool = True
    bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, H, W, d_model) -> same shape."""
        B, H, W, _ = x.shape
        d_inner = int(self.expand * self.d_model)
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        N = self.d_state
        K = 4
        L = H * W

        xz = nn.Dense(d_inner * 2, use_bias=self.bias, name="in_proj")(x)
        xpart, z = jnp.split(xz, 2, axis=-1)

        # depthwise conv + SiLU (channels-last)
        xc = nn.Conv(d_inner, (self.d_conv, self.d_conv), padding="SAME",
                     feature_group_count=d_inner, use_bias=self.conv_bias,
                     name="conv2d")(xpart)
        xc = nn.silu(xc)

        # the 2 traversal orders; dirs 2/3 are their reversals
        x_hw = xc.reshape(B, L, d_inner)
        x_wh = jnp.transpose(xc, (0, 2, 1, 3)).reshape(B, L, d_inner)

        x_proj_weight = self.param(
            "x_proj_weight", nn.initializers.normal(0.02),
            (K, dt_rank + 2 * N, d_inner))
        dt_std = dt_rank ** -0.5
        dt_projs_weight = self.param(
            "dt_projs_weight", centered_uniform(dt_std),
            (K, d_inner, dt_rank))
        dt_projs_bias = self.param("dt_projs_bias", dt_bias_init(), (K, d_inner))
        A_logs = self.param("A_logs", a_log_init(N), (K * d_inner, N))
        Ds = self.param("Ds", nn.initializers.ones, (K * d_inner,))
        A = -jnp.exp(A_logs.astype(jnp.float32))

        fused = fused_scan_mode()
        packed = packed_glue_mode(scan_backend()) if fused is None else None
        if packed is not None:
            # ---------------- lane-packed glue (TPU default) ----------------
            # Build every kernel operand in its EXACT lane-compact layout:
            #   xs_p (B, L, K*Dh): [hw | wh | rev(hw) | rev(wh)] lane blocks
            #   bc   (B, L, K*2N): per-direction [B_k | C_k] lane blocks
            #   dts  (B, L, K*Dh)
            # The direction axis lives in lanes, so the projections become
            # direction-block-diagonal matmuls (for SS2D d_inner=32, K=4,
            # N=16: 128x128 — one full MXU tile). The unpacked path's
            # (B, L, K, Dh)/(B, L, K, N) intermediates lane-pad 4-8x on every
            # stack/einsum/flip, which made the glue ~4x the kernel cost.
            from jax.scipy.linalg import block_diag
            xs2 = jnp.concatenate([x_hw, x_wh], axis=-1)           # (B,L,2D)
            xs_p = jnp.concatenate([xs2, jnp.flip(xs2, 1)], -1)    # (B,L,KD)
            wdt = x_proj_weight[:, :dt_rank, :]                    # (K,r,D)
            wbc = x_proj_weight[:, dt_rank:, :]                    # (K,2N,D)
            Wbc = block_diag(*[wbc[k].T for k in range(K)])        # (KD,K2N)
            Wr = block_diag(*[wdt[k].T for k in range(K)])         # (KD,Kr)
            Wdt = block_diag(*[dt_projs_weight[k].T
                               for k in range(K)])                 # (Kr,KD)
            cdt = xs_p.dtype
            bc = xs_p @ Wbc.astype(cdt)                            # (B,L,K2N)
            dts_p = (xs_p @ Wr.astype(cdt)) @ Wdt.astype(cdt)      # (B,L,KD)
            ys = selective_scan_packed(
                xs_p, dts_p, jnp.transpose(A, (1, 0)), bc, D=Ds,
                delta_bias=dt_projs_bias.reshape(-1), delta_softplus=True,
                interpret=packed == "interpret")                   # (B,L,KD)
            # merge directions: un-reverse, un-transpose, sum
            ysum2 = ys[..., :2 * d_inner] + jnp.flip(ys[..., 2 * d_inner:], 1)
            y = ysum2[..., :d_inner].reshape(B, H, W, d_inner) + \
                jnp.transpose(ysum2[..., d_inner:].reshape(B, W, H, d_inner),
                              (0, 2, 1, 3))
        elif fused is not None:
            # fused path: projections + softplus + scan + D-term in-kernel;
            # the reversed directions never materialize (mirrored traversal)
            kw = dict(backend="pallas", interpret=fused == "interpret")
            D2 = 2 * d_inner
            streams = (x_hw, x_wh)
            y_f = cross_scan_fused(
                streams, x_proj_weight[:2], dt_projs_weight[:2],
                dt_projs_bias[:2], A[:D2], Ds[:D2], reverse=False, **kw)
            y_r = cross_scan_fused(
                streams, x_proj_weight[2:], dt_projs_weight[2:],
                dt_projs_bias[2:], A[D2:], Ds[D2:], reverse=True, **kw)
            ys = y_f + y_r                          # (B, L, [hw | wh])
            y = ys[..., :d_inner].reshape(B, H, W, d_inner) + \
                jnp.transpose(ys[..., d_inner:].reshape(B, W, H, d_inner),
                              (0, 2, 1, 3))
        else:
            xs = jnp.stack([x_hw, x_wh, jnp.flip(x_hw, 1), jnp.flip(x_wh, 1)],
                           axis=2)
            x_dbl = jnp.einsum("blkd,kcd->blkc", xs, x_proj_weight)
            dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + N], axis=-1)
            dts = jnp.einsum("blkr,kdr->blkd", dts, dt_projs_weight)

            out_y = selective_scan_blkd(
                xs, dts, A, Bs, Cs, D=Ds, delta_bias=dt_projs_bias.reshape(-1),
                delta_softplus=True, backend=scan_backend())  # (B, L, K, D)

            # merge the 4 directions back into row-major order
            y_hw = out_y[:, :, 0]
            y_wh = out_y[:, :, 1]
            y_hw_rev = jnp.flip(out_y[:, :, 2], 1)
            y_wh_rev = jnp.flip(out_y[:, :, 3], 1)

            def wh_to_hw(y):  # (B, L[wh-order], D) -> (B, L[hw-order], D)
                return jnp.transpose(y.reshape(B, W, H, d_inner),
                                     (0, 2, 1, 3)).reshape(B, L, d_inner)

            y = y_hw + y_hw_rev + wh_to_hw(y_wh) + wh_to_hw(y_wh_rev)
            y = y.reshape(B, H, W, d_inner)
        y = nn.LayerNorm(name="out_norm")(y)
        y = y * nn.silu(z)
        out = nn.Dense(self.d_model, use_bias=self.bias, name="out_proj")(y)
        if self.dropout > 0 and train:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class VSSBlock(nn.Module):
    """LN -> SS2D -> DropPath -> residual (reference `m2net.py:515-535`:
    ``input + drop_path(self_attention(ln_1(input)))``)."""
    hidden_dim: int
    d_state: int = 16
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .layers import DropPath
        branch = SS2D(d_model=self.hidden_dim, d_state=self.d_state,
                      name="self_attention")(
            nn.LayerNorm(epsilon=1e-6, name="ln_1")(x), train=train)
        return x + DropPath(self.drop_path, name="drop_path")(
            branch, deterministic=not train)


class VSSLayer(nn.Module):
    """Stack of VSSBlocks; ``drop_path`` is either one rate for all blocks or a
    per-block tuple (the reference passes a linspace slice per layer)."""
    dim: int
    depth: int
    d_state: int = 16
    drop_path: Union[float, Tuple[float, ...]] = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.depth):
            dp = self.drop_path[i] if isinstance(self.drop_path, (tuple, list)) \
                else self.drop_path
            x = VSSBlock(self.dim, self.d_state, dp,
                         name=f"block{i}")(x, train=train)
        return x
