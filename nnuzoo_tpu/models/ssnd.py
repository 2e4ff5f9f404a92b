"""SSND: the SS2D cross-scan generalized to N dimensions (reference:
`nnunetv2/nets/ssnd2net.py:73-302`).

2D: K=4 directions (row-major, transposed, + flips). 3D: K=6 (zhw, wzh, hwz
axis rotations + flips). Note: the reference's 3D merge re-uses direction index 1
for the hwz branch (`ssnd2net.py:292-296`), an apparent indexing slip; we merge
each direction with its own output, which is the evident intent.
"""

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.selective_scan import selective_scan_blkd
from .ss2d import a_log_init, dt_bias_init, scan_backend


class SSND(nn.Module):
    d_model: int
    spatial_dims: int = 3
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dt_rank: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: (B, *spatial, d_model) -> same shape. spatial is (H, W) or (Z, H, W)."""
        dim = self.spatial_dims
        spatial = x.shape[1:-1]
        B = x.shape[0]
        L = int(jnp.prod(jnp.array(spatial))) if False else int(
            math.prod(spatial))
        d_inner = int(self.expand * self.d_model)
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)
        N = self.d_state
        K = 2 * dim

        xz = nn.Dense(d_inner * 2, use_bias=False, name="in_proj")(x)
        xpart, z = jnp.split(xz, 2, axis=-1)
        xc = nn.Conv(d_inner, (self.d_conv,) * dim, padding="SAME",
                     feature_group_count=d_inner, name="conv")(xpart)
        xc = nn.silu(xc)

        # axis orders: 2D -> (h,w), (w,h); 3D -> (z,h,w), (w,z,h), (h,w,z)
        if dim == 2:
            orders = [(0, 1), (1, 0)]
        else:
            orders = [(0, 1, 2), (2, 0, 1), (1, 2, 0)]

        seqs = []
        for order in orders:
            perm = (0,) + tuple(o + 1 for o in order) + (dim + 1,)
            seqs.append(jnp.transpose(xc, perm).reshape(B, L, d_inner))

        x_proj_weight = self.param("x_proj_weight", nn.initializers.normal(0.02),
                                   (K, dt_rank + 2 * N, d_inner))
        from .ss2d import centered_uniform, fused_scan_mode
        dt_std = dt_rank ** -0.5
        dt_w = self.param("dt_projs_weight", centered_uniform(dt_std),
                          (K, d_inner, dt_rank))
        dt_b = self.param("dt_projs_bias", dt_bias_init(), (K, d_inner))
        A_logs = self.param("A_logs", a_log_init(N), (K * d_inner, N))
        Ds = self.param("Ds", nn.initializers.ones, (K * d_inner,))
        A = -jnp.exp(A_logs.astype(jnp.float32))

        fused = fused_scan_mode()
        if fused is not None:
            from ..ops.cross_scan import cross_scan_fused
            kw = dict(backend="pallas", interpret=fused == "interpret")
            GD = dim * d_inner
            y_f = cross_scan_fused(tuple(seqs), x_proj_weight[:dim],
                                   dt_w[:dim], dt_b[:dim], A[:GD], Ds[:GD],
                                   reverse=False, **kw)
            y_r = cross_scan_fused(tuple(seqs), x_proj_weight[dim:],
                                   dt_w[dim:], dt_b[dim:], A[GD:], Ds[GD:],
                                   reverse=True, **kw)
            ys = y_f + y_r                         # (B, L, dim*D), unflipped
            dir_ys = [ys[..., g * d_inner:(g + 1) * d_inner]
                      for g in range(dim)]
        else:
            fwd = jnp.stack(seqs, 2)                       # (B, L, dim, D)
            xs = jnp.concatenate([fwd, jnp.flip(fwd, 1)], 2)  # (B, L, K, D)
            x_dbl = jnp.einsum("blkd,kcd->blkc", xs, x_proj_weight)
            dts, Bs, Cs = jnp.split(x_dbl, [dt_rank, dt_rank + N], -1)
            dts = jnp.einsum("blkr,kdr->blkd", dts, dt_w)

            out_y = selective_scan_blkd(
                xs, dts, A, Bs, Cs, D=Ds, delta_bias=dt_b.reshape(-1),
                delta_softplus=True, backend=scan_backend())  # (B, L, K, D)
            dir_ys = [out_y[:, :, k] + jnp.flip(out_y[:, :, k + dim], 1)
                      for k in range(dim)]

        # merge: un-permute each axis order back to (z)hw
        y = 0
        for k, order in enumerate(orders):
            inv = [0] * dim
            for i, o in enumerate(order):
                inv[o] = i
            permuted_spatial = tuple(spatial[o] for o in order)
            yk = dir_ys[k].reshape(B, *permuted_spatial, d_inner)
            perm_back = (0,) + tuple(1 + inv[i] for i in range(dim)) + \
                (dim + 1,)
            y = y + jnp.transpose(yk, perm_back).reshape(B, L, d_inner)

        y = y.reshape(B, *spatial, d_inner)
        y = nn.LayerNorm(name="out_norm")(y)
        y = y * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)
