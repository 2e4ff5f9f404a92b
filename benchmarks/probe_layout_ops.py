"""Hunt residual small-channel layout pathologies at canonical shapes.

Round-3's component probe showed PatchMerging2D(16) at 11.2 ms and
REBNCONV(64) at ~7 ms fwd — both ~20-30x over their HBM-roofline cost at
(12, 256, 224, C). This probe times each suspicious op AND alternative
formulations of the same math, to pick TPU-friendly forms:

- PatchMerging2D space-to-depth: strided slices+concat (current) vs
  reshape-transpose vs stride-2 conv with a fixed permutation kernel.
- PatchExpand depth-to-space: dense+reshape-transpose (current).
- REBNCONV: conv / norm / relu breakdown.
- The SS2D glue pieces: in_proj dense, dw-conv, LayerNorm, the wh transpose.

Run on the TPU:  python benchmarks/probe_layout_ops.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import flax.linen as nn


def bench(fn, args, reps=8):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())  # compile + fence
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    return (time.time() - t0) / reps * 1e3


def run_fn(name, fn, args, reps):
    def loss(*a):
        return jnp.sum(fn(*a).astype(jnp.float32) ** 2)

    f = bench(jax.jit(fn), args, reps)
    fb = bench(jax.jit(jax.grad(loss, argnums=0)), args, reps)
    print(f"{name:52s} fwd {f:8.2f} ms   fwd+bwd {fb:8.2f} ms", flush=True)


def run_mod(name, module, x_shape, reps, bf16=True):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*x_shape).astype(np.float32))
    if bf16:
        x = x.astype(jnp.bfloat16)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    if bf16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)

    def fwd(p, x):
        return jax.tree.leaves(module.apply(p, x))[0]

    def loss(p, x):
        return jnp.sum(fwd(p, x).astype(jnp.float32) ** 2)

    f = bench(jax.jit(fwd), (params, x), reps)
    fb = bench(jax.jit(jax.grad(loss)), (params, x), reps)
    print(f"{name:52s} fwd {f:8.2f} ms   fwd+bwd {fb:8.2f} ms", flush=True)


# ---------------------------------------------------------- s2d formulations
def s2d_slices(x):
    """Current PatchMerging2D gather: 4 strided slices + concat,
    reference order (0,0),(1,0),(0,1),(1,1)."""
    parts = [x[:, 0::2, 0::2, :], x[:, 1::2, 0::2, :],
             x[:, 0::2, 1::2, :], x[:, 1::2, 1::2, :]]
    return jnp.concatenate(parts, -1)


def s2d_reshape(x):
    """reshape-transpose form, same block order (index = dx*2 + dy)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = jnp.transpose(x, (0, 1, 3, 4, 2, 5))          # (B,H2,W2,dx,dy,C)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def make_s2d_conv(C):
    """stride-2 conv with a fixed 0/1 kernel implementing the same gather."""
    w = np.zeros((2, 2, C, 4 * C), np.float32)
    for dy in range(2):
        for dx in range(2):
            blk = dx * 2 + dy
            for c in range(C):
                w[dy, dx, c, blk * C + c] = 1.0
    w = jnp.asarray(w)

    def f(x):
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return f


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B, H, W = 12, 256, 224
    rng = np.random.RandomState(0)

    for C in (16, 64):
        x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32)
                        ).astype(jnp.bfloat16)
        run_fn(f"s2d slices+concat (C={C})", s2d_slices, (x,), reps)
        run_fn(f"s2d reshape-transpose (C={C})", s2d_reshape, (x,), reps)
        run_fn(f"s2d fixed-kernel conv (C={C})", make_s2d_conv(C), (x,), reps)

    from nnuzoo_tpu.models.vssm import PatchExpand, PatchMerging2D
    run_mod("PatchMerging2D(16->16) full module", PatchMerging2D(16, 2, 16),
            (B, H, W, 16), reps)
    run_mod("PatchMerging2D(64->64) full module", PatchMerging2D(64, 2, 64),
            (B, H, W, 64), reps)
    run_mod("PatchExpand(16) @ half res", PatchExpand(16, 2, output_dim=16),
            (B, H // 2, W // 2, 16), reps)

    # REBNCONV breakdown at C=64
    x64 = jnp.asarray(rng.rand(B, H, W, 64).astype(np.float32)
                      ).astype(jnp.bfloat16)
    run_mod("conv3x3(64->64) alone", nn.Conv(64, (3, 3), padding="SAME"),
            (B, H, W, 64), reps)
    run_mod("conv3x3(1->64) alone", nn.Conv(64, (3, 3), padding="SAME"),
            (B, H, W, 1), reps)
    run_mod("GroupNorm(gs=1, C=64) alone",
            nn.GroupNorm(num_groups=None, group_size=1, epsilon=1e-5),
            (B, H, W, 64), reps)
    run_fn("relu (C=64)", jax.nn.relu, (x64,), reps)

    from nnuzoo_tpu.models.u2net import REBNCONV
    run_mod("REBNCONV(64) full (C=64 in)", REBNCONV(64, 1, 2),
            (B, H, W, 64), reps)

    # SS2D glue pieces at stage-1 scale (d_model=16, d_inner=32)
    x16 = jnp.asarray(rng.rand(B, H, W, 16).astype(np.float32)
                      ).astype(jnp.bfloat16)
    run_mod("in_proj Dense(16->64)", nn.Dense(64), (B, H, W, 16), reps)
    run_mod("dwconv3x3(32) + silu",
            nn.Conv(32, (3, 3), padding="SAME", feature_group_count=32),
            (B, H, W, 32), reps)
    run_mod("LayerNorm(C=32)", nn.LayerNorm(), (B, H, W, 32), reps)

    def wh_transpose(x):
        return jnp.transpose(x, (0, 2, 1, 3))
    x32 = jnp.asarray(rng.rand(B, H, W, 32).astype(np.float32)
                      ).astype(jnp.bfloat16)
    run_fn("wh transpose (C=32)", wh_transpose, (x32,), reps)
    run_fn("flip L (B,L,128)", lambda a: jnp.flip(a, 1),
           (x32.reshape(B, H * W, 32 * 1).astype(jnp.bfloat16)
            .reshape(B, H * W, 32),), reps)

    from nnuzoo_tpu.models.layers import max_pool
    run_fn("max_pool 2x2 (C=64)", lambda a: max_pool(a, 2, 2), (x64,), reps)

    from nnuzoo_tpu.models.layers import resize_linear
    run_fn("resize_linear x2 (C=64, half->full)",
           lambda a: resize_linear(a, (H, W), 2),
           (jnp.asarray(rng.rand(B, H // 2, W // 2, 64).astype(np.float32)
                        ).astype(jnp.bfloat16),), reps)


if __name__ == "__main__":
    main()
