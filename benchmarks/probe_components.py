"""On-chip decomposition of the canonical M2NetP step: time each component at
its canonical shape (b12 @ 256x224) to locate the residual non-roofline time.

Run on the TPU:  python benchmarks/probe_components.py [reps]

Each row: component, fwd ms, fwd+bwd ms. All timings fence with a scalar
fetch (block_until_ready is a no-op under the axon relay).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=8):
    import jax
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())  # compile + fence
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    return (time.time() - t0) / reps * 1e3


def run(name, module, x_shape, reps, train=False, bf16=True, wrap=None):
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*x_shape).astype(np.float32))
    if bf16:
        x = x.astype(jnp.bfloat16)
    params = jax.jit(module.init, static_argnums=2)(
        jax.random.PRNGKey(0), x, False) if wrap == "train_arg" else \
        jax.jit(module.init)(jax.random.PRNGKey(0), x)
    if bf16:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)

    def fwd(p, x):
        out = module.apply(p, x, train) if wrap == "train_arg" else \
            module.apply(p, x)
        return jax.tree.leaves(out)[0]

    def loss(p, x):
        return jnp.sum(fwd(p, x).astype(jnp.float32) ** 2)

    f_ms = bench(jax.jit(fwd), (params, x), reps)
    fb_ms = bench(jax.jit(jax.grad(loss)), (params, x), reps)
    print(f"{name:45s} fwd {f_ms:8.2f} ms   fwd+bwd {fb_ms:8.2f} ms",
          flush=True)
    return f_ms, fb_ms


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from nnuzoo_tpu.models.ss2d import SS2D, VSSLayer
    from nnuzoo_tpu.models.u2net import REBNCONV
    from nnuzoo_tpu.models.vssm import MU, PatchMerging2D

    B, H, W = 12, 256, 224
    print(f"canonical shapes: b{B} {H}x{W}; reps={reps}", flush=True)

    # raw packed kernel at stage-1 scan shape
    from nnuzoo_tpu.ops.selective_scan import selective_scan_packed
    L, KD, N = H * W, 128, 16
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(B, L, KD).astype(np.float32)).astype(jnp.bfloat16)
    dt = jnp.asarray(rng.rand(B, L, KD).astype(np.float32))
    A_t = -jnp.asarray(rng.rand(N, KD).astype(np.float32))
    bc = jnp.asarray(rng.randn(B, L, 2 * N * 4).astype(np.float32)).astype(
        jnp.bfloat16)
    D = jnp.ones((KD,), jnp.float32)

    def scan_fwd(u, dt, bc):
        return selective_scan_packed(u, dt, A_t, bc, D=D)

    def scan_loss(u, dt, bc):
        return jnp.sum(scan_fwd(u, dt, bc).astype(jnp.float32) ** 2)

    f = bench(jax.jit(scan_fwd), (u, dt, bc), reps)
    fb = bench(jax.jit(jax.grad(scan_loss, argnums=(0, 1, 2))), (u, dt, bc),
               reps)
    print(f"{'scan kernel (L=57344, KD=128, N=16)':45s} fwd {f:8.2f} ms   "
          f"fwd+bwd {fb:8.2f} ms", flush=True)

    run("SS2D(16) @ full res (packed glue)", SS2D(d_model=16),
        (B, H, W, 16), reps, wrap="train_arg")
    import os
    os.environ["NNUZOO_SS2D_PACKED"] = "0"
    run("SS2D(16) @ full res (legacy glue)", SS2D(d_model=16),
        (B, H, W, 16), reps, wrap="train_arg")
    del os.environ["NNUZOO_SS2D_PACKED"]

    run("VSSLayer(16, depth1) @ full res", VSSLayer(16, 1, 16, (0.0,)),
        (B, H, W, 16), reps, wrap="train_arg")
    run("REBNCONV(64) @ full res (C=1 in)", REBNCONV(64, 1, 2),
        (B, H, W, 1), reps)
    run("REBNCONV(64) @ full res (C=64 in)", REBNCONV(64, 1, 2),
        (B, H, W, 64), reps)
    run("PatchMerging2D(16) @ full res", PatchMerging2D(16, 2, 16),
        (B, H, W, 16), reps)

    run("MU(1,16,64,7) stage1 (no remat)", MU(1, 16, 64, 7),
        (B, H, W, 1), reps, wrap="train_arg")

    # rematted stage1, as the canonical model trains it
    policy = jax.checkpoint_policies.save_only_these_names(
        "scan_y", "scan_carries")
    MUr = nn.remat(MU, static_argnums=(2,), policy=policy)
    run("MU(1,16,64,7) stage1 (remat)", MUr(1, 16, 64, 7),
        (B, H, W, 1), reps, wrap="train_arg")


if __name__ == "__main__":
    main()
