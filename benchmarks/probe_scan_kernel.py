"""Scan-kernel microbench at the canonical stage-1 shape.

Times `selective_scan_packed` fwd and fwd+bwd on the chip for a list of chunk
sizes (NNUZOO_SCAN_CHUNK values), to separate per-element VPU work from
per-chunk grid/DMA overhead. Timings fence with scalar fetches (the axon relay
makes block_until_ready a no-op).

    python benchmarks/probe_scan_kernel.py [chunk ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=8):
    # fence with a device-side scalar sum: np.asarray(out) would pull the
    # full (B, L, KD) array through the axon relay (~100x timing inflation)
    out = fn(*args)
    f = float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    f += float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.time() - t0) / reps * 1e3


if __name__ == "__main__":
    chunks = [int(a) for a in sys.argv[1:]] or [128, 256, 512]
    import jax
    import jax.numpy as jnp
    import importlib

    # stage-1 SS2D shape: B=12, L=256*224, K=4, Dh=32, N=16 -> KD=128 lanes
    B, L, K, Dh, N = 12, 256 * 224, 4, 32, 16
    KD = K * Dh
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(B, L, KD).astype(np.float32)).astype(jnp.bfloat16)
    dt = jnp.asarray(rng.rand(B, L, KD).astype(np.float32) * 0.5)
    bc = jnp.asarray(rng.randn(B, L, 2 * K * N).astype(np.float32)
                     ).astype(jnp.bfloat16)
    A_t = -jnp.exp(jnp.asarray(rng.rand(N, KD).astype(np.float32)))
    D = jnp.asarray(rng.randn(KD).astype(np.float32))

    for c in chunks:
        os.environ["NNUZOO_SCAN_CHUNK"] = str(c)
        ss = importlib.import_module("nnuzoo_tpu.ops.selective_scan")

        def fwd(u, dt, bc):
            return ss.selective_scan_packed(u, dt, A_t, bc, D=D)

        def loss(u, dt, bc):
            return jnp.sum(fwd(u, dt, bc).astype(jnp.float32) ** 2)

        try:
            tf = bench(jax.jit(fwd), (u, dt, bc))
            tb = bench(jax.jit(jax.grad(loss, argnums=(0, 1, 2))), (u, dt, bc))
            print(f"chunk {c:4d}: fwd {tf:7.2f} ms   fwd+bwd {tb:7.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"chunk {c:4d}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
