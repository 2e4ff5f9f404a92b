"""A/B the scan-kernel config knobs on hardware at the canonical stage-1 shape.

Round-4 made the MXU-unpack fwd/bwd kernels (NNUZOO_SCAN_MXU=1) + exp2 decay
math the DEFAULT path without an on-chip measurement (VERDICT r4, Weak #2).
This script times fwd and fwd+bwd through the public packed entry for each
config in a fresh subprocess (the knobs are read at trace time), prints a
table, and exits 0.  Run:

    python benchmarks/ab_scan_defaults.py            # orchestrate all configs
    python benchmarks/ab_scan_defaults.py --worker   # one config (env-driven)
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _common  # noqa: F401,E402  (persistent compile cache)

# canonical M2NetP stage-1 scan shape: b12 @ 256x224, K=4, Dh=32, N=16
B, L, K, Dh, N = 12, 256 * 224, 4, 32, 16
KD = K * Dh

CONFIGS = [
    ("mxu (r4 default)", {"NNUZOO_SCAN_MXU": "1"}),
    ("2pass (r3 default)", {"NNUZOO_SCAN_MXU": "0", "NNUZOO_SCAN_BWD": "2pass"}),
    ("fused bwd", {"NNUZOO_SCAN_MXU": "0", "NNUZOO_SCAN_BWD": "fused"}),
]


def worker():
    import jax
    import jax.numpy as jnp
    import importlib
    ss = importlib.import_module("nnuzoo_tpu.ops.selective_scan")

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(B, L, KD).astype(np.float32), jnp.bfloat16)
    delta = jnp.asarray(rng.rand(B, L, KD).astype(np.float32))
    A_t = jnp.asarray(-np.exp(rng.rand(N, KD).astype(np.float32)))
    bc = jnp.asarray(rng.randn(B, L, K * 2 * N).astype(np.float32), jnp.bfloat16)

    fwd = jax.jit(lambda *a: ss.selective_scan_packed(*a, delta_softplus=True))

    def loss(u, delta, A_t, bc):
        return ss.selective_scan_packed(u, delta, A_t, bc,
                                        delta_softplus=True).sum()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))

    def bench(fn, reps=8, rounds=3):
        out = fn(u, delta, A_t, bc)
        f = float(jax.tree_util.tree_leaves(out)[0].sum())  # fence
        times = []
        for _ in range(rounds):
            t0 = time.time()
            for _ in range(reps):
                out = fn(u, delta, A_t, bc)
            f += float(jax.tree_util.tree_leaves(out)[0].sum())
            times.append((time.time() - t0) / reps * 1e3)
        return float(np.median(times))

    print(json.dumps({"fwd_ms": bench(fwd), "fwdbwd_ms": bench(grad)}),
          flush=True)


def main():
    rows = []
    for name, env in CONFIGS:
        e = dict(os.environ, **env)
        p = subprocess.run([sys.executable, __file__, "--worker"], env=e,
                           capture_output=True, text=True, timeout=900)
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"{name:22s}  FAILED\n{p.stderr[-2000:]}")
            continue
        r = json.loads(line[-1])
        rows.append((name, r["fwd_ms"], r["fwdbwd_ms"]))
        print(f"{name:22s}  fwd {r['fwd_ms']:7.2f} ms   "
              f"fwd+bwd {r['fwdbwd_ms']:7.2f} ms", flush=True)
    if rows:
        best = min(rows, key=lambda r: r[2])
        print(f"\nbest fwd+bwd: {best[0]}")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
