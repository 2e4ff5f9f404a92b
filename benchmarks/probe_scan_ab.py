"""Interleaved A/B timing of scan-kernel configurations.

The axon relay's run-to-run noise reaches 2x, so single-shot timings cannot
rank kernel variants. This probe compiles every requested configuration first,
then interleaves timed rounds A,B,A,B,... and reports per-config medians.

    python benchmarks/probe_scan_ab.py SEQ:CHUNK [SEQ:CHUNK ...] [--reps N]
                                       [--rounds M] [--bwd]

Example:  python benchmarks/probe_scan_ab.py 16:128 32:128 --bwd
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def fence(out):
    # device-side scalar sum: never pull full arrays through the relay
    return float(jax.tree_util.tree_leaves(out)[0].sum())


def timed(fn, args, reps):
    fence(fn(*args))  # drain queue
    t0 = time.time()
    out = None
    for _ in range(reps):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / reps * 1e3


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 8
    rounds = 5
    do_bwd = "--bwd" in sys.argv
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
        if a == "--rounds":
            rounds = int(sys.argv[i + 1])
    configs = []
    for a in args:
        if ":" in a and not a.startswith("--") and a[0].isdigit():
            parts = a.split(":")
            seq, chunk = int(parts[0]), int(parts[1])
            bwd = parts[2] if len(parts) > 2 else "fused"
            configs.append((seq, chunk, bwd))
    if not configs:
        configs = [(16, 128, "fused"), (16, 128, "2pass")]

    B, L, K, Dh, N = 12, 256 * 224, 4, 32, 16
    KD = K * Dh
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(B, L, KD).astype(np.float32)).astype(jnp.bfloat16)
    dt = jnp.asarray(rng.rand(B, L, KD).astype(np.float32) * 0.5)
    bc = jnp.asarray(rng.randn(B, L, 2 * K * N).astype(np.float32)
                     ).astype(jnp.bfloat16)
    A_t = -jnp.exp(jnp.asarray(rng.rand(N, KD).astype(np.float32)))
    D = jnp.asarray(rng.randn(KD).astype(np.float32))

    fns = {}
    for seq, chunk, bwd_mode in configs:
        os.environ["NNUZOO_SCAN_SEQ"] = str(seq)
        os.environ["NNUZOO_SCAN_CHUNK"] = str(chunk)
        os.environ["NNUZOO_SCAN_BWD"] = bwd_mode
        # fresh module copy per config (env is read at trace time inside the
        # kernel body, so re-tracing under the env is enough; jit caches key
        # on the function object, so make distinct wrappers).
        # NB: `import nnuzoo_tpu.ops.selective_scan as ss` resolves to the
        # FUNCTION re-exported by ops/__init__ (attribute shadowing).
        import importlib
        ss = importlib.import_module("nnuzoo_tpu.ops.selective_scan")

        def make(ss=ss):
            def fwd(u, dt, bc):
                return ss.selective_scan_packed(u, dt, A_t, bc, D=D)

            def loss(u, dt, bc):
                return jnp.sum(fwd(u, dt, bc).astype(jnp.float32) ** 2)

            return (jax.jit(fwd),
                    jax.jit(jax.grad(loss, argnums=(0, 1, 2))))

        fwd_j, bwd_j = make()
        label = f"seq{seq}:chunk{chunk}:{bwd_mode}"
        t0 = time.time()
        try:
            fence(fwd_j(u, dt, bc))
            if do_bwd:
                fence(bwd_j(u, dt, bc))
        except Exception as e:
            print(f"{label}: COMPILE FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            continue
        print(f"{label}: compiled in {time.time() - t0:.0f}s", flush=True)
        fns[label] = (fwd_j, bwd_j)

    results = {k: {"fwd": [], "bwd": []} for k in fns}
    for r in range(rounds):
        for label, (fwd_j, bwd_j) in fns.items():
            results[label]["fwd"].append(timed(fwd_j, (u, dt, bc), reps))
            if do_bwd:
                results[label]["bwd"].append(timed(bwd_j, (u, dt, bc), reps))
        print(f"round {r}: " + "  ".join(
            f"{l} fwd {results[l]['fwd'][-1]:7.2f}" +
            (f" bwd {results[l]['bwd'][-1]:7.2f}" if do_bwd else "")
            for l in fns), flush=True)

    print("\nmedians:", flush=True)
    for label in fns:
        f = float(np.median(results[label]["fwd"]))
        msg = f"{label}: fwd {f:7.2f} ms"
        if do_bwd:
            msg += f"   fwd+bwd {float(np.median(results[label]['bwd'])):7.2f} ms"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
