"""Microbench: relative VPU cost of the scan kernel's primitive ops on-chip.

Times tiny Pallas kernels that apply OP n times over a resident VMEM tile, so
the per-op cost can be separated from DMA/launch overhead:

    cost(op) ~ (t(n=REPS_HI) - t(n=REPS_LO)) / (REPS_HI - REPS_LO)

Ops probed: mul, fma, exp, exp2, reciprocal, lane->sublane broadcast (the
`_unpack_bc_lanes` pattern), and a seq-16 sequential-subchunk scan step.

    python benchmarks/probe_vpu_ops.py
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, N, KD = 128, 16, 128
GRID = 256  # repeat over grid so timings are measurable


def bench(fn, args, reps=8):
    out = fn(*args)
    f = float(np.asarray(out).ravel()[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    f += float(np.asarray(out).ravel()[0])
    return (time.time() - t0) / reps * 1e3


def make(op, n):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        acc = x
        for _ in range(n):
            acc = op(acc, x)
        o_ref[...] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec((T, N, KD), lambda i: (0, 0, 0))],
            out_specs=pl.BlockSpec((T, N, KD), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, N, KD), jnp.float32),
        )(x)

    return run


OPS = {
    "mul": lambda a, x: a * x,
    "fma": lambda a, x: a * x + x,
    "exp": lambda a, x: jnp.exp(a * 1e-6),
    "exp2": lambda a, x: jnp.exp2(a * 1e-6),
    "recip": lambda a, x: pl.reciprocal(a, approx=False),
    "recip_approx": lambda a, x: pl.reciprocal(a, approx=True),
}


if __name__ == "__main__":
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(T, N, KD).astype(np.float32) + 0.5)
    lo, hi = 4, 20
    base = {}
    for name, op in OPS.items():
        t_lo = bench(make(op, lo), (x,))
        t_hi = bench(make(op, hi), (x,))
        per = (t_hi - t_lo) / (hi - lo) / GRID * 1e6  # us per op application
        print(f"{name:14s}: n={lo}: {t_lo:7.3f} ms  n={hi}: {t_hi:7.3f} ms  "
              f"-> {per:8.3f} us/apply ({per * 1e3 / (T * N * KD / 1024):.3f} "
              f"ns/8x128-vector)", flush=True)
