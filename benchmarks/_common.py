"""Shared benchmark setup: persistent XLA compile cache.

Remote compiles through the axon relay are the dominant cost of every
benchmark run on this rig (a trivial matmul program has been observed to take
minutes to HOURS to come back when the compile service is congested), so every
script enables the in-repo .jax_cache before touching jax. Must be imported
BEFORE jax initializes a backend.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def enable_compile_cache():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(REPO_ROOT, ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"# compile cache unavailable: {e}", file=sys.stderr)


if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
enable_compile_cache()
