"""Shared benchmarking helpers for the scripts/ kernel tools.

Centralizes the timing methodology so a fix (e.g. the
np.asarray-forces-completion trick for tunneled platforms, where
block_until_ready does not reliably block) applies everywhere at once.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def setup_jax_cache():
    """Enable the persistent compilation cache; returns the jax module."""
    import jax
    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    return jax


def sync(out):
    """Force completion via a host fetch of a small leaf
    (block_until_ready does not reliably block on tunneled platforms)."""
    import jax
    np.asarray(jax.tree.leaves(out)[0])


def timeit(fn, *args, iters=30, warmup=8):
    """Steady-state seconds per call (compile + warmup excluded)."""
    out = fn(*args)
    sync(out)
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters
