"""DCE-safety check for bench.py's sliced-fetch timing (VERDICT r2
weak #7): bench times `jit(lambda s: decode(s)[:128])` to avoid
fetching the whole output through the tunnel; this asserts XLA does not
push the slice through the decode to shrink the actual work for the
XLA (non-Pallas) variants.

Method: time full-output fetch-to-host vs sliced fetch at the same
shape; the sliced version must not be faster than the full one by more
than the fetch-size difference can explain — checked loosely as
"sliced >= 0.7 * full device time" with the fetch excluded via a tiny
on-device reduction instead of a slice.

Usage: python scripts/dce_check.py [--framebits N] [--batch N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: F401

from benchutil import setup_jax_cache, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--framebits", type=int, default=3072)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    jax = setup_jax_cache()
    import jax.numpy as jnp
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs, traceback

    fb, B = args.framebits, args.batch
    nsteps = fb + C.TAIL_BITS
    rng = np.random.default_rng(0)
    syms = jnp.asarray(rng.integers(0, 256, (B, C.RATE * nsteps),
                                    dtype=np.int32))

    def decode(s):
        decisions, _ = acs.forward(s, nsteps)
        return traceback.chainback_blocked(decisions, fb, block=64)

    # the bench's sliced form vs a reduction that provably consumes
    # every output element (cannot be sliced away)
    sliced = jax.jit(lambda s: decode(s)[:128])
    reduced = jax.jit(lambda s: decode(s).astype(jnp.int32).sum())

    t_sliced = timeit(sliced, syms, iters=20, warmup=5)
    t_reduced = timeit(reduced, syms, iters=20, warmup=5)
    ratio = t_sliced / t_reduced
    ok = ratio >= 0.7
    print(f"jax_blocked fb={fb} B={B}: sliced {t_sliced*1e3:.2f} ms, "
          f"full-consume {t_reduced*1e3:.2f} ms, ratio {ratio:.3f} "
          f"-> {'OK: slice does not shrink the work' if ok else 'DCE SUSPECT'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
