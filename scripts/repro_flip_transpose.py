"""Minimal reproducer for the XLA:TPU fused flip+transpose miscompile.

This backend deterministically returns WRONG DATA (no error) for the
fused ``flip(x, axis=1).transpose(1, 0, 2, 3)`` of an int32
[nblocks, 64, B, 64] tensor when B > 64; the same program is exact at
B <= 64 and on the CPU backend (round-4 on-chip finding; found because
``chainback_blocked``'s prolog used this op class and all earlier
parity cells ran at B <= 64 — docs/KERNELS.md "Round-4").

``viterbi_tpu.ops.traceback.chainback_blocked`` works around it with
``reverse=True`` scans over ``dynamic_index_in_dim`` (no flips, no 4D
transposes). This script pins the bug so the workaround can be retired
deliberately: run it on a fixed backend and the PASS line flips —
see ``tests/test_pallas.py::test_flip_transpose_backend_fence``
(xfail-on-TPU marker).

Usage:  python scripts/repro_flip_transpose.py   (on the real chip)
Prints PASS/FAIL per batch size and exits 1 if any batch miscompiles.
"""

import sys

import numpy as np


def fused_flip_transpose(x):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(t):
        # the exact prolog shape class chainback_blocked used to emit:
        # flip over the in-block step axis fused with the 4D transpose
        return jnp.flip(t, axis=1).transpose(1, 0, 2, 3)

    return np.asarray(f(x))


def check(batch: int, nblocks: int = 48) -> bool:
    """True iff the fused op matches the trivially-correct NumPy result."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 64, (nblocks, 64, batch, 64), dtype=np.int32)
    got = fused_flip_transpose(x)
    want = np.flip(x, axis=1).transpose(1, 0, 2, 3)
    return np.array_equal(got, want)


def main() -> int:
    import jax
    print(f"backend: {jax.devices()[0].platform} "
          f"({jax.devices()[0].device_kind if hasattr(jax.devices()[0], 'device_kind') else '?'})")
    bad = 0
    for batch in (64, 128, 256):
        ok = check(batch)
        print(f"B={batch:4d}: {'PASS' if ok else 'FAIL (miscompiled)'}")
        bad += not ok
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
