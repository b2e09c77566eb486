"""Geometry shoot-out: 3-phase CG (transpose resets) vs 6-phase
exchange-form CG (no resets) on the real chip. Not part of the test
suite.

Usage: python scripts/kgeom.py [--framebits N] [--batch N] [--iters N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from benchutil import setup_jax_cache, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--framebits", type=int, default=3072)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    jax = setup_jax_cache()
    import jax.numpy as jnp  # noqa: F401
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_

    fb, B = args.framebits, args.batch
    nsteps = fb + C.TAIL_BITS
    rng = np.random.default_rng(0)
    syms_np = rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.int32)
    syms_bt = jnp.asarray(ap_.pack_symbols_host(syms_np))
    nsym = B * C.RATE * nsteps

    def report(name, dt):
        print(f"{name:44s} {dt*1e3:8.3f} ms   {nsym/dt/1e9:7.2f} Gsym/s",
              flush=True)

    def run(name, fn, *a):
        if args.only and args.only not in name:
            return
        try:
            report(name, timeit(fn, *a, iters=args.iters))
        except Exception as e:
            print(f"{name:44s} FAILED: {type(e).__name__}: {e}", flush=True)

    configs = [("cg3 fwd", dict())]
    for mode in ("stack", "roll"):
        configs.append((f"x6/{mode} fwd", dict(geom="x6", xch_mode=mode)))
    for bt in (512, 1024):
        for name, kw in configs:
            f = jax.jit(lambda s, kw=kw, bt=bt: jax.tree.map(
                lambda x: x[..., :128][:64],
                ap_.forward_regs(s, nsteps, packed="bt", b_tile=bt, **kw)))
            run(f"{name} bt={bt}", f, syms_bt)

    for name, kw in configs:
        e = jax.jit(lambda s, kw=kw: ap_.decode(
            s, fb, packed="bt", **kw)[:128, :])
        run(f"{name.replace(' fwd', '')} e2e", e, syms_bt)


if __name__ == "__main__":
    main()
