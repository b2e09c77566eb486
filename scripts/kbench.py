"""Kernel micro-benchmark: times forward_regs / traceback variants on the
real chip to guide optimization. Not part of the test suite.

Timing notes: outputs returned from a jitted call are fetched through the
device tunnel, so fwd-only timings slice the big checkpoint array down to
a [64,128] tile on device before returning — otherwise the ~268 MB regs
transfer dominates and the number is meaningless.

Usage: python scripts/kbench.py [--framebits N] [--batch N] [--iters N]
                                [--only SUBSTR]
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
    import jax.numpy as jnp
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_, traceback as tb

    fb, B = args.framebits, args.batch
    nsteps = fb + C.TAIL_BITS
    rng = np.random.default_rng(0)
    syms_np = rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.int32)
    packed_np = ap_.pack_symbols_host(syms_np)
    syms_bt = jnp.asarray(packed_np)                    # [B, nsteps]
    nsym = B * C.RATE * nsteps

    def report(name, dt):
        print(f"{name:44s} {dt*1e3:8.3f} ms   {nsym/dt/1e9:7.2f} Gsym/s",
              flush=True)

    def run(name, fn, *a):
        if args.only and args.only not in name:
            return
        report(name, timeit(fn, *a, iters=args.iters))

    configs = []
    for bt in (256, 512, 1024):
        for mxu in (True, False):
            configs.append((f"fwd mxu={int(mxu)} bt={bt}", dict(
                b_tile=bt, mxu=mxu)))
    for bt in (256, 512):
        configs.append((f"fwd mxu=1 f32 bt={bt}", dict(
            b_tile=bt, mxu=True, metric_dtype=jnp.float32)))
    for name, kw in configs:
        # slice the outputs on device: only a [64,128] tile is fetched
        f = jax.jit(lambda s, kw=kw: jax.tree.map(
            lambda x: x[..., :128][:64],
            ap_.forward_regs(s, nsteps, packed="bt", **kw)))
        run(name, f, syms_bt)

    ckpt = ap_.choose_ckpt(nsteps)
    fwd = jax.jit(lambda s: ap_.forward_regs(s, nsteps, packed="bt"))
    regs, _ = fwd(syms_bt)
    regs = jax.block_until_ready(regs)
    for bt in (256, 512, 1024):
        t = jax.jit(lambda r, bt=bt: tb.chainback_regs_pallas(
            r, fb, ckpt=ckpt, b_tile=bt)[:128, :])
        run(f"tb walk bt={bt}", t, regs)
    e2e = jax.jit(lambda s: ap_.decode(s, fb, packed="bt")[:128, :])
    run("e2e decode", e2e, syms_bt)


if __name__ == "__main__":
    main()
