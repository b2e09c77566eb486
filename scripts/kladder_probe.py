"""Attribute the per-bitrate ladder sag (VERDICT r3 weak #1 / next #3).

LADDER_TPU.json shows 9.57 Gsym/s at framebits 768 vs 13.31 at 9216.
Hypothesis: shapes whose nsteps/ckpt block count is PRIME force
``_choose_time_chunk`` down to time_chunk == ckpt (774/18 = 43 chunks,
2328/24 = 97, 4632/24 = 193 — vs 19 chunks at 3072 and 55 at 9216), so
the Mosaic grid pays its per-chunk overhead (epilogue/prologue, revisit
ramp) 2-10x more often per trellis step.

This probe races (front_pad, ckpt, time_chunk) layout candidates for
the sagging framebits on the real chip, interleaved in one process
(tunnel measurement discipline). The winner becomes decode()'s layout
choice; the numbers go to docs/KERNELS.md either way.

Usage: python scripts/kladder_probe.py [--batch 8192] [--iters 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from benchutil import setup_jax_cache, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--only", type=int, default=None,
                    help="probe a single framebits value")
    ap.add_argument("--overhead", action="store_true",
                    help="fit t(B) = c_fixed + B*c per framebits to "
                         "attribute the sag to per-call overhead")
    args = ap.parse_args()

    jax = setup_jax_cache()
    import jax.numpy as jnp
    from viterbi_tpu import constants as C, golden
    from viterbi_tpu.ops import acs_pallas as ap_, traceback as tb

    B, it = args.batch, args.iters
    rng = np.random.default_rng(0)

    # candidates per framebits: (pad, ckpt, time_chunk); pad makes
    # nsteps_p = nsteps + pad, and time_chunk must divide nsteps_p
    CAND = {
        768:  [(0, 18, 18),      # current: 43 chunks (prime blocks)
               (18, 18, 198),    # 792: 4 chunks
               (18, 18, 72),     # 792: 11 chunks
               (18, 24, 72),     # 792: 11 chunks, shorter walk
               (18, 24, 24)],    # 792: 33 chunks (isolate chunk size)
        2304: [(18, 24, 24),     # current: 97 chunks (prime blocks)
               (30, 18, 180),    # 2340: 13 chunks
               (42, 24, 168),    # 2352: 14 chunks
               (42, 24, 48)],    # 2352: 49 chunks
        4608: [(18, 24, 24),     # current: 193 chunks (prime blocks)
               (66, 18, 180),    # 4680: 26 chunks
               (90, 24, 168),    # 4704: 28 chunks
               (42, 24, 48)],    # 4656: 97 chunks
        9216: [(18, 24, 168),    # current: 55 chunks (the fast anchor)
               (18, 24, 120)],   # 77 chunks
    }

    def run(fb, pad, ckpt, chunk, syms_packed):
        nsteps = fb + C.TAIL_BITS

        def decode(s):
            regs, _ = ap_.forward_regs(
                s, nsteps, ckpt=ckpt, front_pad=pad, time_chunk=chunk,
                packed="bt")
            return tb.chainback_regs_pallas(regs, fb, ckpt=ckpt,
                                            offset=pad)
        f = jax.jit(lambda s: decode(s)[:128])
        # correctness spot-check before timing: reuse the timed jit and
        # fetch only 4 frames (a full-batch fetch costs a multi-MB
        # tunnel round-trip per candidate)
        out = np.asarray(f(syms_packed))[:4]
        return f, out

    if args.overhead:
        # Attribute: is the small-frame sag per-CALL overhead (fixed
        # cost per dispatched program) rather than per-step kernel
        # inefficiency? Fit t(B) = c_fixed + B*c at each framebits on
        # the CURRENT decode() layout, B in {4096, 8192, 16384, 32768}.
        for fb in (768, 3072, 9216):
            nsteps = fb + C.TAIL_BITS
            pts = []
            for Bx in (4096, 8192, 16384, 32768):
                raw = rng.integers(0, 256, (Bx, C.RATE * nsteps),
                                   dtype=np.int64).astype(np.int32)
                syms = jnp.asarray(ap_.pack_symbols_host(raw))
                f = jax.jit(lambda s, fb=fb: ap_.decode(
                    s, fb, packed="bt")[:128])
                dt = min(timeit(f, syms, iters=max(5, it // 3),
                                warmup=3) for _ in range(3))
                pts.append((Bx, dt))
                print(f"fb={fb:5d} B={Bx:6d}: {dt * 1e3:8.3f} ms  "
                      f"{Bx * C.RATE * nsteps / dt / 1e9:6.2f} Gsym/s",
                      flush=True)
            # least-squares fit over the measured points
            Bs = np.array([p[0] for p in pts], dtype=float)
            ts = np.array([p[1] for p in pts])
            c, c_fixed = np.polyfit(Bs, ts, 1)
            print(f"fb={fb:5d}: c_fixed={c_fixed * 1e3:.3f} ms, "
                  f"per-frame={c * 1e6:.3f} us, asymptotic "
                  f"{C.RATE * nsteps / c / 1e9:.2f} Gsym/s", flush=True)
        return

    for fb, cands in CAND.items():
        if args.only and fb != args.only:
            continue
        nsteps = fb + C.TAIL_BITS
        raw = rng.integers(0, 256, (B, C.RATE * nsteps),
                           dtype=np.int64).astype(np.int32)
        expect = np.stack([golden.deconvolve(fb, s) for s in raw[:4]])
        syms = jnp.asarray(ap_.pack_symbols_host(raw))
        nsym = B * C.RATE * nsteps
        fns = []
        for pad, ckpt, chunk in cands:
            npad = nsteps + pad
            assert npad % ckpt == 0 and npad % chunk == 0 \
                and chunk % ckpt == 0, (fb, pad, ckpt, chunk)
            f, out = run(fb, pad, ckpt, chunk, syms)
            ok = np.array_equal(out, expect)
            fns.append((pad, ckpt, chunk, f, ok))
        # interleave timing rounds (tunnel discipline: compare within
        # one process, alternating)
        times = {i: [] for i in range(len(fns))}
        for _round in range(3):
            for i, (pad, ckpt, chunk, f, ok) in enumerate(fns):
                times[i].append(timeit(f, syms, iters=max(5, it // 3),
                                       warmup=3))
        for i, (pad, ckpt, chunk, f, ok) in enumerate(fns):
            dt = min(times[i])
            nchunks = (nsteps + pad) // chunk
            print(f"fb={fb:5d} pad={pad:3d} ckpt={ckpt} chunk={chunk:4d} "
                  f"({nchunks:3d} chunks): {dt * 1e3:7.3f} ms  "
                  f"{nsym / dt / 1e9:6.2f} Gsym/s  exact={ok}",
                  flush=True)


if __name__ == "__main__":
    main()
