"""Forward-kernel ablation: times surgically disabled variants of the
constant-geometry register-exchange kernel to locate the hot spots.
Results are WRONG numerically (pieces are disabled) — timing only.
Not part of the test suite.

Usage: python scripts/kablate.py [--framebits N] [--batch N] [--iters N]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--framebits", type=int, default=3072)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bt", type=int, default=512)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_

    fb, B, bt = args.framebits, args.batch, args.bt
    nsteps = fb + C.TAIL_BITS
    ckpt = ap_.choose_ckpt(nsteps)
    time_chunk = ap_._choose_time_chunk(nsteps, ckpt)
    rng = np.random.default_rng(0)
    syms_np = rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.int32)
    syms_bt = jnp.asarray(ap_.pack_symbols_host(syms_np))
    nsym = B * C.RATE * nsteps

    def _sync(out):
        np.asarray(jax.tree.leaves(out)[0])

    def timeit(fn, *a, iters=args.iters, warmup=8):
        out = fn(*a); _sync(out)
        for _ in range(warmup):
            out = fn(*a)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        _sync(out)
        return (time.perf_counter() - t0) / iters

    def report(name, dt):
        print(f"{name:36s} {dt*1e3:8.3f} ms   {nsym/dt/1e9:7.2f} Gsym/s",
              flush=True)

    # ------------------------------------------------------------------
    # parameterized copy of _kernel_regs_cg with ablation switches
    # ------------------------------------------------------------------
    def kernel(abl, sym_ref, init_ref, reg_ref, met_ref, metrics, regs):
        Bk = metrics.shape[1]
        mdt = jnp.int32

        @pl.when(pl.program_id(1) == 0)
        def _():
            metrics[:] = init_ref[:]
            regs[:] = jnp.zeros_like(regs)

        c255 = jnp.asarray(255, mdt)
        c63 = jnp.asarray(63, mdt)
        zero = jnp.asarray(0, mdt)

        def masks_for_phase(phase):
            k = 5 - phase
            S = 1 << k
            r = jax.lax.broadcasted_iota(jnp.int32, (32, 1), 0)
            j = ((r >> k) << (k + 1)) | (r & (S - 1))
            b = ((j << phase) | (j >> (6 - phase))) & 63
            return [(((jax.lax.population_count((b << 1) & int(C.POLYS[q]))
                       & 1) * 255).astype(mdt)) for q in range(4)]

        xmasks = [masks_for_phase(p) for p in range(3)]

        def split(M, phase):
            k = 5 - phase
            S = 1 << k
            G = 32 // S
            Mr = M.reshape(G, 2, S, Bk)
            return Mr[:, 0].reshape(32, Bk), Mr[:, 1].reshape(32, Bk)

        def merge(lo, hi, phase):
            if "nomerge" in abl:
                return jnp.concatenate([lo, hi], axis=0)
            k = 5 - phase
            S = 1 << k
            G = 32 // S
            return jnp.stack([lo.reshape(G, S, Bk), hi.reshape(G, S, Bk)],
                             axis=1).reshape(64, Bk)

        def reset(M):
            if "noreset" in abl:
                return M
            return M.reshape(8, 8, Bk).transpose(1, 0, 2).reshape(64, Bk)

        def one_step(t, phase, mv, rv):
            srow = sym_ref[pl.ds(t, 1)][0]
            sq = [((srow >> (8 * q)) & 255).astype(mdt) for q in range(4)]
            xm = xmasks[phase]
            a = [jnp.broadcast_to(sq[q], (32, Bk)) ^ xm[q] for q in range(4)]
            avg = lambda x, y: (x + y + 1) >> 1
            m = (avg(avg(a[0], a[1]), avg(a[2], a[3])) >> 2) & c63
            if "nobm" in abl:
                m = jnp.broadcast_to(sq[0], (32, Bk))
            cm = c63 - m
            lo, hi = split(mv, phase)
            if "nosat" in abl:
                sat = lambda x: x
            else:
                sat = lambda x: jnp.minimum(x, c255)
            p0e, p1e = sat(lo + m), sat(hi + cm)
            p0o, p1o = sat(lo + cm), sat(hi + m)
            new = merge(jnp.minimum(p0e, p1e), jnp.minimum(p0o, p1o), phase)
            if "noreg" in abl:
                return new, rv
            dec_e = p1e <= p0e
            dec_o = p1o <= p0o
            rlo, rhi = split(rv, phase)
            if "staticbit" in abl:
                # defer shifts: insert this step's bit at a static
                # position, shift the window by 6 once per reset
                pos = 5 - (3 * (t % 6 >= 3) + phase)
                reg_e = jnp.where(dec_e, rhi, rlo)
                reg_o = jnp.where(dec_o, rhi, rlo) | (1 << pos)
            else:
                reg_e = jnp.where(dec_e, rhi, rlo) << 1
                reg_o = (jnp.where(dec_o, rhi, rlo) << 1) | 1
            new_regs = merge(reg_e, reg_o, phase)
            return new, new_regs

        def six(i, carry):
            mcur, rcur = carry
            t0 = 6 * i
            for half in range(2):
                for phase in range(3):
                    t = t0 + 3 * half + phase
                    mcur, rcur = one_step(t, phase, mcur, rcur)
                    if "norenorm" not in abl and (3 * half + phase) % 2 == 1:
                        sub = jnp.where(
                            mcur[0:1, :] > C.RENORMALIZE_THRESHOLD, c63,
                            zero)
                        mcur = jnp.maximum(mcur - sub, zero)
                mcur = reset(mcur)
                rcur = reset(rcur) if "noreg" not in abl else rcur
            if "staticbit" in abl and "noreg" not in abl:
                rcur = rcur << 6

            @pl.when((t0 + 6) % ckpt == 0)
            def _():
                reg_ref[pl.ds((t0 + 6) // ckpt - 1, 1)] = rcur[None]
            return mcur, rcur

        mfin, rfin = jax.lax.fori_loop(0, time_chunk // 6, six,
                                       (metrics[:], regs[:]))
        metrics[:] = mfin
        regs[:] = rfin
        met_ref[:] = mfin

    def forward(abl, symbols):
        Bv = symbols.shape[0]
        Bp = ((Bv + bt - 1) // bt) * bt
        nbt = Bp // bt
        nchunks = nsteps // time_chunk
        ncheck = nsteps // ckpt
        syms = symbols.T[:, None, :]
        row = jax.lax.broadcasted_iota(jnp.int32, (64, Bp), 0)
        init = jnp.where(row == 0, 0, 63)
        cpb = time_chunk // ckpt
        regs, fmet = pl.pallas_call(
            functools.partial(kernel, abl),
            grid=(nbt, nchunks),
            in_specs=[
                pl.BlockSpec((time_chunk, 1, bt), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, bt), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((cpb, 64, bt), lambda i, j: (j, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((64, bt), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ncheck, 64, Bp), jnp.int32),
                jax.ShapeDtypeStruct((64, Bp), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((64, bt), jnp.int32),
                            pltpu.VMEM((64, bt), jnp.int32)],
        )(syms, init)
        return regs[..., :128][:2], fmet[..., :128]

    variants = [
        ("full", ()),
        ("staticbit", ("staticbit",)),
        ("no reg-exchange", ("noreg",)),
        ("no merge", ("nomerge",)),
        ("no reset", ("noreset",)),
        ("no renorm", ("norenorm",)),
        ("no sat", ("nosat",)),
        ("no branch metrics", ("nobm",)),
        ("bare ACS", ("noreg", "nomerge", "noreset", "norenorm",
                      "nosat", "nobm")),
    ]
    for name, abl in variants:
        if args.only and args.only not in name:
            continue
        f = jax.jit(functools.partial(forward, frozenset(abl)))
        report(name, timeit(f, syms_bt))


if __name__ == "__main__":
    main()
