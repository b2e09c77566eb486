"""Device-resident per-bitrate speed ladder (complement to
HARNESS_TPU.json, whose API-path times are tunnel-transfer-bound in
this environment). Symbols live on device; steady-state decode time
per DAB bitrate on the Pallas fast path. Writes LADDER_TPU.json.

The reference's "ideal" expectation is time ∝ framebits
(viterbi-benchmark.cpp:16-24); the artifact records the per-framebit
time ratio across the ladder to check it — at two batch sizes, because
the round-4 attribution (scripts/kladder_probe.py --overhead) showed
the small-frame sag is mostly a FIXED per-call cost (~2.4-3.0 ms on
this tunneled chip: sync + fetch round-trip), not kernel inefficiency:
amortization improves with batch, and the fitted asymptotic rates are
12.0 (fb 768) vs 13.65 (fb 3072/9216) Gsym/s.

Usage: python scripts/ladder_bench.py [--batches 8192,32768] [--iters N]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from benchutil import setup_jax_cache, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8192,32768")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", type=str, default="LADDER_TPU.json")
    args = ap.parse_args()

    jax = setup_jax_cache()
    import jax.numpy as jnp
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_

    it = args.iters
    rng = np.random.default_rng(0)
    ladders = {}
    for B in (int(b) for b in args.batches.split(",")):
        rows = []
        for kbps in (32, 64, 96, 128, 192, 384):
            fb = 24 * kbps
            nsteps = fb + C.TAIL_BITS
            syms = jnp.asarray(ap_.pack_symbols_host(
                rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.uint8)
                .astype(np.int32)))
            f = jax.jit(lambda s, fb=fb: ap_.decode(s, fb,
                                                    packed="bt")[:128, :])
            dt = min(timeit(f, syms, iters=max(8, it // 3), warmup=4)
                     for _ in range(3))
            nsym = B * C.RATE * nsteps
            pad, ckpt, chunk = ap_.choose_layout(nsteps)
            rows.append(dict(kbps=kbps, framebits=fb,
                             layout=dict(front_pad=pad, ckpt=ckpt,
                                         time_chunk=chunk),
                             ms_per_batch=round(dt * 1e3, 3),
                             gsym_s=round(nsym / dt / 1e9, 2),
                             us_per_kframebit=round(dt / fb * 1e9, 2)))
            print(B, rows[-1], flush=True)
        per_fb = [r["us_per_kframebit"] for r in rows]
        ladders[str(B)] = dict(
            rows=rows,
            time_per_framebit_ratio_maxmin=round(max(per_fb)
                                                 / min(per_fb), 3))
    doc = dict(iters=it, variant="pallas_fused", ladders=ladders,
               note=("device-resident symbols (packed 1 byte/symbol); "
                     "steady-state, min of 3 interleaved rounds; the "
                     "residual small-frame sag at fixed batch is the "
                     "fixed per-call cost (~2.4-3 ms on this tunneled "
                     "chip, measured by kladder_probe --overhead), which "
                     "amortizes with batch; kernel-level layouts chosen "
                     "by acs_pallas.choose_layout (round 4)"))
    with open(args.out, "w") as f2:
        json.dump(doc, f2, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
