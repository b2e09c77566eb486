"""Device-resident per-bitrate speed ladder (complement to
HARNESS_TPU.json, whose API-path times are tunnel-transfer-bound in
this environment). Symbols live on device; steady-state decode time
per DAB bitrate on the Pallas fast path. Writes LADDER_TPU.json.

The reference's "ideal" expectation is time ∝ framebits
(viterbi-benchmark.cpp:16-24); the artifact records the per-framebit
time ratio across the ladder to check it.

Usage: python scripts/ladder_bench.py [--batch N] [--iters N]
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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--out", type=str, default="LADDER_TPU.json")
    args = ap.parse_args()

    jax = setup_jax_cache()
    import jax.numpy as jnp
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_

    B, it = args.batch, args.iters
    rng = np.random.default_rng(0)
    rows = []
    for kbps in (32, 64, 96, 128, 192, 384):
        fb = 24 * kbps
        nsteps = fb + C.TAIL_BITS
        syms = jnp.asarray(ap_.pack_symbols_host(
            rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.uint8)
            .astype(np.int32)))
        f = jax.jit(lambda s, fb=fb: ap_.decode(s, fb,
                                                packed="bt")[:128, :])
        dt = timeit(f, syms, iters=it, warmup=8)
        nsym = B * C.RATE * nsteps
        rows.append(dict(kbps=kbps, framebits=fb,
                         ms_per_batch=round(dt * 1e3, 3),
                         gsym_s=round(nsym / dt / 1e9, 2),
                         us_per_kframebit=round(dt / fb * 1e9, 2)))
        print(rows[-1], flush=True)

    per_fb = [r["us_per_kframebit"] for r in rows]
    doc = dict(batch=B, iters=it, variant="pallas_fused",
               rows=rows,
               time_per_framebit_ratio_maxmin=round(max(per_fb)
                                                    / min(per_fb), 3),
               note=("device-resident symbols (packed 1 byte/symbol); "
                     "steady-state; complements HARNESS_TPU.json whose "
                     "API-path ladder re-transfers buffers per call"))
    with open(args.out, "w") as f2:
        json.dump(doc, f2, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
