"""DP scaling bound from measured single-chip inputs (VERDICT r2 item
8). Writes SCALING_MODEL.json.

Data-parallel decode shards independent frames across chips; the hot
loop is communication-free by construction (parallel/batch.py), so the
only scaling losses are host-side: per-call dispatch and per-batch
host->device transfer, which one host must issue N_chips-per-host times
per device-step window. This script measures those inputs at the
production batch on the real chip and evaluates

    efficiency(N) = t_device / max(t_device, N * (t_dispatch + t_put))

per chips-per-host N (v5e hosts drive 4-8 chips; DP needs no ICI/DCN
traffic at all, so chips-per-host is the number that matters — adding
hosts multiplies capacity at constant efficiency).

Caveat recorded in the artifact: this environment reaches its single
chip through a network tunnel, so t_dispatch and t_put here are upper
bounds on a real pod host's local PCIe numbers.

Usage: python scripts/dp_scaling_model.py [--framebits N] [--batch N]
"""

import argparse
import json
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
    ap.add_argument("--out", type=str, default="SCALING_MODEL.json")
    args = ap.parse_args()

    import jax
    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_

    fb, B, it = args.framebits, args.batch, args.iters
    nsteps = fb + C.TAIL_BITS
    rng = np.random.default_rng(0)
    frames_u8 = rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.uint8)
    packed = ap_.pack_symbols_host(frames_u8)

    decode = jax.jit(lambda s: ap_.decode(s, fb, packed="bt"))
    dev_in = jax.device_put(packed)
    np.asarray(decode(dev_in))
    for _ in range(6):
        out = decode(dev_in)
    np.asarray(out)

    # t_device: steady-state device step (input resident)
    t0 = time.perf_counter()
    for _ in range(it):
        out = decode(dev_in)
    np.asarray(out)
    t_dev = (time.perf_counter() - t0) / it

    # t_dispatch: host cost to *enqueue* one call (async dispatch
    # returns before the device finishes; measure issue time alone,
    # then drain)
    t0 = time.perf_counter()
    outs = [decode(dev_in) for _ in range(it)]
    t_disp = (time.perf_counter() - t0) / it
    np.asarray(outs[-1])

    # t_put: host->device transfer of one packed batch
    t0 = time.perf_counter()
    for _ in range(it):
        d = jax.device_put(packed)
    d.block_until_ready()
    t_put = (time.perf_counter() - t0) / it

    nsym = B * C.RATE * nsteps
    rows = []
    for n in (1, 2, 4, 8, 16):
        host = n * (t_disp + t_put)
        eff = t_dev / max(t_dev, host)
        rows.append(dict(chips_per_host=n,
                         host_budget_ms=round(host * 1e3, 3),
                         efficiency=round(eff, 3),
                         agg_gsym_s=round(n * eff * nsym / t_dev / 1e9,
                                          2)))
    doc = dict(
        framebits=fb, batch=B, iters=it,
        t_device_ms=round(t_dev * 1e3, 3),
        t_dispatch_ms=round(t_disp * 1e3, 3),
        t_put_ms=round(t_put * 1e3, 3),
        single_chip_gsym_s=round(nsym / t_dev / 1e9, 3),
        model=rows,
        note=("efficiency(N)=t_dev/max(t_dev, N*(t_disp+t_put)) per "
              "host; DP decode has zero inter-chip communication, so "
              "multi-host scaling is flat at the per-host efficiency. "
              "t_disp/t_put measured through the axon tunnel = upper "
              "bounds on a pod host's local PCIe dispatch."))
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
