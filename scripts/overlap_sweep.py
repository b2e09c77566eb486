"""Overlap sweep: measures streaming-vs-whole-stream mismatch rate as a
function of the block-overlap length and channel SNR, justifying
DEFAULT_OVERLAP (parallel/streaming.py). Writes OVERLAP_SWEEP.json.

The block-overlapped decoder's only approximation is traceback
truncation: each device anchors its walk at the best-metric state
``overlap`` steps past its own block and discards the overlap bits
(SURVEY.md §7.3 last bullet). The sweep decodes identical noisy streams
both ways and counts differing frames/bits per (overlap, Eb/N0) cell —
including SNRs far below the DAB operating point, where survivor paths
merge slowest and truncation error is largest.

Runs on the virtual CPU mesh (the truncation mechanism is in the
sharded orchestration, identical for the XLA and Pallas kernels — both
paths share the anchored-walk logic; the XLA path sweeps fast enough
to get real statistics).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/overlap_sweep.py [--block-bits 3072] [--batch 64]
                                    [--seeds 2] [--n-seq 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OVERLAPS = [8, 16, 24, 36, 48, 70, 96, 120]
EBN0_DB = [3.0, 1.5, 0.0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-bits", type=int, default=3072,
                    help="data bits per device (production: 3072)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--n-seq", type=int, default=8)
    ap.add_argument("--out", type=str, default="OVERLAP_SWEEP.json")
    args = ap.parse_args()

    import jax
    # sitecustomize pre-imports jax on the axon platform; env vars are
    # too late — flip the live config (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", max(args.n_seq, 8))
    import jax.numpy as jnp  # noqa: F401
    from viterbi_tpu import constants as C
    from viterbi_tpu.harness import channel
    from viterbi_tpu.ops import acs, traceback as tb
    from viterbi_tpu.parallel import mesh as mesh_mod, streaming

    n_seq = args.n_seq
    assert len(jax.devices()) >= n_seq
    stream_bits = args.block_bits * n_seq
    B = args.batch
    mesh = mesh_mod.make_mesh(n_data=1, n_seq=n_seq,
                              devices=jax.devices()[:n_seq])

    @jax.jit
    def whole(syms):
        decisions, _ = acs.forward(syms, stream_bits + C.TAIL_BITS)
        return tb.chainback_blocked(decisions, stream_bits, block=64)

    cells = []
    for ebn0 in EBN0_DB:
        for seed in range(args.seeds):
            _, syms = channel.make_frames(B, stream_bits, seed=seed,
                                          ebn0_db=ebn0)
            syms = jnp.asarray(syms.astype(np.int32))
            ref = np.asarray(whole(syms))

            def cell(overlap, warmup, tag):
                t0 = time.time()
                out = np.asarray(streaming.decode_stream(
                    syms, stream_bits, mesh, overlap=overlap,
                    use_pallas=False, warmup=warmup))
                dbits = int(np.unpackbits(out ^ ref).sum())
                dframes = int((out != ref).any(axis=1).sum())
                cells.append(dict(ebn0_db=ebn0, seed=seed, overlap=overlap,
                                  warmup=warmup, frames=B,
                                  stream_bits=stream_bits,
                                  mismatch_bits=dbits,
                                  mismatch_frames=dframes,
                                  secs=round(time.time() - t0, 1)))
                print(f"ebn0={ebn0} seed={seed} {tag}: "
                      f"{dframes}/{B} frames, {dbits} bits differ",
                      flush=True)

            for overlap in OVERLAPS:
                cell(overlap, streaming.WARMUP_STEPS,
                     f"overlap={overlap}")
            # warmup axis at the default overlap: boundary-metric
            # estimation error vs pass-1 length
            for warmup in (16, 32, 64, 256):
                cell(streaming.DEFAULT_OVERLAP, warmup,
                     f"warmup={warmup}")

    # aggregate per (ebn0, overlap, warmup)
    agg = {}
    for c in cells:
        k = (c["ebn0_db"], c["overlap"], c["warmup"])
        a = agg.setdefault(k, dict(frames=0, mismatch_bits=0,
                                   mismatch_frames=0))
        a["frames"] += c["frames"]
        a["mismatch_bits"] += c["mismatch_bits"]
        a["mismatch_frames"] += c["mismatch_frames"]
    summary = [dict(ebn0_db=k[0], overlap=k[1], warmup=k[2], **v)
               for k, v in sorted(agg.items())]
    doc = dict(
        note=("streaming (block-overlapped, anchored truncation) vs "
              "whole-stream decode on identical noise; XLA path, "
              f"{n_seq}-device virtual mesh, {args.block_bits} data "
              "bits/device. mismatch_frames counts frames with any "
              "differing bit."),
        n_seq=n_seq, block_bits=args.block_bits, batch=B,
        seeds=args.seeds, default_overlap=streaming.DEFAULT_OVERLAP,
        summary=summary, cells=cells)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
