"""On-TPU parity artifact: every dispatchable decode variant, on the
real chip, against the golden scalar oracle — the reference's core test
mechanism (cross-implementation parity on identical noise,
viterbi-benchmark.cpp:296-329,369-402) executed on the production
backend, where interpret-mode tests cannot stand in for Mosaic
compilation. Writes PARITY_TPU.json.

Covers: Viterbi variants x bitrates {8..384} kbit/s on noisy 3 dB
frames (incl. the 9216-bit max frame), cross-variant equality on
identical noise, RS superframes with mixed/uncorrectable errors, RS
random fuzz, tail-biting wrap decode, EEP-punctured decode, and the
single-chip Pallas streaming path (compiled, not interpreted).

Usage: python scripts/tpu_parity.py [--quick]
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
    ap.add_argument("--quick", action="store_true",
                    help="fewer frames per cell (smoke run)")
    ap.add_argument("--out", type=str, default="PARITY_TPU.json")
    args = ap.parse_args()

    import jax
    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    from viterbi_tpu import constants as C, golden
    from viterbi_tpu.harness import channel
    from viterbi_tpu.ops import acs, acs_pallas, rs as rs_ops, tailbiting
    from viterbi_tpu.ops import traceback as tb
    from viterbi_tpu.models import dab, puncture as P

    dev = jax.devices()[0]
    assert dev.platform == "tpu", f"not a TPU: {dev}"
    doc = {"device": str(dev), "sections": {}, "ok": True}

    def record(section, **kw):
        doc["sections"][section] = kw
        bad = sum(v for k, v in kw.items() if k.startswith("mismatch"))
        if bad:
            doc["ok"] = False
        print(f"[{section}] {kw}", flush=True)

    # ---------------- Viterbi: variants x bitrates ----------------
    def decode_variant(variant, syms, framebits):
        syms = jnp.asarray(syms, jnp.int32)
        if variant == "pallas_fused":
            return np.asarray(acs_pallas.decode(syms, framebits))
        if variant == "pallas_fused_x6":
            return np.asarray(acs_pallas.decode(syms, framebits, geom="x6"))
        if variant == "pallas":
            dec, _ = acs_pallas.forward(syms, framebits + C.TAIL_BITS)
            return np.asarray(tb.chainback_blocked(dec, framebits, block=64))
        dec, _ = acs.forward(syms, framebits + C.TAIL_BITS)
        if variant == "jax_blocked":
            return np.asarray(tb.chainback_blocked(dec, framebits, block=64))
        return np.asarray(tb.chainback_scan(dec, framebits))

    variants = ["jax_scan", "jax_blocked", "pallas", "pallas_fused",
                "pallas_fused_x6"]
    bitrates = [8, 32, 64, 96, 128, 192, 384]
    vit_cells = []
    mism_frames = 0
    total_frames = 0
    for kbps in bitrates:
        framebits = 24 * kbps
        n = (8 if args.quick else
             64 if framebits <= 3072 else 16)
        bits, syms = channel.make_frames(n, framebits, seed=kbps)
        syms = syms.astype(np.int32)
        expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
        outs = {}
        for v in variants:
            t0 = time.time()
            try:
                out = decode_variant(v, syms, framebits)
            except Exception as e:
                record(f"viterbi/{v}/{kbps}kbps", error=repr(e),
                       mismatch_frames=n)
                mism_frames += n
                continue
            outs[v] = out
            bad = int((out != expect).any(axis=1).sum())
            mism_frames += bad
            total_frames += n
            vit_cells.append(dict(variant=v, kbps=kbps,
                                  framebits=framebits, frames=n,
                                  mismatch_frames=bad,
                                  secs=round(time.time() - t0, 1)))
            print(f"  viterbi {v} {kbps}kbps: {bad}/{n} mismatch",
                  flush=True)
        # reference-style cross-variant equality on identical noise
        vals = list(outs.values())
        cross_bad = sum(int(not np.array_equal(vals[0], o))
                        for o in vals[1:])
        if cross_bad:
            mism_frames += cross_bad
    record("viterbi", cells=vit_cells, frames=total_frames,
           mismatch_frames=mism_frames,
           note="each variant vs golden oracle + cross-variant equality "
                "on identical 3 dB noise")

    # ---------------- RS: superframes + fuzz ----------------
    rng = np.random.default_rng(1234)
    sf_bad = 0
    n_sf = 2 if args.quick else 8
    rs_dims = 16
    for sfi in range(n_sf):
        msgs = rng.integers(0, 256, (rs_dims, C.RS_KK), dtype=np.uint8)
        cws = np.stack([golden.rs_encode_codeword(m)
                        for m in msgs]).astype(np.int64)
        errs = rng.integers(0, 10, rs_dims)    # 0..9 errors (>5 = fail)
        if sfi % 2 == 0:
            errs = np.minimum(errs, 5)         # half the superframes clean
        for i, e in enumerate(errs):
            if e:
                pos = rng.choice(C.RS_N, e, replace=False)
                cws[i, pos] ^= rng.integers(1, 256, e)
        inter = cws.T.reshape(-1).astype(np.uint8)
        g_err, g_out = golden.rs_check_superframe(inter, rs_dims)
        errors, out, n_ok = rs_ops.rs_check_superframe(
            jnp.asarray(inter, jnp.int32), rs_dims)
        if int(errors) != g_err or not np.array_equal(np.asarray(out),
                                                      g_out):
            sf_bad += 1
    # random fuzz codewords (mostly uncorrectable)
    fuzz = rng.integers(0, 256, (64, C.RS_N)).astype(np.int64)
    count, corrected = rs_ops.rs_decode_blocks(jnp.asarray(fuzz, jnp.int32))
    count, corrected = np.asarray(count), np.asarray(corrected)
    fuzz_bad = 0
    for i in range(len(fuzz)):
        g_c, g_d = golden.rs_decode_codeword(fuzz[i])
        if count[i] != g_c or not np.array_equal(corrected[i], g_d):
            fuzz_bad += 1
    record("rs", superframes=n_sf, rs_dims=rs_dims,
           mismatch_superframes=sf_bad, fuzz_codewords=len(fuzz),
           mismatch_fuzz=fuzz_bad)

    # ---------------- tail-biting ----------------
    framebits = 768
    n = 4 if args.quick else 16
    bits = rng.integers(0, 2, (n, framebits), dtype=np.uint8)
    syms = np.stack([golden.hard_to_soft(golden.encode_tailbiting(b))
                     for b in bits]).astype(np.int32)
    expect = np.stack([golden.tailbiting_decode(framebits, s,
                                                wrap_steps=96)
                       for s in syms])
    out = np.asarray(tailbiting.decode_tailbiting(
        jnp.asarray(syms), framebits, wrap_steps=96, use_pallas=True))
    record("tailbiting", frames=n, framebits=framebits,
           mismatch_frames=int((out != expect).any(axis=1).sum()))

    # ---------------- EEP punctured decode ----------------
    kbps, level, prof = 128, 3, "A"
    framebits = 24 * kbps
    n = 4 if args.quick else 16
    bits, mother = channel.make_frames(n, framebits, seed=77)
    mask = P.frame_mask(kbps, level, prof)
    received = np.stack([P.puncture(m, mask) for m in mother])
    expect = np.stack([golden.deconvolve(framebits, P.depuncture(m, mask))
                       for m in received])
    out = np.asarray(dab.decode_punctured_frames(
        jnp.asarray(received.astype(np.int32)), kbps, level, prof,
        use_pallas=True))
    record("punctured", frames=n, profile=f"EEP-{prof} level {level} "
           f"{kbps}kbps",
           mismatch_frames=int((out != expect).any(axis=1).sum()))

    # ---------------- single-chip Pallas streaming (compiled) --------
    from viterbi_tpu.parallel import mesh as mesh_mod, streaming
    stream_bits = 6144
    n = 4 if args.quick else 16
    bits, syms = channel.make_frames(n, stream_bits, seed=9)
    syms = syms.astype(np.int32)
    expect = np.stack([golden.deconvolve(stream_bits, s) for s in syms])
    mesh = mesh_mod.make_mesh(n_data=1, n_seq=1,
                              devices=jax.devices()[:1])
    out = np.asarray(streaming.decode_stream(syms, stream_bits, mesh,
                                             use_pallas=True))
    record("streaming_1chip", frames=n, stream_bits=stream_bits,
           mismatch_frames=int((out != expect).any(axis=1).sum()))

    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}  ok={doc['ok']}")
    return 0 if doc["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
