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
            if framebits % 24 == 0:   # the shipped rung's fast walk (r5)
                return np.asarray(tb.chainback_words_pallas(dec, framebits))
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

    # ------------- checkpoint-layout classes (compiled Mosaic) -------
    # Every decode() layout class that previously ran on TPU only for
    # DAB-shaped framebits (VERDICT r3 missing #2): non-CG natural-ckpt
    # kernel (8 -> nsteps 14, 64 -> 70, 224 -> 230), front-pad reset
    # boundary (96 -> 102, 168 -> 174), natural CG ckpt (744 -> 750).
    # Interpret mode proved insufficient for exactly this class of
    # kernel (the round-3 tie-break bug).
    lay_cells = []
    lay_bad = 0
    rngl = np.random.default_rng(55)
    for framebits in (8, 64, 96, 168, 224, 744):
        n = 8 if args.quick else 32
        nsteps = framebits + C.TAIL_BITS
        syms = rngl.integers(0, 256, (n, 4 * nsteps),
                             dtype=np.int64).astype(np.int32)
        expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
        out = np.asarray(acs_pallas.decode(jnp.asarray(syms), framebits))
        bad = int((out != expect).any(axis=1).sum())
        lay_bad += bad
        lay_cells.append(dict(framebits=framebits, frames=n,
                              mismatch_frames=bad))
        print(f"  layout fb={framebits}: {bad}/{n} mismatch", flush=True)
    record("layout_classes", cells=lay_cells, mismatch_frames=lay_bad,
           note="non-CG kernel, front-pad boundary, odd natural ckpt — "
                "compiled on chip, vs golden")

    # ---------------- packed 'bt' ingestion (compiled) ----------------
    pk_bad = 0
    pk_frames = 0
    for kbps in (32, 128):
        framebits = 24 * kbps
        n = 8 if args.quick else 32
        _, syms = channel.make_frames(n, framebits, seed=300 + kbps)
        syms = syms.astype(np.int32)
        expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
        packed = acs_pallas.pack_symbols_host(syms)
        out = np.asarray(acs_pallas.decode(jnp.asarray(packed), framebits,
                                           packed="bt"))
        pk_bad += int((out != expect).any(axis=1).sum())
        pk_frames += n
    record("packed_bt", frames=pk_frames, mismatch_frames=pk_bad,
           note="host-packed 1-byte/symbol bt layout (the bench.py "
                "ingest path), compiled, vs golden")

    # ----------- large-batch fallback variants (regression) -----------
    # Round 4 found this backend deterministically MISCOMPILES the fused
    # 4D flip+transpose in the old chainback_blocked for B > 64 (and the
    # materialized predecessor maps hit HBM capacity at 9216x4096);
    # traceback.py now uses reverse scans over packed decision words.
    # Lock both fixes with compiled large-batch cells.
    lb_bad = 0
    for fb_lb, B_lb in ((3072, 1024), (9216, 512)):
        rng_lb = np.random.default_rng(fb_lb)
        syms = rng_lb.integers(0, 256, (B_lb, 4 * (fb_lb + 6)),
                               dtype=np.int64).astype(np.int32)
        expect = np.stack([golden.deconvolve(fb_lb, s) for s in syms[:4]])
        dec, _ = acs_pallas.forward(jnp.asarray(syms), fb_lb + 6)
        out = np.asarray(tb.chainback_blocked(dec, fb_lb, block=64))
        lb_bad += int(not np.array_equal(out[:4], expect))
        dec2, _ = acs.forward(jnp.asarray(syms[:B_lb // 2]), fb_lb + 6)
        out2 = np.asarray(tb.chainback_blocked(dec2, fb_lb, block=64))
        # round-5: the decision-word Pallas walk at full production
        # batch (the shipped `pallas` rung traceback) — same lesson as
        # the flip+transpose find: test compiled at the real batch
        out3 = np.asarray(tb.chainback_words_pallas(dec, fb_lb))
        cell_bad = (int(not np.array_equal(out[:4], expect))
                    + int(not np.array_equal(out2[:4], expect))
                    + int(not np.array_equal(out3[:4], expect)))
        lb_bad += (int(not np.array_equal(out2[:4], expect))
                   + int(not np.array_equal(out3[:4], expect)))
        print(f"  large-batch fb={fb_lb} B={B_lb}: "
              f"{'ok' if cell_bad == 0 else 'MISMATCH'}", flush=True)
    record("large_batch_blocked", mismatch_cells=lb_bad,
           note="pallas/jax decisions + blocked AND decision-word-walk "
                "tracebacks at B in {512..1024} — guards the round-4 "
                "flip+transpose miscompile fix and the round-5 rung "
                "walks at production batches")

    # ------- chained DAB+ superframe pipeline vs golden composition ----
    kbps = 96
    cfgB = 2 if args.quick else 8
    fb = 24 * kbps
    rs_dims = kbps // 8
    rngs = np.random.default_rng(400)
    audio_in = rngs.integers(0, 256, (cfgB, rs_dims, C.RS_KK),
                             dtype=np.uint8)
    sf_syms = np.empty((cfgB, 5, C.RATE * (fb + C.TAIL_BITS)),
                       dtype=np.int32)
    g_audio = np.empty((cfgB, rs_dims * C.RS_KK), dtype=np.uint8)
    g_errors = np.empty(cfgB, dtype=np.int64)
    for b in range(cfgB):
        cws = np.stack([golden.rs_encode_codeword(m)
                        for m in audio_in[b]]).astype(np.int64)
        errs = rngs.integers(0, 5, rs_dims)
        for i, e in enumerate(errs):
            if e:
                pos = rngs.choice(C.RS_N, e, replace=False)
                cws[i, pos] ^= rngs.integers(1, 256, e)
        sf_bytes = cws.T.reshape(-1).astype(np.uint8)   # interleaved
        frame_bits = np.unpackbits(sf_bytes).reshape(5, fb)
        for f in range(5):
            hard = golden.encode(frame_bits[f])
            sf_syms[b, f] = channel.awgn_soft_symbols(hard, rngs)
        # golden composition: per-frame deconvolve -> superframe -> RS
        dec_bytes = np.concatenate(
            [golden.deconvolve(fb, sf_syms[b, f]) for f in range(5)])
        g_errors[b], g_out = golden.rs_check_superframe(dec_bytes, rs_dims)
        g_audio[b] = g_out
    audio, errors = dab.decode_audio_superframes(
        jnp.asarray(sf_syms), kbps, use_pallas=True)
    audio, errors = np.asarray(audio), np.asarray(errors)
    sf_mm = int((errors != g_errors).sum())
    sf_mm += sum(int(not np.array_equal(audio[b], g_audio[b]))
                 for b in range(cfgB) if g_errors[b] != -1)
    record("superframe_chain", superframes=cfgB, kbps=kbps,
           rs_dims=rs_dims, mismatch_superframes=sf_mm,
           note="jittable deconvolve->RS chain (models/dab.py) vs the "
                "golden per-frame composition, noisy 3 dB frames + "
                "injected RS byte errors")

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

    # ------- arbitrary framebits via the public API (round 5) --------
    # The reference accepts ANY framebits (chainback.inc partial-byte
    # contract); api.deconvolve now matches — verify the compiled
    # off-grid path on chip vs golden, incl. odd sizes.
    import viterbi_tpu as api_pkg
    api_pkg.initialize()
    arb_cells = []
    arb_bad = 0
    for fb_a in (1, 7, 9, 50, 100, 9215):
        n = 2 if args.quick else 4
        _, syms_a = channel.make_frames(n, fb_a, seed=600 + fb_a)
        expect = np.stack([golden.deconvolve(fb_a, s) for s in syms_a])
        ret, out = api_pkg.deconvolve_batch(fb_a, syms_a)
        bad = int(ret != 0) or int((np.asarray(out) != expect)
                                   .any(axis=1).sum())
        arb_bad += bad
        arb_cells.append(dict(framebits=fb_a, frames=n,
                              mismatch_frames=int(bad)))
    record("arbitrary_framebits", cells=arb_cells,
           mismatch_frames=arb_bad,
           note="off-byte-grid framebits through the public API on "
                "chip vs golden (reference partial-byte contract)")

    # ------- sharded DAB+ ensemble chain (one jitted call) -----------
    ens_mesh = mesh_mod.make_mesh(n_data=1, n_seq=1,
                                  devices=jax.devices()[:1])
    audio_sh, errors_sh = dab.decode_ensemble_sharded(
        jnp.asarray(sf_syms), kbps, ens_mesh, use_pallas=True)
    audio_sh, errors_sh = np.asarray(audio_sh), np.asarray(errors_sh)
    ens_mm = int((errors_sh != g_errors).sum())
    ens_mm += sum(int(not np.array_equal(audio_sh[b], g_audio[b]))
                  for b in range(cfgB) if g_errors[b] != -1)
    record("sharded_ensemble_chain", superframes=cfgB, kbps=kbps,
           mismatch_superframes=ens_mm,
           note="decode_ensemble_sharded (shard_map DP entry, 1-chip "
                "mesh here; 8-way sharding exercised in "
                "dryrun_multichip) vs the golden composition")

    # ---- jax_scan small-frame cost breakdown (VERDICT r3 weak #7) ----
    # The round-3 sweep's 132.8 s jax_scan/8kbps cell was the FIRST cell
    # of the whole run (cold tunnel + first XLA compile). Disambiguate:
    # time the same shape warm (compiled above), and a fresh small shape
    # (16 kbit/s) whose compile happens mid-process.
    n8 = 8 if args.quick else 64           # batch must match the sweep's
    bits16, syms16 = channel.make_frames(n8, 384, seed=161)
    t0 = time.time()
    out16 = decode_variant("jax_scan", syms16.astype(np.int32), 384)
    t_fresh = time.time() - t0
    _, syms8 = channel.make_frames(n8, 192, seed=8)
    t0 = time.time()
    decode_variant("jax_scan", syms8.astype(np.int32), 192)
    t_warm = time.time() - t0
    ok16 = int((out16 != np.stack([golden.deconvolve(384, s)
                                   for s in syms16.astype(np.int32)]))
               .any(axis=1).sum())
    record("jax_scan_small_frames", fresh_shape_compile_s=round(t_fresh, 1),
           warm_same_shape_s=round(t_warm, 2), mismatch_frames=ok16,
           note="r3's 132.8 s cell was cold-start, not a scan blowup, "
                "if fresh_shape_compile_s is small")

    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}  ok={doc['ok']}")
    return 0 if doc["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
