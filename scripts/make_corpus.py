"""Generate the committed capture-replay corpus (tests/data/corpus).

The reference's VIT_WRITE_SYMBOLS build exists to harvest real symbol
streams as offline replay fixtures (viterbi.h:73-80, SURVEY.md §4.4).
This script is the harvesting run: it decodes noisy 3 dB frames and
mixed-error DAB+ superframes through the PUBLIC API with the call
logger's symbol capture enabled, then promotes the captured ``.npy``
streams into ``tests/data/corpus/`` together with expectation files
(the golden decode / RS outcome), which CI replays bit-exactly via
``harness.replay.replay_corpus`` (tests/test_replay.py).

Deterministic: re-running reproduces the same corpus byte-for-byte.

Usage: python scripts/make_corpus.py [--outdir tests/data/corpus]
"""

import argparse
import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# corpus generation is host work; never touch (or block on) the TPU
# tunnel — env vars are too late here, sitecustomize pre-imports jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

BITRATES = (8, 32, 64, 128, 384)     # kbit/s; framebits = 24*kbps
FRAMES_PER_BITRATE = 2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "corpus"))
    args = ap.parse_args()

    from viterbi_tpu import api, constants as C, golden
    from viterbi_tpu.harness import channel
    from viterbi_tpu.runtime import calllog

    os.makedirs(args.outdir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="vit_corpus_")
    api.initialize()
    calllog.configure(True, symbols=True, path=os.path.join(tmp, "cap"))

    # --- deconvolve captures: noisy frames through the public API ---
    deco_names = []
    for kbps in BITRATES:
        framebits = 24 * kbps
        _, syms = channel.make_frames(FRAMES_PER_BITRATE, framebits,
                                      seed=1000 + kbps)
        for i in range(FRAMES_PER_BITRATE):
            ret = api.deconvolve(framebits, syms[i].astype(np.int32))
            assert ret == 0
            deco_names.append((f"{kbps:03d}kbps{i}", syms[i]))

    # --- RS superframe captures: clean / corrected / uncorrectable ---
    rs_dims = 16
    rng = np.random.default_rng(77)
    rs_cases = []
    for case, nerr_spec in (("clean", None), ("mixed", "correctable"),
                            ("uncorr", "uncorrectable")):
        msgs = rng.integers(0, 256, (rs_dims, C.RS_KK), dtype=np.uint8)
        cws = np.stack([golden.rs_encode_codeword(m)
                        for m in msgs]).astype(np.int64)
        if nerr_spec == "correctable":
            for j in range(rs_dims):
                e = int(rng.integers(0, 6))
                if e:
                    pos = rng.choice(C.RS_N, e, replace=False)
                    cws[j, pos] ^= rng.integers(1, 256, e)
        elif nerr_spec == "uncorrectable":
            pos = rng.choice(C.RS_N, 9, replace=False)
            cws[3, pos] ^= rng.integers(1, 256, 9)  # codeword 3: > t errors
        inter = cws.T.reshape(-1).astype(np.uint8)
        outbuf = np.zeros(rs_dims * C.RS_KK, dtype=np.uint8)
        errors = api.rs_check_superframe(inter.astype(np.int32), 0,
                                         rs_dims, outbuf)
        rs_cases.append((case, inter, int(errors), outbuf.copy()))
    calllog.configure(False)

    # --- promote the captured streams + write expectations ---
    captured = sorted(glob.glob(os.path.join(tmp, "cap_sym", "*.npy")))
    deco_caps = [p for p in captured if p.endswith("_deco.npy")]
    rs_caps = [p for p in captured if p.endswith("_rscs.npy")]
    assert len(deco_caps) == len(deco_names), (len(deco_caps),
                                               len(deco_names))
    assert len(rs_caps) == len(rs_cases)

    n = 0
    for cap, (name, syms) in zip(deco_caps, deco_names):
        arr = np.load(cap)
        assert np.array_equal(arr.astype(np.uint32), syms), name
        dst = os.path.join(args.outdir, f"{name}_deco.npy")
        np.save(dst, arr.astype(np.uint8))      # values are 0..255
        framebits = arr.size // C.RATE - C.TAIL_BITS
        np.save(os.path.join(args.outdir, f"{name}_deco.expect.npy"),
                golden.deconvolve(framebits, arr))
        n += 1
    for cap, (case, inter, errors, outbuf) in zip(rs_caps, rs_cases):
        arr = np.load(cap)
        assert np.array_equal(arr.astype(np.uint8), inter), case
        np.save(os.path.join(args.outdir, f"sf{case}_rscs.npy"),
                arr.astype(np.uint8))
        g_err, g_out = golden.rs_check_superframe(inter, rs_dims)
        assert g_err == errors, (case, g_err, errors)
        np.savez(os.path.join(args.outdir, f"sf{case}_rscs.expect.npz"),
                 errors=np.int64(errors), rs_dims=np.int64(rs_dims),
                 out=g_out.astype(np.uint8))
        n += 1
    shutil.rmtree(tmp)

    total = sum(os.path.getsize(os.path.join(args.outdir, f))
                for f in os.listdir(args.outdir))
    print(f"corpus: {n} captures -> {args.outdir} ({total / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
