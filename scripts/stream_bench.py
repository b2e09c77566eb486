"""On-chip streaming throughput + parity artifact (STREAM_TPU.json).

VERDICT r4 weak #2: streaming had correctness evidence but zero
performance evidence, and its traceback was the slow XLA-scan form.
This records, on the real chip, the single-device virtual-ring decoder
(``parallel.streaming.make_local_stream_decoder`` — the same
warm-up/boundary-metric/overlap-truncation mechanism as the multi-chip
ppermute ring, with blocks folded into the batch axis):

  * parity: streaming == whole-stream decode, bit for bit, at
    stream_bits in {9216, 73728, 294912} (1x..32x MAX_FRAMEBITS) on
    noisy 3 dB frames,
  * throughput: device-resident Gsym/s vs the pallas_fused whole-frame
    rate on the same total symbol count, with the measured overlap
    overhead compared to the predicted (overlap + warm) / block.

Usage: python scripts/stream_bench.py [out.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from viterbi_tpu import constants as C
    from viterbi_tpu.harness import channel
    from viterbi_tpu.ops import acs, acs_pallas, traceback as tb
    from viterbi_tpu.parallel import streaming

    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAM_TPU.json"
    blk = 3072
    report = {"device": str(jax.devices()[0]),
              "block_bits": blk,
              "overlap": streaming.DEFAULT_OVERLAP,
              "warmup": streaming.WARMUP_STEPS,
              "parity": {}, "throughput": {}}

    # ---- parity: streaming vs whole-stream decode -------------------
    for stream_bits in (9216, 73728, 294912):
        n_blocks = stream_bits // blk
        B = 4
        bits, syms = channel.make_frames(B, stream_bits, seed=stream_bits)
        syms = syms.astype(np.int32)
        dec = streaming.make_local_stream_decoder(stream_bits, n_blocks,
                                                  use_pallas=True)
        got = np.asarray(dec(jnp.asarray(syms[:, :4 * stream_bits]),
                             jnp.asarray(syms[:, 4 * stream_bits:])))

        @jax.jit
        def whole(s, sb=stream_bits):
            d, _ = acs.forward(s, sb + C.TAIL_BITS)
            return tb.chainback_blocked(d, sb, block=64)

        want = np.asarray(whole(jnp.asarray(syms)))
        ok = bool(np.array_equal(got, want))
        report["parity"][str(stream_bits)] = {
            "n_blocks": n_blocks, "frames": B, "match": ok}
        print(f"parity stream_bits={stream_bits} ({n_blocks} blocks): "
              f"{'OK' if ok else 'MISMATCH'}")
        assert ok

    # ---- throughput: device-resident, vs fused whole-frame ----------
    # interleaved min-of-rounds: the tunnel's per-call cost drifts on
    # the ~minute scale (round-3/4 measurement discipline), so each
    # size alternates stream/fused timing and keeps the best round
    def timeit_once(fn, args, iters=10):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*args)
        np.asarray(o)
        return (time.perf_counter() - t0) / iters

    for stream_bits, B in ((9216, 2048), (73728, 256), (294912, 64)):
        n_blocks = stream_bits // blk
        rng = np.random.default_rng(0)
        syms = jnp.asarray(rng.integers(
            0, 256, (B, C.RATE * (stream_bits + C.TAIL_BITS)),
            dtype=np.int64).astype(np.int32))
        data = syms[:, :4 * stream_bits]
        tail = syms[:, 4 * stream_bits:]
        dec = streaming.make_local_stream_decoder(stream_bits, n_blocks,
                                                  use_pallas=True)
        sfn = jax.jit(lambda d, t: dec(d, t)[:, :128])
        N = B * n_blocks
        fsyms = jnp.asarray(rng.integers(
            0, 256, (N, C.RATE * (blk + C.TAIL_BITS)),
            dtype=np.int64).astype(np.int32))
        ffn = jax.jit(lambda s: acs_pallas.decode(s, blk)[:, :128])
        np.asarray(sfn(data, tail)), np.asarray(ffn(fsyms))  # compile
        for _ in range(3):
            sfn(data, tail), ffn(fsyms)                      # warm
        np.asarray(ffn(fsyms))
        dt = fdt = None
        for _ in range(3):
            d1 = timeit_once(sfn, (data, tail))
            d2 = timeit_once(ffn, (fsyms,))
            dt = d1 if dt is None else min(dt, d1)
            fdt = d2 if fdt is None else min(fdt, d2)
        nsym = B * C.RATE * (stream_bits + C.TAIL_BITS)
        s_rate = nsym / dt
        f_rate = N * C.RATE * (blk + C.TAIL_BITS) / fdt

        # predicted overhead: the streaming ACS runs warm + overlap
        # extra steps per block (plus boundary shifts, predicted free);
        # use the decoder's OWN rounded values (at blk=3072, ckpt=18:
        # overlap 120 -> 132, warm 128 -> 126), not the nominal knobs
        ov_eff, warm_eff, _ = streaming._plan_block_layout(
            blk, None, None, use_pallas=True)
        pred = (warm_eff + ov_eff) / blk
        ratio = s_rate / f_rate
        rec = {"frames": B, "n_blocks": n_blocks,
               "stream_gsym_s": round(s_rate / 1e9, 3),
               "fused_wholeframe_gsym_s": round(f_rate / 1e9, 3),
               "ratio_vs_fused": round(ratio, 4),
               "predicted_overhead": round(pred, 4),
               "measured_overhead": round(1 - ratio, 4)}
        report["throughput"][str(stream_bits)] = rec
        print(f"stream_bits={stream_bits:6d} B={B:5d}: "
              f"{s_rate / 1e9:6.2f} Gsym/s streaming vs "
              f"{f_rate / 1e9:6.2f} fused ({ratio:.3f}x, predicted "
              f"{1 - pred:.3f}x)")

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
