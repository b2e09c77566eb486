"""Benchmark: batched DAB-frame Viterbi decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "viterbi_decode_throughput", "value": N,
   "unit": "Msymbols/s/chip", "vs_baseline": R}

Methodology mirrors the reference benchmark (viterbi-benchmark.cpp:
332-348): warm-up calls, then timed steady-state calls at the 128 kbit/s
operating point (framebits 3072), counting consumed soft symbols
(4*(framebits+6) per frame). ``vs_baseline`` is the ratio to the
reference AVX-512 decoder's estimated symbol rate on a modern x86 core
(~60 SIMD instr per 2 trellis steps -> ~2.0e9 symbols/s; the reference
publishes no absolute numbers, SURVEY.md §6), so vs_baseline >= 10 is
the BASELINE.md target.

Env knobs: BENCH_BATCH (default 1024), BENCH_FRAMEBITS (3072),
BENCH_ITERS (20), BENCH_VARIANT (pallas|jax_blocked|jax_scan).
"""

import json
import os
import time

import numpy as np

# Reference AVX-512 symbols/s estimate (see module docstring).
BASELINE_SYMBOLS_PER_S = 2.0e9


def main():
    import jax

    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs, traceback

    framebits = int(os.environ.get("BENCH_FRAMEBITS", 3072))
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    iters = int(os.environ.get("BENCH_ITERS", 100))
    variant = os.environ.get("BENCH_VARIANT", "auto")

    platform = jax.devices()[0].platform
    use_pallas = False
    if variant in ("auto", "pallas"):
        try:
            from viterbi_tpu.ops import acs_pallas  # noqa: F401
            use_pallas = acs_pallas.available() and platform == "tpu"
        except Exception:
            use_pallas = False

    nsteps = framebits + C.TAIL_BITS
    rng = np.random.default_rng(0)
    syms_np = rng.integers(0, 256, (batch, C.RATE * nsteps), dtype=np.int32)
    syms = jnp.asarray(syms_np)

    if use_pallas:
        from viterbi_tpu.ops import acs_pallas

        # host-natural packed layout: one int32 word per trellis step
        # (a byte-reinterpret of the DAB symbol stream — see
        # acs_pallas.pack_symbols_host), 4x less host->device traffic
        syms = jnp.asarray(acs_pallas.pack_symbols_host(syms_np))

        def decode(symbols):
            return acs_pallas.decode(symbols, framebits, packed="bt")
    elif variant == "jax_scan":
        def decode(symbols):
            decisions, _ = acs.forward(symbols, nsteps)
            return traceback.chainback_scan(decisions, framebits)
    else:
        def decode(symbols):
            decisions, _ = acs.forward(symbols, nsteps)
            return traceback.chainback_blocked(decisions, framebits,
                                               block=64)

    fn = jax.jit(decode)
    # warm up / compile; np.asarray forces completion (block_until_ready
    # does not reliably block on tunneled platforms)
    np.asarray(fn(syms))
    for _ in range(max(10, iters // 4)):
        out = fn(syms)
    np.asarray(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(syms)
    np.asarray(out)
    dt = time.perf_counter() - t0

    symbols_per_call = batch * C.RATE * nsteps
    rate = symbols_per_call * iters / dt
    result = {
        "metric": "viterbi_decode_throughput",
        "value": round(rate / 1e6, 2),
        "unit": "Msymbols/s/chip",
        "vs_baseline": round(rate / BASELINE_SYMBOLS_PER_S, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
