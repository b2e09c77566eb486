"""RS kernel ablation: time cumulative stages of rs_decode_blocks to
locate the cost (suspect: log/antilog gathers). Not part of the suite."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    os.makedirs("/root/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    from viterbi_tpu import constants as C, golden
    from viterbi_tpu.ops import rs as rs_ops

    B = int(os.environ.get("KRS_B", 65536))
    rng = np.random.default_rng(0)
    msgs = rng.integers(0, 256, (256, C.RS_KK), dtype=np.int64)
    cws = np.stack([golden.rs_encode_codeword(m) for m in msgs])
    cws = np.tile(cws, (B // 256, 1)).astype(np.int32)
    errpos = rng.integers(0, C.RS_N, B)
    errval = rng.integers(1, 256, B)
    corrupt = rng.random(B) < 0.25
    cws[np.arange(B)[corrupt], errpos[corrupt]] ^= errval[corrupt]
    blocks = jnp.asarray(cws)

    def _sync(o):
        np.asarray(jax.tree.leaves(o)[0])

    def timeit(f, *a, iters=20):
        _sync(f(*a))
        for _ in range(5):
            o = f(*a)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        _sync(o)
        return (time.perf_counter() - t0) / iters

    # cumulative stages, re-created from the kernel's pieces
    ato, iof = rs_ops._tables()

    def synd_only(data):
        sbits = rs_ops._gf2_matmul(rs_ops._byte_bits(data), rs_ops._SYND_M)
        s = jnp.sum(sbits.reshape(B, C.RS_NROOTS, 8)
                    << jnp.arange(8, dtype=jnp.int32), axis=-1)
        return s[:128]

    def chien_only(data):
        lam = data[:, :11] & 255
        qbits = rs_ops._gf2_matmul(rs_ops._byte_bits(lam), rs_ops._CHIEN_M)
        return jnp.sum(qbits.reshape(B, C.RS_NN, 8), axis=-1)[:128]

    def gathers_only(data):
        x = data[:, :10]
        acc = x
        for _ in range(6):
            acc = ato[(iof[acc & 255] + 1) % 768]
        return acc[:128]

    def gf_mul_only(data):
        x = data[:, :10]
        acc = x
        for _ in range(6):
            acc = rs_ops.gf_mul(acc, x + 1)
        return acc[:128]

    def full(data):
        return rs_ops.rs_decode_blocks(data)[0][:128]

    for name, f in (("syndromes (MXU)", synd_only),
                    ("chien (MXU)", chien_only),
                    ("12 table gathers [B,10]", gathers_only),
                    ("6 gf_mul [B,10]", gf_mul_only),
                    ("full decode", full)):
        dt = timeit(jax.jit(f), blocks)
        print(f"{name:28s} {dt*1e3:8.3f} ms  "
              f"({B/dt/1e6:7.2f} M cw/s)", flush=True)


if __name__ == "__main__":
    main()
