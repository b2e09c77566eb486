"""jax_blocked traceback tuning: phase attribution + compose variants.
Not part of the test suite."""

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
    from viterbi_tpu import constants as C
    from viterbi_tpu.ops import acs_pallas as ap_, traceback as tb

    fb, B = 3072, 1024
    nsteps = fb + C.TAIL_BITS
    rng = np.random.default_rng(0)
    syms = jnp.asarray(rng.integers(0, 256, (B, C.RATE * nsteps),
                                    dtype=np.int64).astype(np.int32))
    fwd = jax.jit(lambda s: ap_.forward(s, nsteps))
    dec, _ = fwd(syms)
    np.asarray(dec[:2, :2])
    nsym = B * C.RATE * nsteps

    def timeit(f, *a, iters=20):
        def sync(o):
            for leaf in jax.tree.leaves(o):
                leaf.block_until_ready()
        o = f(*a)
        sync(o)
        for _ in range(3):
            o = f(*a)
        sync(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        sync(o)
        return (time.perf_counter() - t0) / iters

    t_fwd = timeit(fwd, syms)
    print(f"forward only                 {t_fwd*1e3:8.3f} ms "
          f"{nsym/t_fwd/1e9:6.2f} Gsym/s", flush=True)

    for block in (64, 32, 16, 8):
        f = jax.jit(lambda d, b=block: tb.chainback_blocked(d, fb, block=b))
        t = timeit(f, dec)
        tot = t + t_fwd
        print(f"blocked tb block={block:3d}         {t*1e3:8.3f} ms  "
              f"e2e {nsym/tot/1e9:6.2f} Gsym/s", flush=True)

    # phase attribution at block=64: compose-only jit
    def compose_only(decisions, dtype, block=64):
        nblocks = fb // block
        dwords = decisions[C.TAIL_BITS:C.TAIL_BITS + fb] \
            .astype(jnp.int32).reshape(nblocks, block, B, 2)
        states = jnp.arange(C.NUM_STATES, dtype=jnp.int32)

        def step_map(t):
            w = jax.lax.dynamic_index_in_dim(dwords, t, axis=1,
                                             keepdims=False)
            word = w[..., states >> 5]
            k = (word >> (states & 31)) & 1
            return (states >> 1) | (k << 5)

        def compose(comp, t):
            oh = (comp[..., None]
                  == jnp.arange(C.NUM_STATES, dtype=jnp.int32)).astype(dtype)
            new = jnp.einsum('nbst,nbt->nbs', oh, step_map(t).astype(dtype),
                             preferred_element_type=jnp.float32
                             if dtype == jnp.bfloat16 else jnp.int32)
            return new.astype(jnp.int32), None

        ident = jnp.broadcast_to(
            jnp.arange(C.NUM_STATES, dtype=jnp.int32),
            (nblocks, B, C.NUM_STATES))
        comp, _ = jax.lax.scan(compose, ident, jnp.arange(block),
                               reverse=True)
        return comp

    for dt_ in (jnp.bfloat16, jnp.int8):
        f = jax.jit(lambda d, dt=dt_: compose_only(d, dt))
        t = timeit(f, dec)
        print(f"compose-only {dt_.__name__:9s} b=64 {t*1e3:8.3f} ms",
              flush=True)

    # select-form compose: iterate t FORWARD, comp_new[s] = comp[m_t[s]]
    # where m_t[s] = (s>>1)|(k<<5) takes only 2 static positions per s.
    def compose_select(decisions, block):
        nb = fb // block
        dwords = decisions[C.TAIL_BITS:C.TAIL_BITS + fb] \
            .astype(jnp.int32).reshape(nb, block, B, 2)
        states = jnp.arange(C.NUM_STATES, dtype=jnp.int32)

        def step(comp, t):
            w = jax.lax.dynamic_index_in_dim(dwords, t, axis=1,
                                             keepdims=False)
            word = w[..., states >> 5]
            k = (word >> (states & 31)) & 1
            lo = jnp.repeat(comp[..., :32], 2, axis=-1)
            hi = jnp.repeat(comp[..., 32:], 2, axis=-1)
            return jnp.where(k == 1, hi, lo), None

        ident = jnp.broadcast_to(
            jnp.arange(C.NUM_STATES, dtype=jnp.int32),
            (nb, B, C.NUM_STATES))
        comp, _ = jax.lax.scan(step, ident, jnp.arange(block))
        return comp

    for block in (32, 64, 128, 256):
        f = jax.jit(lambda d, b=block: compose_select(d, b))
        t = timeit(f, dec)
        print(f"compose-select block={block:4d}  {t*1e3:8.3f} ms",
              flush=True)

    # parity: select-form comp must equal einsum-form comp at block=64
    a = np.asarray(jax.jit(lambda d: compose_only(d, jnp.bfloat16))(dec))
    b = np.asarray(jax.jit(lambda d: compose_select(d, 64))(dec))
    print("comp parity:", np.array_equal(a, b), flush=True)


if __name__ == "__main__":
    main()
