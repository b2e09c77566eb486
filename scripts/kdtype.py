"""Probe which narrow-dtype (u8/i8/u16/i16) vector ops Mosaic accepts on
this chip, and microbenchmark an i16 ACS step vs i32. Not part of the
test suite."""

import functools
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
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    def try_op(name, dtype, fn, rows=32):
        x = jnp.ones((rows, 512), dtype)
        y = jnp.full((rows, 512), 2, dtype)

        def kernel(x_ref, y_ref, o_ref):
            o_ref[:] = fn(x_ref[:], y_ref[:])

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, y)
            np.asarray(out)
            print(f"  {name:28s} OK")
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:90]
            print(f"  {name:28s} FAIL {msg}")
            return False

    for dt in (jnp.uint8, jnp.int8, jnp.uint16, jnp.int16):
        print(f"dtype {dt.__name__}:", flush=True)
        try_op("add", dt, lambda a, b: a + b)
        try_op("min", dt, lambda a, b: jnp.minimum(a, b))
        try_op("cmp+select", dt, lambda a, b: jnp.where(a <= b, a, b))
        try_op("shift", dt, lambda a, b: (a + b) >> 1)
        try_op("xor", dt, lambda a, b: a ^ b)
        try_op("sub", dt, lambda a, b: a - b)
        try_op("cvt->i32", dt, lambda a, b: (a.astype(jnp.int32)
                                             + b.astype(jnp.int32)).astype(dt))
        try_op("cmp->i32sel", dt,
               lambda a, b: jnp.where(a <= b, jnp.int32(1),
                                      jnp.int32(0)).astype(dt))

    # --- timing: 20 chained (add+min+min) rounds, i32 vs i16 vs u8 ---
    def chain_kernel(dt, n, x_ref, o_ref):
        x = x_ref[:]
        c = jnp.asarray(3, dt)

        def body(i, v):
            v = jnp.minimum(v + c, jnp.asarray(200, dt))
            v = jnp.minimum(v, v + jnp.asarray(1, dt))
            return v ^ c
        o_ref[:] = jax.lax.fori_loop(0, n, body, x)

    def _sync(o):
        np.asarray(jax.tree.leaves(o)[0])

    for dt in (jnp.int32, jnp.int16, jnp.uint16, jnp.uint8):
        try:
            x = jnp.ones((64, 8192), dt)
            f = jax.jit(lambda x, dt=dt: pl.pallas_call(
                functools.partial(chain_kernel, dt, 3000),
                out_shape=jax.ShapeDtypeStruct(x.shape, dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)[:8, :128])
            _sync(f(x))
            for _ in range(3):
                o = f(x)
            _sync(o)
            t0 = time.perf_counter()
            for _ in range(10):
                o = f(x)
            _sync(o)
            dtm = (time.perf_counter() - t0) / 10
            print(f"chain {dt.__name__:8s} {dtm*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"chain {dt.__name__:8s} FAIL {str(e).split(chr(10))[0][:90]}")


if __name__ == "__main__":
    main()
