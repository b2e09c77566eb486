"""Measure VPU issue throughput vs dependency chains: N independent
int32 op streams inside one Pallas fori_loop. Also probes int/float
dual-issue. Not part of the test suite."""

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

    def _sync(o):
        np.asarray(jax.tree.leaves(o)[0])

    ITERS = 2000
    ROWS, COLS = 64, 2048
    lanes = ROWS * COLS

    def streams_kernel(nstreams, ops_per, ftype, x_ref, o_ref):
        xs = [x_ref[:] + jnp.asarray(i, x_ref.dtype) for i in range(nstreams)]
        if ftype == "float":
            xs = [x.astype(jnp.float32) for x in xs]
        elif ftype == "mixed":
            xs = [x.astype(jnp.float32) if i % 2 else x
                  for i, x in enumerate(xs)]
        cs = [jnp.asarray(3, x.dtype) for x in xs]

        def body(i, vs):
            out = []
            for v, c in zip(vs, cs):
                for _ in range(ops_per):
                    v = jnp.minimum(v + c, v)
                out.append(v)
            return tuple(out)

        vs = jax.lax.fori_loop(0, ITERS, body, tuple(xs))
        acc = vs[0].astype(jnp.int32)
        for v in vs[1:]:
            acc = acc + v.astype(jnp.int32)
        o_ref[:] = acc

    x = jnp.ones((ROWS, COLS), jnp.int32)
    for ftype in ("int", "float", "mixed"):
        for nstreams in (1, 2, 4, 8):
            ops_per = 2
            total_ops = ITERS * nstreams * ops_per * 2  # add+min
            f = jax.jit(lambda x, n=nstreams, ft=ftype: pl.pallas_call(
                functools.partial(streams_kernel, n, ops_per, ft),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
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
            dt = (time.perf_counter() - t0) / 10
            rate = total_ops * lanes / dt
            print(f"{ftype:6s} streams={nstreams}  {dt*1e3:8.3f} ms  "
                  f"{rate/1e12:6.2f} T lane-ops/s", flush=True)


if __name__ == "__main__":
    main()
