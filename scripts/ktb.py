"""Traceback walk tuning: kc (checkpoints per DMA block) x batch tile.
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

    fb, B = 3072, 8192
    nsteps = fb + C.TAIL_BITS
    ckpt = ap_.choose_ckpt(nsteps)
    rng = np.random.default_rng(0)
    syms_np = rng.integers(0, 256, (B, C.RATE * nsteps), dtype=np.int32)
    syms_bt = jnp.asarray(ap_.pack_symbols_host(syms_np))
    regs, _ = jax.jit(
        lambda s: ap_.forward_regs(s, nsteps, packed="bt"))(syms_bt)
    np.asarray(regs[..., :8][:2])
    nsym = B * C.RATE * nsteps

    def _sync(o):
        np.asarray(jax.tree.leaves(o)[0])

    for bt, budget_mb in ((512, 3), (512, 6), (256, 4), (256, 8),
                          (128, 6), (1024, 6)):
        K = regs.shape[0]
        kc = tb._pick_kc(K, bt, budget_mb * 2**20)
        f = jax.jit(lambda r, bt=bt, bu=budget_mb: tb.chainback_regs_pallas(
            r, fb, ckpt=ckpt, b_tile=bt, kc_budget=bu * 2**20)[:128])
        _sync(f(regs))
        for _ in range(8):
            o = f(regs)
        _sync(o)
        t0 = time.perf_counter()
        for _ in range(30):
            o = f(regs)
        _sync(o)
        dt = (time.perf_counter() - t0) / 30
        print(f"tb bt={bt:5d} budget={budget_mb}MB kc={kc:3d} "
              f"{dt*1e3:8.3f} ms  {nsym/dt/1e9:6.2f} Gsym/s", flush=True)


if __name__ == "__main__":
    main()
