"""Pallas kernel parity (interpret mode on CPU; the same kernels are
verified bit-exact on real TPU hardware by the benchmark scripts)."""

import numpy as np
import pytest

from viterbi_tpu import constants as C
from viterbi_tpu import golden
from viterbi_tpu.harness import channel


@pytest.mark.parametrize("framebits", [48, 768])
def test_decisions_kernel_matches_xla(framebits):
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs, acs_pallas
    bits, syms = channel.make_frames(3, framebits, seed=framebits)
    nsteps = framebits + C.TAIL_BITS
    d1, m1 = acs.forward(jnp.asarray(syms.astype(np.int32)), nsteps)
    d2, m2 = acs_pallas.forward(jnp.asarray(syms.astype(np.int32)), nsteps,
                                time_chunk=32, interpret=True)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert np.array_equal(np.asarray(d1), np.asarray(d2))


@pytest.mark.parametrize("framebits", [48, 768, 3072])
def test_fused_regs_decode_matches_golden(framebits):
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas
    bits, syms = channel.make_frames(2, framebits, seed=framebits + 1)
    expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
    out = acs_pallas.decode(jnp.asarray(syms.astype(np.int32)), framebits,
                            interpret=True)
    assert np.array_equal(np.asarray(out), expect)


def test_regs_decode_with_entry_metrics():
    """initial_metrics plumb-through (used by streaming decode)."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs, acs_pallas
    framebits = 96
    nsteps = framebits + C.TAIL_BITS
    bits, syms = channel.make_frames(2, framebits, seed=9)
    init = jnp.asarray(
        np.random.default_rng(0).integers(0, 120, (2, 64)).astype(np.int32))
    _, m1 = acs.forward(jnp.asarray(syms.astype(np.int32)), nsteps,
                        initial_metrics=init)
    _, m2 = acs_pallas.forward_regs(jnp.asarray(syms.astype(np.int32)),
                                    nsteps, initial_metrics=init,
                                    interpret=True)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))


@pytest.mark.parametrize("packed", [False, "bt"])
@pytest.mark.parametrize("mxu", [False, True])
def test_regs_variants_bit_exact(mxu, packed):
    """MXU-expanded branch metrics and packed symbol layouts are
    bit-exact vs the baseline CG kernel (and the golden model)."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas
    framebits = 192
    bits, syms = channel.make_frames(2, framebits, seed=17)
    expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
    arr = syms.astype(np.int32)
    if packed == "bt":
        arr = acs_pallas.pack_symbols_host(arr)
    out = acs_pallas.decode(jnp.asarray(arr), framebits, interpret=True,
                            mxu=mxu, packed=packed)
    assert np.array_equal(np.asarray(out), expect)


@pytest.mark.parametrize("xch_mode", ["stack", "roll"])
def test_x6_geometry_bit_exact(xch_mode):
    """The 6-phase exchange-form geometry (no transpose resets) must be
    bit-exact vs the 3-phase CG kernel and golden, with both sub-tile
    exchange lowerings, with entry metrics, and packed layouts."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas
    framebits = 192
    nsteps = framebits + C.TAIL_BITS
    bits, syms = channel.make_frames(2, framebits, seed=23)
    arr = jnp.asarray(syms.astype(np.int32))
    expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
    out = acs_pallas.decode(arr, framebits, interpret=True, geom="x6",
                            xch_mode=xch_mode)
    assert np.array_equal(np.asarray(out), expect)
    # entry-metric plumb-through parity vs the cg3 kernel
    init = jnp.asarray(
        np.random.default_rng(1).integers(0, 120, (2, 64)).astype(np.int32))
    r1, m1 = acs_pallas.forward_regs(arr, nsteps, initial_metrics=init,
                                     interpret=True)
    r2, m2 = acs_pallas.forward_regs(arr, nsteps, initial_metrics=init,
                                     interpret=True, geom="x6",
                                     xch_mode=xch_mode)
    assert np.array_equal(np.asarray(r1), np.asarray(r2))
    assert np.array_equal(np.asarray(m1), np.asarray(m2))


def test_pack_symbols_host_matches_device():
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas
    rng = np.random.default_rng(3)
    syms = rng.integers(0, 256, (3, 4 * 54), dtype=np.int32)
    want = np.asarray(acs_pallas.pack_symbols(jnp.asarray(syms), 54))
    got = acs_pallas.pack_symbols_host(syms).T
    assert np.array_equal(want, got)


def test_chainback_regs_pallas_parity():
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas, traceback
    framebits = 744   # nsteps = 750: ckpt 6 — several checkpoints
    nsteps = framebits + C.TAIL_BITS
    ckpt = acs_pallas.choose_ckpt(nsteps)
    bits, syms = channel.make_frames(2, framebits, seed=5)
    regs, _ = acs_pallas.forward_regs(jnp.asarray(syms.astype(np.int32)),
                                      nsteps, interpret=True)
    want = np.asarray(traceback.chainback_regs(regs, framebits, ckpt=ckpt))
    got = np.asarray(traceback.chainback_regs_pallas(
        regs, framebits, ckpt=ckpt, interpret=True))
    assert np.array_equal(want, got)


def test_choose_ckpt_properties():
    from viterbi_tpu.ops import acs_pallas
    for bitrate in (8, 32, 64, 96, 128, 192, 384):
        nsteps = 24 * bitrate + 6
        ck = acs_pallas.choose_ckpt(nsteps)
        assert nsteps % ck == 0 and ck <= 26 and ck % 2 == 0
        assert ck % 6 == 0  # CG kernel eligible for all DAB shapes
        tc = acs_pallas._choose_time_chunk(nsteps, ck)
        assert nsteps % tc == 0 and tc % ck == 0


def test_decode_framebits_layout_sweep():
    """decode() across checkpoint-layout classes: nsteps with a natural
    ckpt (96->102: pad to 24; 168->174: pad to 24), without a 6-divisor
    (8->14 and 224->230: non-CG kernel, natural ckpt), and tiny frames.
    Every class must be bit-exact vs golden (code-review r3 regression
    coverage for the front-pad guard)."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas
    rng = np.random.default_rng(31)
    for framebits in (8, 64, 96, 168, 224):
        nsteps = framebits + C.TAIL_BITS
        syms = rng.integers(0, 256, (2, 4 * nsteps), dtype=np.int32)
        out = acs_pallas.decode(jnp.asarray(syms), framebits,
                                interpret=True)
        expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
        assert np.array_equal(np.asarray(out), expect), framebits


def test_decode_explicit_ckpt_is_honored():
    """An explicitly passed ckpt must not be silently overridden by the
    front-pad heuristic (ADVICE r3) — and must still decode correctly."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas
    framebits = 96                    # nsteps 102 = 6*17: heuristic pads
    rng = np.random.default_rng(7)
    syms = rng.integers(0, 256, (2, 4 * (framebits + C.TAIL_BITS)),
                        dtype=np.int32)
    expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
    out = acs_pallas.decode(jnp.asarray(syms), framebits, ckpt=6,
                            interpret=True)
    assert np.array_equal(np.asarray(out), expect)


def test_batch_tile_prime_granule_falls_back_to_padding():
    """Bp/128 prime used to degrade to 128-lane tiles (13 grid tiles at
    B=1600); the chooser now weighs that against tile-multiple padding
    (advisor r4)."""
    from viterbi_tpu.ops.acs_pallas import _batch_tile
    assert _batch_tile(1600, 512) == (2048, 512)   # 13x128 -> 4x512
    assert _batch_tile(1100, 512) == (1152, 384)   # exact divisor fine
    assert _batch_tile(64, 512) == (128, 128)      # lane-granule floor
    assert _batch_tile(4096, 1024) == (4096, 1024)
    Bp, bt = _batch_tile(8192, 512)
    assert Bp == 8192 and bt == 512


def _on_tpu():
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@pytest.mark.xfail(condition=_on_tpu(), strict=True,
                   reason="XLA:TPU miscompiles fused 4D flip+transpose "
                          "at B>64 (round-4 finding, docs/KERNELS.md); "
                          "an XPASS here means the backend is fixed and "
                          "the reverse-scan workaround in "
                          "chainback_blocked can be retired")
def test_flip_transpose_backend_fence():
    """Fence for the backend miscompile pinned by
    scripts/repro_flip_transpose.py (VERDICT r4 next #10). Runs (and
    passes) on the CPU CI backend; xfails strictly on the broken TPU
    backend."""
    import scripts.repro_flip_transpose as repro
    assert repro.check(batch=128, nblocks=8)


def test_chainback_words_pallas_matches_scan():
    """The decision-word Pallas traceback (the `pallas` rung's fast
    traceback, VERDICT r4 next #1) is bit-exact vs chainback_scan and
    golden across shapes, incl. a multi-block odd-bitrate shape."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs, traceback as tb

    for fb, B in ((48, 3), (2328, 2), (768, 130)):
        bits, syms = channel.make_frames(B, fb, seed=fb + 1)
        dec, _ = acs.forward(jnp.asarray(syms.astype(np.int32)),
                             fb + C.TAIL_BITS)
        want = np.asarray(tb.chainback_scan(dec, fb))
        got = np.asarray(tb.chainback_words_pallas(dec, fb,
                                                   interpret=True))
        assert np.array_equal(got, want), f"fb={fb}"
        exp = np.stack([golden.deconvolve(fb, s) for s in syms])
        assert np.array_equal(got, exp), f"golden fb={fb}"


def test_decisions_forward_packed_ingest():
    """acs_pallas.forward with packed one-int32-per-step ingest (both
    time-major and host-natural frame-major layouts) matches the
    unpacked forward bit-for-bit."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs_pallas

    fb = 96
    nsteps = fb + C.TAIL_BITS
    rng = np.random.default_rng(17)
    syms = rng.integers(0, 256, (5, C.RATE * nsteps), dtype=np.int64) \
        .astype(np.int32)
    dec0, met0 = acs_pallas.forward(jnp.asarray(syms), nsteps,
                                    interpret=True)
    packed_bt = acs_pallas.pack_symbols_host(syms)          # [B, T]
    dec1, met1 = acs_pallas.forward(jnp.asarray(packed_bt), nsteps,
                                    packed="bt", interpret=True)
    dec2, met2 = acs_pallas.forward(jnp.asarray(packed_bt.T), nsteps,
                                    packed=True, interpret=True)
    assert np.array_equal(np.asarray(dec0), np.asarray(dec1))
    assert np.array_equal(np.asarray(dec0), np.asarray(dec2))
    assert np.array_equal(np.asarray(met0), np.asarray(met1))
    assert np.array_equal(np.asarray(met0), np.asarray(met2))


def test_decisions_kernel_mxu_matches_vpu():
    """The MXU-assisted decisions kernel (branch-metric expansion +
    word-packing as exact matmuls, f32 metrics) is bit-identical to
    the pure-VPU form and to ops.acs, incl. packed ingest."""
    import jax.numpy as jnp
    from viterbi_tpu.ops import acs, acs_pallas

    fb = 120
    ns = fb + C.TAIL_BITS
    rng = np.random.default_rng(29)
    syms = rng.integers(0, 256, (5, C.RATE * ns), dtype=np.int64) \
        .astype(np.int32)
    d0, m0 = acs.forward(jnp.asarray(syms), ns)
    for mxu in (False, True):
        d, m = acs_pallas.forward(jnp.asarray(syms), ns,
                                  interpret=True, mxu=mxu)
        assert np.array_equal(np.asarray(d0), np.asarray(d)), mxu
        assert np.array_equal(np.asarray(m0), np.asarray(m)), mxu
    pk = acs_pallas.pack_symbols_host(syms)
    d, m = acs_pallas.forward(jnp.asarray(pk), ns, packed="bt",
                              interpret=True, mxu=True)
    assert np.array_equal(np.asarray(d0), np.asarray(d))
