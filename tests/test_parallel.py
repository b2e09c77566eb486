"""Sharded decode on the virtual 8-device CPU mesh: data-parallel frame
batches and block-overlapped streaming with boundary-metric exchange."""

import numpy as np
import pytest

from viterbi_tpu import constants as C
from viterbi_tpu import golden
from viterbi_tpu.harness import channel


def test_data_parallel_sharded_decode_matches_golden():
    import jax
    from viterbi_tpu.parallel import batch, mesh as mesh_mod
    framebits = 192
    bits, syms = channel.make_frames(8, framebits, seed=21)
    mesh = mesh_mod.make_mesh()  # 8 devices on the data axis
    out = np.asarray(batch.decode_sharded(syms.astype(np.int32),
                                          framebits, mesh))
    expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
    assert np.array_equal(out, expect)


@pytest.mark.parametrize("use_pallas", [False, True])
@pytest.mark.parametrize("n_data,n_seq", [(1, 8), (2, 4)])
def test_streaming_matches_whole_decode(n_data, n_seq, use_pallas):
    """Streaming decode (XLA and Pallas fast paths) must be bit-equal
    to the whole-stream golden decode; the Pallas path runs in
    interpreter mode on the CPU test mesh."""
    from viterbi_tpu.parallel import mesh as mesh_mod, streaming
    framebits = 384 * n_seq          # per-device block 384 bits
    B = 2 * n_data
    bits, syms = channel.make_frames(B, framebits, seed=n_seq)
    mesh = mesh_mod.make_mesh(n_data=n_data, n_seq=n_seq)
    out = np.asarray(streaming.decode_stream(
        syms.astype(np.int32), framebits, mesh,
        use_pallas=use_pallas, interpret=use_pallas))
    expect = np.stack([golden.deconvolve(framebits, s) for s in syms])
    assert np.array_equal(out, expect)


def test_streaming_noiseless_long_stream():
    from viterbi_tpu.parallel import mesh as mesh_mod, streaming
    framebits = 8 * 1024
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (1, framebits), dtype=np.uint8)
    syms = golden.hard_to_soft(golden.encode(bits[0]))[None]
    mesh = mesh_mod.make_mesh(n_data=1, n_seq=8)
    out = np.asarray(streaming.decode_stream(syms.astype(np.int32),
                                             framebits, mesh))
    assert np.array_equal(out, np.packbits(bits, axis=1))
