"""Native host-runtime library: parity with golden + ring scheduler."""

import threading

import numpy as np

from viterbi_tpu import golden
from viterbi_tpu.utils import native


def test_native_encode_matches_golden():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 768, dtype=np.uint8)
    assert np.array_equal(native.encode(bits), golden.encode(bits))


def test_pack_bits_msb_first():
    bits = np.array([1, 0, 1, 1, 0, 0, 0, 1, 1, 1], dtype=np.uint8)
    assert np.array_equal(native.pack_bits(bits), np.packbits(bits))


def test_depuncture_mask():
    syms = np.arange(1, 7, dtype=np.uint32)
    mask = np.array([1, 1, 0, 1], dtype=np.uint8)  # drop every 3rd of 4
    out = native.depuncture(syms, mask, 8, fill=127)
    assert out.tolist() == [1, 2, 127, 3, 4, 5, 127, 6]


def test_rs_deinterleave_matches_reference_layout():
    rs_dims = 3
    rng = np.random.default_rng(1)
    blocks = rng.integers(0, 256, (rs_dims, 120), dtype=np.uint8)
    interleaved = blocks.T.reshape(-1)  # p[j + k*rs_dims]
    out = native.rs_deinterleave(interleaved, rs_dims)
    assert np.array_equal(out, blocks)


def test_frame_ring_multithreaded():
    ring = native.FrameRing(capacity=8, frame_len=4)
    produced = []

    def producer(base):
        for i in range(10):
            f = np.full(4, base + i, dtype=np.uint32)
            ring.push(f, tag=base + i)
            produced.append(base + i)

    threads = [threading.Thread(target=producer, args=(100 * k,))
               for k in range(3)]
    popped = []

    def consumer():
        while len(popped) < 30:
            frames, tags = ring.pop_batch(8, min_batch=1)
            if frames.shape[0] == 0:
                break
            for f, t in zip(frames, tags):
                assert (f == t).all()
                popped.append(int(t))

    ct = threading.Thread(target=consumer)
    ct.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ct.join(timeout=10)
    assert sorted(popped) == sorted(produced)
    ring.close()


def test_pipelined_decode_matches_sequential():
    """utils.pipeline keeps `depth` batches in flight and yields results
    in order, equal to one-at-a-time decode."""
    import jax
    import numpy as np

    from viterbi_tpu import constants as C, golden
    from viterbi_tpu.ops import acs, traceback
    from viterbi_tpu.utils import pipeline

    framebits = 48
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(5):
        bits = rng.integers(0, 2, (3, framebits), dtype=np.uint8)
        syms = np.stack([golden.hard_to_soft(golden.encode(b))
                         for b in bits]).astype(np.int32)
        batches.append(syms)

    @jax.jit
    def decode(s):
        decisions, _ = acs.forward(s, framebits + C.TAIL_BITS)
        return traceback.chainback_scan(decisions, framebits)

    want = [np.asarray(decode(b)) for b in batches]
    got = list(pipeline.decode_pipelined(batches, decode, depth=3))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g == w).all()
