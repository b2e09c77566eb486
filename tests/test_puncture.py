"""DAB EEP puncturing (EN 300 401 §11): vector generation pinned by
exact rate arithmetic, loopback through puncture -> depuncture ->
decode, and parity between the numpy, device, and native depuncture
paths."""

import numpy as np
import pytest

from viterbi_tpu import constants as C, golden
from viterbi_tpu.models import puncture as P

ALL_EEP = [("A", 1), ("A", 2), ("A", 3), ("A", 4),
           ("B", 1), ("B", 2), ("B", 3), ("B", 4)]


def test_vectors_structure():
    vec = P.puncturing_vectors()
    # PI keeps 8 + PI of 32, vectors nest (PI+1 adds one position)
    assert (vec.sum(axis=1) == 8 + np.arange(25)).all()
    for pi in range(1, 25):
        assert (vec[pi] >= vec[pi - 1]).all()
    # the classic rates: PI=8 keeps the first two streams (rate 1/2),
    # PI=16 the first three (1/3), PI=24 everything (the mother code)
    assert (vec[8] == np.tile([1, 1, 0, 0], 8)).all()
    assert (vec[16] == np.tile([1, 1, 1, 0], 8)).all()
    assert (vec[24] == 1).all()
    assert (P.TAIL_VECTOR.sum()) == 12


@pytest.mark.parametrize("profile,level", ALL_EEP)
@pytest.mark.parametrize("bitrate", [32, 64, 96, 128])
def test_eep_rates_exact(profile, level, bitrate):
    """Transmitted-bit count must equal I / rate exactly, tail included
    — this pins the segment tables to the standard's arithmetic."""
    p = P.eep_profile(bitrate, level, profile)
    num, den = P.EEP_RATES[(profile, level)]
    assert p.data_bits == 24 * bitrate
    assert p.transmitted_bits * num == p.data_bits * den
    m = p.mask()
    assert m.size == C.RATE * (24 * bitrate + C.TAIL_BITS)


def test_eep_8kbps_special_case():
    p = P.eep_profile(8, 2, "A")
    assert p.segments == ((5, 13), (1, 12))
    assert p.transmitted_bits * 3 == p.data_bits * 8      # rate 3/8


@pytest.mark.parametrize("profile,level", ALL_EEP)
def test_loopback_noiseless(profile, level):
    """encode -> puncture -> depuncture(neutral) -> decode recovers the
    data bits exactly on a clean channel at every EEP rate."""
    bitrate = 32
    framebits = 24 * bitrate
    rng = np.random.default_rng(level * 7 + (profile == "B"))
    bits = rng.integers(0, 2, framebits).astype(np.uint8)
    soft = golden.hard_to_soft(golden.encode(bits))
    mask = P.frame_mask(bitrate, level, profile)
    received = P.puncture(soft, mask)
    full = P.depuncture(received, mask)
    decoded = golden.deconvolve(framebits, full)
    want = np.packbits(bits)
    assert (np.asarray(decoded) == want).all()


def test_device_decode_matches_golden():
    import jax.numpy as jnp
    from viterbi_tpu.models import dab

    bitrate, level, profile = 32, 3, "A"
    framebits = 24 * bitrate
    rng = np.random.default_rng(3)
    mask = P.frame_mask(bitrate, level, profile)
    B = 4
    received = np.empty((B, int(mask.sum())), np.int32)
    want = []
    for i in range(B):
        bits = rng.integers(0, 2, framebits).astype(np.uint8)
        soft = golden.hard_to_soft(golden.encode(bits))
        # flip some transmitted symbols: decode must still be exactly
        # what the golden decoder says on the same depunctured stream
        noisy = soft.astype(np.int32).copy()
        flips = rng.integers(0, noisy.size, 40)
        noisy[flips] = 255 - noisy[flips]
        received[i] = P.puncture(noisy, mask)
        want.append(golden.deconvolve(framebits, P.depuncture(
            received[i], mask)))
    out = dab.decode_punctured_frames(jnp.asarray(received), bitrate,
                                      level, profile)
    assert (np.asarray(out) == np.stack(want)).all()


def test_native_depuncture_matches_numpy():
    native = pytest.importorskip("viterbi_tpu.utils.native")
    if not native.have_native():
        pytest.skip("native library unavailable")
    mask = P.frame_mask(32, 3, "A")
    rng = np.random.default_rng(0)
    received = rng.integers(0, 256, int(mask.sum()), dtype=np.uint32)
    want = P.depuncture(received, mask, fill=P.NEUTRAL_SOFT)
    got = native.depuncture(received, mask.astype(np.uint8), mask.size,
                            fill=P.NEUTRAL_SOFT)
    assert (np.asarray(got) == want).all()


def test_uep_row_constructor_validates():
    """uep_profile_from_row: a structurally valid user-supplied table
    31 row builds a working Profile; every admissible self-check
    rejects a mistranscribed row (README "Known exclusions")."""
    # synthetic four-segment row for 32 kbit/s: I = 768 = 32 * 24 blocks
    row = ((5, 12), (8, 8), (7, 6), (4, 10))
    p = P.uep_profile_from_row(32, 3, row)
    assert p.data_bits == 768
    mask = p.mask()
    assert mask.size == 4 * 768 + 24
    # the CU cross-check accepts the true size and rejects others
    tx = p.transmitted_bits - 12          # tail keeps 12 of 24
    assert p.transmitted_bits == int(mask.sum())
    if p.transmitted_bits % 64 == 0:
        P.uep_profile_from_row(32, 3, row, cu_size=p.transmitted_bits // 64)
    with pytest.raises(ValueError, match="mistranscribed"):
        P.uep_profile_from_row(32, 3, row, cu_size=1 + p.transmitted_bits // 64)
    # wrong coverage, bad PI, bad length
    with pytest.raises(ValueError, match="sum"):
        P.uep_profile_from_row(32, 3, ((5, 12), (8, 8), (7, 6), (5, 10)))
    with pytest.raises(ValueError, match="PI"):
        P.uep_profile_from_row(32, 3, ((5, 25), (8, 8), (7, 6), (4, 10)))
    with pytest.raises(ValueError, match="length"):
        P.uep_profile_from_row(32, 3, ((0, 12), (13, 8), (7, 6), (4, 10)))
    # and the profile actually puncture/depuncture round-trips
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 768, dtype=np.uint8)
    soft = golden.hard_to_soft(golden.encode(bits))
    rx = P.puncture(soft, mask)
    full = P.depuncture(rx, mask)
    assert np.array_equal(golden.deconvolve(768, full), np.packbits(bits))


def test_decode_profile_frames_uep_row():
    """The jitted decode pipeline accepts any Profile — a user-entered
    UEP row decodes end to end on device, bit-exact vs the golden
    depuncture+decode composition (noisy 3 dB)."""
    import jax.numpy as jnp

    from viterbi_tpu.harness import channel
    from viterbi_tpu.models import dab

    row = ((5, 12), (8, 8), (7, 6), (4, 10))      # synthetic 32 kbit/s row
    prof = P.uep_profile_from_row(32, 3, row)
    framebits = prof.data_bits
    mask = prof.mask()
    bits, mother = channel.make_frames(4, framebits, seed=13)
    received = np.stack([P.puncture(m, mask) for m in mother])
    expect = np.stack([golden.deconvolve(framebits, P.depuncture(r, mask))
                       for r in received])
    out = dab.decode_profile_frames(
        jnp.asarray(received.astype(np.int32)), prof)
    assert np.array_equal(np.asarray(out), expect)
