"""Loopback test channel: encoder + AWGN, the methodology twin of the
reference benchmark's self-checking loop (viterbi-benchmark.cpp:293-329,
636-670).

Soft symbols are offset-binary around 127.5 with gain 32 and clipping to
[0, 255]; the noise standard deviation is derived from Eb/N0 with the
rate adjustment ``esn0 = ebn0 + 10*log10(1/RATE)`` exactly as the
reference does (viterbi-benchmark.cpp:292-294). The RNG is NumPy's
(seeded) generator rather than MSVC ``rand()`` — parity with the
reference is statistical (BER/FER at the operating point), the bit-exact
contract is decoder-vs-golden-model, not channel-vs-channel.
"""

from __future__ import annotations

import numpy as np

from .. import constants as C
from .. import golden

EBN0_DB = 3.0      # reference operating point (viterbi-benchmark.cpp:60)
GAIN = 32.0
OFFSET = 127.5
CLIP = 255


def noise_amplitude(ebn0_db: float = EBN0_DB, rate: int = C.RATE) -> float:
    """Signal amplitude for unit-variance noise at the given Eb/N0."""
    esn0 = ebn0_db + 10.0 * np.log10(1.0 / rate)
    return 1.0 / np.sqrt(0.5 / 10.0 ** (esn0 / 10.0))


def awgn_soft_symbols(hard: np.ndarray, rng: np.random.Generator,
                      ebn0_db: float = EBN0_DB) -> np.ndarray:
    """Map hard symbols {0,1} to noisy soft symbols uint32 in [0, 255]."""
    amp = noise_amplitude(ebn0_db)
    hard = np.asarray(hard)
    mean = np.where(hard != 0, amp, -amp)
    sample = OFFSET + GAIN * (mean + rng.standard_normal(hard.shape))
    return np.clip(sample, 0, CLIP).astype(np.uint32)


def make_frames(nframes: int, framebits: int, seed: int = 0,
                ebn0_db: float = EBN0_DB):
    """Generate (data_bytes, soft_symbols) for ``nframes`` random frames.

    Returns ``bits``  uint8[nframes, framebits]   original data bits and
            ``syms``  uint32[nframes, 4*(framebits+6)] noisy soft symbols.
    """
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, size=(nframes, framebits), dtype=np.uint8)
    syms = np.empty((nframes, C.RATE * (framebits + C.TAIL_BITS)),
                    dtype=np.uint32)
    for i in range(nframes):
        hard = golden.encode(bits[i])
        syms[i] = awgn_soft_symbols(hard, rng, ebn0_db)
    return bits, syms


def ber_fer(decoded_bytes: np.ndarray, bits: np.ndarray):
    """Bit/frame error rates of packed decode output vs original bits.

    ``decoded_bytes``: uint8[nframes, framebits//8] MSB-first packed.
    """
    nframes, framebits = bits.shape
    ref = np.packbits(bits, axis=1)
    diff = np.unpackbits(decoded_bytes ^ ref, axis=1)
    bit_errs = diff.sum(axis=1)
    ber = bit_errs.sum() / (nframes * framebits)
    fer = np.count_nonzero(bit_errs) / nframes
    return float(ber), float(fer), int(bit_errs.sum())
