"""Replay captured symbol streams — the offline half of the reference's
VIT_WRITE_SYMBOLS fixture mechanism (viterbi.h:73-80, SURVEY.md §4
item 4): symbol streams captured by the call logger (runtime.calllog)
are decoded again and checked bit-exactly against the golden oracle,
turning production traffic into regression fixtures.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .. import api
from .. import constants as C
from .. import golden


def iter_captures(capture_dir: str):
    """Yield (path, kind, symbols) for every capture in a _sym dir."""
    for path in sorted(glob.glob(os.path.join(capture_dir, "*.npy"))):
        kind = os.path.basename(path).split("_", 1)[1].removesuffix(".npy")
        yield path, kind, np.load(path)


def infer_framebits(symbols: np.ndarray) -> int:
    """Captured deconvolve streams have 4*(framebits+6) entries."""
    n = symbols.size
    assert n % C.RATE == 0
    return n // C.RATE - C.TAIL_BITS


def replay(capture_dir: str, against_golden: bool = True):
    """Re-decode every captured stream; returns (n_ok, n_total, report).

    Each deconvolve capture is decoded through the live dispatch path
    and (optionally) compared bit-exactly to the golden oracle.
    """
    results = []
    n_ok = 0
    n_total = 0
    for path, kind, syms in iter_captures(capture_dir):
        if kind != "deco":
            continue
        n_total += 1
        framebits = infer_framebits(syms)
        ret, out = api.deconvolve_batch(framebits, syms[None])
        ok = ret == 0
        if ok and against_golden:
            expect = golden.deconvolve(framebits, syms)
            ok = bool(np.array_equal(out[0], expect))
        n_ok += ok
        results.append((os.path.basename(path), framebits, ok))
    return n_ok, n_total, results
