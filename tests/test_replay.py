"""Capture-and-replay round trip: the production-traffic fixture loop."""

import numpy as np

import viterbi_tpu
from viterbi_tpu import golden
from viterbi_tpu.runtime import calllog


def test_capture_then_replay(tmp_path, monkeypatch):
    monkeypatch.setenv("VITERBI_TPU_CONFIG", str(tmp_path / "cfg.txt"))
    viterbi_tpu.initialize()
    base = str(tmp_path / "cap")
    calllog.configure(True, True, base)
    rng = np.random.default_rng(0)
    for framebits in (48, 96):
        bits = rng.integers(0, 2, framebits, dtype=np.uint8)
        syms = golden.hard_to_soft(golden.encode(bits))
        assert viterbi_tpu.deconvolve(framebits, syms) == 0
    calllog.configure(False)

    from viterbi_tpu.harness import replay
    n_ok, n_total, report = replay.replay(base + "_sym")
    assert n_total == 2 and n_ok == 2, report


def test_committed_corpus_replays_bit_exactly(tmp_path, monkeypatch):
    """The committed capture corpus (tests/data/corpus, harvested by
    scripts/make_corpus.py through the public API with symbol capture
    on) must replay bit-exactly against its recorded expectations —
    the reference's VIT_WRITE_SYMBOLS fixture loop (viterbi.h:73-80,
    SURVEY.md §4.4) as a CI regression gate."""
    import os

    monkeypatch.setenv("VITERBI_TPU_CONFIG", str(tmp_path / "cfg.txt"))
    viterbi_tpu.initialize()
    corpus = os.path.join(os.path.dirname(__file__), "data", "corpus")
    from viterbi_tpu.harness import replay
    n_ok, n_total, report = replay.replay_corpus(corpus)
    bad = [r for r in report if not r[2]]
    # 5 bitrates x 2 frames + 3 superframe cases
    assert n_total == 13 and not bad, bad
    kinds = {r[1] for r in report}
    assert kinds == {"deco", "rscs"}


def test_summary_on_disable(tmp_path, monkeypatch):
    """Disabling logging appends the unload-style summary
    (dllmain.cpp:325-357 analog): call counts, durations, min/max
    buffer footprint."""
    monkeypatch.setenv("VITERBI_TPU_CONFIG", str(tmp_path / "cfg.txt"))
    viterbi_tpu.initialize()
    base = str(tmp_path / "log")
    calllog.configure(True, False, base)
    rng = np.random.default_rng(1)
    for framebits in (48, 96):
        bits = rng.integers(0, 2, framebits, dtype=np.uint8)
        syms = golden.hard_to_soft(golden.encode(bits))
        assert viterbi_tpu.deconvolve(framebits, syms) == 0

    stats = calllog.summary()
    assert stats["calls"] == 2
    deco = stats["stats"]["deco"]
    assert deco["count"] == 2 and deco["total_us"] > 0
    # footprint: 4*(48+6) and 4*(96+6) u32 symbol buffers
    assert deco["min_bytes"] == 4 * 4 * 54
    assert deco["max_bytes"] == 4 * 4 * 102

    calllog.configure(False)
    text = open(base + ".log").read()
    assert "--- summary: 2 calls" in text
    assert "deco: 2 calls" in text
