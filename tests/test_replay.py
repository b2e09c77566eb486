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
