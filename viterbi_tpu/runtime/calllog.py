"""Call logging / tracing / symbol capture — the observability twin of
the reference's VIT_WRITE_LOGFILE / VIT_WRITE_SYMBOLS subsystem
(viterbi.h:50-80, deconvolve.cpp:555-650, dllmain.cpp:64-107).

Per call we record: sequence number, wall-clock µs timestamp, inter-call
dT, thread id, decode duration, re-entrancy depth, and the call shape
(framebits / rs_dims / batch). With symbol capture on, the raw symbol
streams are appended to a ``.sym.npy``-per-call directory — the
mechanism for harvesting real traffic as replay fixtures (SURVEY.md §4
item 4). Runtime-togglable (config `log_calls=1`) instead of the
reference's compile-time #ifdef.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np

from . import config as config_mod

_lock = threading.Lock()
_state = {
    "enabled": False, "symbols": False, "path": None,
    "seq": 0, "last_entry": 0.0, "entry_depth": 0, "sym_dir": None,
}


def configure(enabled: bool, symbols: bool = False,
              path: str | None = None) -> None:
    with _lock:
        _state["enabled"] = enabled
        _state["symbols"] = symbols
        if enabled:
            base = path or os.path.join(
                os.path.dirname(config_mod.default_path()),
                time.strftime("%Y%m%d_%H%M%S"))
            os.makedirs(os.path.dirname(base + ".log") or ".",
                        exist_ok=True)
            _state["path"] = base + ".log"
            if symbols:
                _state["sym_dir"] = base + "_sym"
                os.makedirs(_state["sym_dir"], exist_ok=True)


def enabled() -> bool:
    return _state["enabled"]


class record:
    """Context manager logging one hot-path call."""

    def __init__(self, kind: str, **shape):
        self.kind = kind
        self.shape = shape

    def __enter__(self):
        if not _state["enabled"]:
            return self
        with _lock:
            self.seq = _state["seq"]
            _state["seq"] += 1
            _state["entry_depth"] += 1
            self.depth = _state["entry_depth"]
            now = time.time()
            self.dt_ms = ((now - _state["last_entry"]) * 1e3
                          if _state["last_entry"] else 0.0)
            _state["last_entry"] = now
        self.t0 = time.perf_counter()
        return self

    def capture_symbols(self, symbols) -> None:
        if _state["enabled"] and _state["symbols"]:
            np.save(os.path.join(_state["sym_dir"],
                                 f"{self.seq:08d}_{self.kind}.npy"),
                    np.asarray(symbols))

    def __exit__(self, *exc):
        if not _state["enabled"]:
            return False
        dur_us = (time.perf_counter() - self.t0) * 1e6
        with _lock:
            _state["entry_depth"] -= 1
            shape = " ".join(f"{k}={v}" for k, v in self.shape.items())
            line = (f"{self.seq:6d}  {time.strftime('%H:%M:%S')}"
                    f"  dT: {self.dt_ms:8.3f} ms  TID: {threading.get_ident() & 0xFFFF:5d}"
                    f"  {self.kind}: {dur_us:9.1f} us  ReE: {self.depth - 1}"
                    f"  {shape}\n")
            try:
                with open(_state["path"], "a") as f:
                    f.write(line)
            except OSError:
                pass
        return False
