"""Failure detection & elastic recovery — the analog of the reference's
vectored-exception-handler subsystem (exc_handler.cpp:150-250,
SURVEY.md §5).

The reference survives access violations and stack overflows inside its
kernels by binary-patching the fault away and latching the dispatcher to
a safe no-op decoder until ``initialize()`` re-arms it. The TPU-native
equivalents are:

  * input validation before dispatch (the reference's crash triggers —
    null symbol buffers, absurd framebits — become clean error paths),
  * a catch-all around kernel execution that converts *any* device or
    host exception into the same latch-and-degrade behavior,
  * ``initialize()`` clears the latch (runtime.dispatch.initialize).

``guarded`` is the decorator both hot API entry points go through.
"""

from __future__ import annotations

import functools
import traceback as _tb

from . import dispatch

SAFE_MODE_RETVAL = 1   # decon_savemode's return value (viterbi_helpers.asm)

_last_fault: dict = {"exc": None, "trace": None, "count": 0}


def last_fault() -> dict:
    return dict(_last_fault)


def record_fault(exc: BaseException) -> None:
    _last_fault["exc"] = repr(exc)
    _last_fault["trace"] = _tb.format_exc()
    _last_fault["count"] += 1
    dispatch.latch_safe_mode(exc)


def guarded(safe_retval):
    """Wrap an API entry point with validation + latch-on-fault.

    While safe mode is latched, calls return ``safe_retval`` immediately
    (the reference's blocked-until-initialize behavior,
    viterbi-benchmark.cpp:456-464).
    """
    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            if dispatch.state().safe_mode:
                return safe_retval
            try:
                return fn(*args, **kwargs)
            except Exception as exc:  # latch, degrade, survive
                record_fault(exc)
                return safe_retval
        return wrapper
    return deco


class ValidationError(ValueError):
    """Raised for inputs that would have crashed the reference."""
