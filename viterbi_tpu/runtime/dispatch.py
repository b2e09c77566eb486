"""Variant dispatch + capability probe — the L3 analog of the reference's
CPU dispatcher (setupdll.cpp:195-270, viterbi_helpers.asm:48-157).

Where the reference probes CPUID/xgetbv and picks the best of five SIMD
kernels behind a function pointer (``deconJumpTarget``), we probe the
JAX backend (platform, device count, Pallas availability) and pick the
best decoder *variant*. Override semantics match the reference: a config
override is honored only "downward-compatible" — forcing a variant the
backend can't run falls back to the best supported one
(setupdll.cpp:220-236).

The jump target is re-armed by ``initialize()`` and latched to a
safe-mode stub by the fault handler (runtime.faults), mirroring
``decon_savemode`` (exc_handler.cpp:214,243).
"""

from __future__ import annotations

import dataclasses

import jax

from . import config as config_mod

# Capability bits (analog of getcpucaps.h:29-38).
CAP_JAX = 1 << 0          # basic jitted decode available
CAP_BLOCKED_TB = 1 << 1   # block-parallel traceback
CAP_PALLAS = 1 << 2       # Pallas TPU kernels
CAP_TPU = 1 << 3          # running on real TPU hardware
CAP_MULTI_DEVICE = 1 << 4  # >1 addressable device (sharded decode)

# Variant table, "weakest" to "strongest" (analog of the SSE2..AVX512
# ladder). Index is what the config file's byte 0 selects.
VARIANTS = (
    "jax_scan",      # 0: pure-JAX ACS + serial-scan traceback
    "jax_blocked",   # 1: pure-JAX ACS + block-parallel traceback
    "pallas",        # 2: Pallas decisions-kernel ACS + blocked traceback
    "pallas_fused",  # 3: Pallas register-exchange ACS + checkpoint walk
    "auto_best",     # 4: alias: measured-fastest (auto-tuner result)
)


def get_caps(interpret: bool = False) -> int:
    """Probe backend capabilities. Analog of GetCPUCaps.

    ``interpret`` (config key ``interpret=1``) grants CAP_PALLAS on
    non-TPU backends by running Pallas kernels in interpreter mode —
    the CI escape hatch that lets the real dispatch->Pallas path
    execute without TPU hardware.
    """
    caps = CAP_JAX | CAP_BLOCKED_TB
    try:
        devices = jax.devices()
    except Exception:
        return 0
    platform = devices[0].platform if devices else "none"
    if platform == "tpu":
        caps |= CAP_TPU | CAP_PALLAS
    elif interpret:
        try:
            from ..ops import acs_pallas
            if acs_pallas.available():
                caps |= CAP_PALLAS
        except Exception:
            pass
    if len(devices) > 1:
        caps |= CAP_MULTI_DEVICE
    return caps


def _variant_supported(index: int, caps: int) -> bool:
    if index in (0, 1):
        return bool(caps & CAP_JAX)
    if index in (2, 3):
        return bool(caps & CAP_PALLAS)
    if index == 4:
        return True
    return False


def _best_variant(caps: int) -> int:
    # pallas_fused (register-exchange, no decisions array) is the
    # measured-fastest path on TPU (docs/KERNELS.md)
    for index in (3, 1, 0):
        if _variant_supported(index, caps):
            return index
    return 0


@dataclasses.dataclass
class DispatchState:
    """The mutable dispatcher: chosen variant + safe-mode latch.

    Mirrors VITDLLMEM + deconJumpTarget (viterbi.h:117-129,
    setupdll.cpp:39).
    """
    caps: int = 0
    variant: int = 0
    safe_mode: bool = False     # latched by faults, cleared by initialize()
    except_counter: int = 0
    config: config_mod.Config = dataclasses.field(
        default_factory=config_mod.Config)


_STATE = DispatchState()


def state() -> DispatchState:
    return _STATE


def _apply_compile_cache(cfg: config_mod.Config) -> None:
    """Enable JAX's persistent compilation cache (config key
    ``compile_cache``) unless the process already configured one — the
    cross-restart half of WakeUpYMM's job: a receiver restart re-hits
    every compiled decode shape instead of re-paying multi-second XLA
    compiles."""
    if not cfg.compile_cache:
        return
    try:
        import os

        if jax.config.jax_compilation_cache_dir:
            return  # user/process already chose a cache; keep it
        os.makedirs(cfg.compile_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cfg.compile_cache)
    except Exception:
        pass  # cache is an optimization; never fail setup over it


def setup(config_path: str | None = None) -> DispatchState:
    """(Re)configure the dispatcher: probe caps, read config, pick the
    variant. Analog of SetupDLL + SetupCpuDispatcher (setupdll.cpp:57-270).
    """
    cfg = config_mod.load(config_path)
    _apply_compile_cache(cfg)
    caps = get_caps(interpret=cfg.interpret)
    best = _best_variant(caps)
    variant = best
    if 0 <= cfg.variant_override <= 4:
        if cfg.variant_override == 4:
            variant = best
        elif _variant_supported(cfg.variant_override, caps):
            variant = cfg.variant_override  # downgrade always honored
        # unsupported upgrade request: keep automatic choice
    _STATE.caps = caps
    _STATE.variant = variant
    _STATE.config = cfg
    _STATE.safe_mode = False
    if cfg.show_info:
        print(f"[viterbi_tpu] variant={VARIANTS[variant]} caps=0x{caps:x}")
    return _STATE


def initialize(config_path: str | None = None) -> bool:
    """Public re-init: clears the exception counter and safe-mode latch
    and re-reads the config — the twin of the DLL's ``initialize``
    export (dllmain.cpp:156-160).
    """
    _STATE.except_counter = 0
    setup(config_path)
    return True


def latch_safe_mode(exc: BaseException | None = None) -> None:
    """Degrade to safe mode: decode calls return error code 1 until
    ``initialize()`` re-arms (exc_handler.cpp:214,243)."""
    _STATE.safe_mode = True
    _STATE.except_counter += 1
