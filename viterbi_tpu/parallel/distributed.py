"""Multi-host runtime initialization (the distributed-communication
backend slot of SURVEY.md §2.7 — the reference has none; here the
backend is the JAX distributed runtime + XLA collectives over ICI/DCN).

On a TPU pod slice each host runs the same program; ``initialize()``
wires the hosts into one JAX runtime so ``jax.devices()`` spans the
slice and the meshes built by ``parallel.mesh`` shard over every chip.
Single-process environments (tests, one chip) are a no-op.

Layout policy: the "data" axis (independent frames/subchannels) is laid
out across hosts — it needs no communication, so DCN hops cost nothing.
The "seq" axis (block-overlapped streaming, ppermute boundary metrics)
should stay within a host's chips so boundary exchanges ride ICI:
``make_pod_mesh`` builds exactly that layout.
"""

from __future__ import annotations

import os

import jax

from . import mesh as mesh_mod

_initialized = False

# Environment markers that indicate a real multi-process launch (the
# standard JAX cluster auto-detection inputs).
_CLUSTER_ENV = ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Join the multi-host JAX runtime. Returns True if distributed mode
    is active (more than one process).

    A misconfigured explicit coordinator RAISES rather than silently
    degrading to single-process — a silent fallback would shard a pod
    job onto one host and look like a perf bug. Only the genuinely
    single-process case (no explicit args, no cluster environment) is
    a no-op.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    explicit = coordinator_address is not None
    auto = any(os.environ.get(k) for k in _CLUSTER_ENV)
    if not explicit and not auto:
        return False          # single-process environment: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return jax.process_count() > 1


def make_pod_mesh(n_seq_per_host: int = 1):
    """[data, seq] mesh over the whole slice: seq contiguous within a
    host (ICI), data spanning hosts (no-communication axis over DCN)."""
    devices = jax.devices()
    n_seq = n_seq_per_host
    n_data = len(devices) // n_seq
    return mesh_mod.make_mesh(n_data=n_data, n_seq=n_seq, devices=devices)


def local_batch_slice(global_batch: int) -> slice:
    """The contiguous slice of a global frame batch this host feeds."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
