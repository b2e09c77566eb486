"""Device mesh helpers.

The reference is single-process SIMD (SURVEY.md §2.7); scaling here is
by sharding over a ``jax.sharding.Mesh``:

  * axis "data"  — independent frames / subchannels (DP analog),
  * axis "seq"   — blocks of one long symbol stream (the SP/CP analog:
    block-overlapped Viterbi with boundary-metric exchange).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_mesh(n_data: int | None = None, n_seq: int = 1,
              devices=None) -> Mesh:
    """Build a [data, seq] mesh. Defaults: all addressable devices on
    the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_seq
    assert n_data * n_seq <= len(devices)
    grid = np.array(devices[: n_data * n_seq]).reshape(n_data, n_seq)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/frame) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
