"""Data-parallel sharded decode: independent frames over the mesh.

The analog of QIRX's thread-level parallelism over subchannels
(SURVEY.md §2.7 row 2): each device decodes its shard of the frame
batch; no cross-device communication is needed in the hot loop, so
scaling is embarrassing by construction and the ≥85% multi-host
efficiency target reduces to ingestion/dispatch overhead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import constants as C
from ..ops import acs, traceback
from . import mesh as mesh_mod


@partial(jax.jit, static_argnames=("framebits", "block"))
def _decode_jit(symbols, framebits: int, block: int):
    decisions, metrics = acs.forward(symbols, framebits + C.TAIL_BITS)
    out = traceback.chainback_blocked(decisions, framebits, block=block)
    return out, metrics


def decode_sharded(symbols, framebits: int, mesh=None, block: int = 64):
    """Decode a [B, 4*(framebits+6)] batch sharded over the data axis.

    ``B`` must divide evenly by the data-axis size. Returns
    uint8[B, framebits//8] with the same sharding.
    """
    if mesh is None:
        mesh = mesh_mod.make_mesh()
    sharding = mesh_mod.data_sharding(mesh)
    syms = jax.device_put(jnp.asarray(symbols, dtype=jnp.int32), sharding)
    out, _ = _decode_jit(syms, framebits, block)
    return out
