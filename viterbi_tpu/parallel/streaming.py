"""Block-overlapped streaming Viterbi — the sequence-parallel (SP/CP)
analog for trellis decoding (SURVEY.md §2.7 row 3, §5 "long-context").

One long terminated symbol stream is split into ``n_seq`` time blocks
across the mesh's "seq" axis. Each device:

  1. runs a short warm-up ACS over the tail of its own block from
     uniform metrics (the decoder forgets its initial condition in
     ~5·K steps, so the resulting boundary metrics are effectively
     exact),
  2. hands those boundary metrics to its right neighbor with a
     ``ppermute`` over the ICI ring,
  3. re-runs ACS over its block *plus* an overlap region received from
     its right neighbor (symbols prefix, one more ``ppermute``), seeded
     with the received boundary metrics,
  4. traces back from the overlap end (best-metric state; the final
     block anchors at state 0 of the true termination) and keeps only
     its own block's bits — overlap truncation absorbs the anchor
     uncertainty.

Total communication: two ppermutes of [B, ...] tiles per stream,
regardless of stream length. No reference analog exists (the DLL
re-initializes metrics per 9216-bit frame); this is the TPU-native
mechanism for streams ≫ MAX_FRAMEBITS.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .. import constants as C
from ..ops import acs, traceback as tb
from . import mesh as mesh_mod

# Overlap is the truncation-reliability knob: the measured sweep
# (OVERLAP_SWEEP.json, scripts/overlap_sweep.py; 3.1 Mbit per cell at
# 3072-bit blocks) shows streaming == whole-stream decode for overlap
# >= 16 at the 3 dB DAB operating point, >= 48 at 1.5 dB, and >= 120 at
# 0 dB. 120 costs 3.9% redundant compute per 3072-bit block and leaves
# a wide margin below the operating point.
DEFAULT_OVERLAP = 120  # steps; must be even and >= TAIL_BITS
WARMUP_STEPS = 128     # pass-1 ACS length for boundary-metric estimation
#   (same sweep artifact, warmup axis at overlap 120: 64 still leaves
#   70 mismatched bits at 0 dB; 128 and 256 are both exactly clean —
#   128 is the measured knee)


def _uniform_metrics(batch: int) -> jax.Array:
    return jnp.full((batch, C.NUM_STATES), 63, dtype=jnp.int32)


def _anchored_chainback(decisions, anchor_j, anchor_state, tb_steps: int,
                        block_steps: int):
    """Walk ``decisions`` [tb_steps, B, 2] backward, forcing ``state =
    anchor_state`` when reaching decision index ``anchor_j``; emit data
    bits for indices [TAIL_BITS, TAIL_BITS + block_steps)."""
    B = decisions.shape[1]
    j_seq = jnp.arange(tb_steps - 1, -1, -1, dtype=jnp.int32)

    def step(state, inp):
        j, dec = inp
        state = jnp.where(j == anchor_j, anchor_state, state)
        word = jnp.take_along_axis(dec.astype(jnp.int32),
                                   (state >> 5)[:, None], axis=1)[:, 0]
        k = (word >> (state & 31)) & 1
        return (state >> 1) | (k << 5), k

    # anchor_state * 0 keeps the device-varying type for the scan carry
    _, ks = jax.lax.scan(step, anchor_state * 0,
                         (j_seq, jnp.flip(decisions, axis=0)))
    bits = jnp.flip(ks, axis=0)                    # [tb_steps, B]
    body = bits[C.TAIL_BITS: C.TAIL_BITS + block_steps].T  # [B, block]
    return tb.packbits_msb(body)


def _stream_chainback_regs(regs, anchor_k, anchor_state, ckpt: int,
                           emit_bits: int):
    """Anchored checkpoint walk for the Pallas streaming path.

    regs: int32[K, 64, B] register checkpoints of an extended block;
    the walk injects ``anchor_state`` when it reaches checkpoint index
    ``anchor_k`` (per-device traced scalar) and emits the first
    ``emit_bits`` decoded bits. Checkpoints past the anchor produce
    garbage that the emit window never covers.
    """
    K, _, B = regs.shape
    srow = jax.lax.broadcasted_iota(jnp.int32, (C.NUM_STATES, B), 0)

    def step(state, inp):
        k, reg_k = inp
        state = jnp.where(k == anchor_k, anchor_state, state)
        onehot = (srow == state[None, :]).astype(jnp.int32)
        r = jnp.sum(reg_k * onehot, axis=0)
        return (r >> ckpt) & 63, r

    _, rs = jax.lax.scan(step, anchor_state * 0,
                         (jnp.arange(K, dtype=jnp.int32), regs),
                         reverse=True, unroll=4)
    shifts = jnp.arange(ckpt - 1, -1, -1, dtype=jnp.int32)
    bits = ((rs[:, None, :] >> shifts[None, :, None]) & 1)
    bits = bits.reshape(K * ckpt, B)[:emit_bits]
    return tb.packbits_msb(bits.T)


def _auto_use_pallas() -> bool:
    """Default the streaming fast path to Pallas on real TPU devices."""
    try:
        from ..ops import acs_pallas
        return (acs_pallas.available()
                and jax.devices()[0].platform == "tpu")
    except Exception:
        return False


def make_stream_decoder(mesh, stream_bits: int,
                        overlap: int | None = None,
                        use_pallas: bool | None = None,
                        interpret: bool = False,
                        warmup: int | None = None):
    """Build a jitted sharded decoder for terminated streams of
    ``stream_bits`` data bits.

    ``use_pallas=None`` selects the Pallas register-exchange fast path
    automatically on TPU backends (the default in production).
    ``overlap=None`` uses ``DEFAULT_OVERLAP``, clamped/aligned to fit
    small per-device blocks; an explicit overlap that cannot fit
    raises.

    Returns ``decode(symbols, tail_syms)`` where
      * ``symbols``: int32[B, 4*stream_bits] — the data-bit symbols,
      * ``tail_syms``: int32[B, 4*TAIL_BITS] — the flush-bit symbols,
    yielding uint8[B, stream_bits // 8] packed data bits.
    """
    if use_pallas is None:
        use_pallas = _auto_use_pallas()
    explicit_overlap = overlap is not None
    if overlap is None:
        overlap = DEFAULT_OVERLAP
    n_seq = mesh.shape[mesh_mod.SEQ_AXIS]
    assert stream_bits % n_seq == 0
    tb_block = stream_bits // n_seq
    if tb_block % 8:
        raise ValueError(
            f"per-device block of {tb_block} bits is not byte-granular; "
            f"use more data bits per device (stream_bits {stream_bits} "
            f"over {n_seq} devices)")
    if not explicit_overlap and overlap > tb_block:
        # small per-device blocks: clamp the *default* overlap so short
        # streams keep working (truncation reliability degrades with the
        # block size anyway); an explicit overlap that doesn't fit is a
        # caller error and raises below
        overlap = tb_block - (tb_block % 2)
    assert overlap % 2 == 0 and overlap >= C.TAIL_BITS
    if overlap > tb_block:
        raise ValueError(
            f"overlap {overlap} exceeds the {tb_block}-bit per-device "
            f"block; use more data bits per device or a smaller overlap")
    warm = min(WARMUP_STEPS if warmup is None else warmup, tb_block)

    ckpt = None
    if use_pallas:
        from ..ops import acs_pallas
        # anchor times (tb_block + TAIL_BITS for the final block,
        # tb_block + overlap elsewhere) must land on checkpoints
        if tb_block % 6:
            raise ValueError(
                f"pallas streaming needs 6 | block bits (got {tb_block}); "
                f"use more data bits per device or use_pallas=False")
        ckpt = next(d for d in (24, 18, 12, 6)
                    if (tb_block + C.TAIL_BITS) % d == 0)
        if ckpt > tb_block:
            # e.g. tb_block=12 -> ckpt=18: the warm-up pass would then
            # call forward_regs(warm=ckpt > tb_block) and die on an
            # opaque nsteps % ckpt assert
            raise ValueError(
                f"per-device block of {tb_block} bits is smaller than "
                f"its checkpoint period {ckpt}; use more data bits per "
                f"device")
        overlap += (-(overlap - C.TAIL_BITS)) % ckpt  # overlap ≡ 6 (mod ckpt)
        if overlap > tb_block:
            if explicit_overlap:
                raise ValueError(
                    f"overlap {overlap} (after checkpoint rounding) "
                    f"exceeds the {tb_block}-bit per-device block; use "
                    f"more data bits per device or a smaller overlap")
            # default overlap: align DOWN instead (the clamp above may
            # have landed between checkpoints)
            overlap -= ckpt * (-(-(overlap - tb_block) // ckpt))
            if overlap < C.TAIL_BITS:
                raise ValueError(
                    f"per-device block of {tb_block} bits cannot fit "
                    f"any checkpoint-aligned overlap (ckpt {ckpt}); "
                    f"use more data bits per device")
        warm = max(ckpt, warm - warm % ckpt)

    right = [(d, d + 1) for d in range(n_seq - 1)]
    left = [(d, d - 1) for d in range(1, n_seq)]

    def _shard_body(syms, tail_syms):
        # syms: [B, 1, 4*tb_block] local block; tail_syms: [B, 4*6]
        syms = syms[:, 0, :]
        B = syms.shape[0]
        d = jax.lax.axis_index(mesh_mod.SEQ_AXIS)
        is_first = d == 0
        is_last = d == n_seq - 1

        if use_pallas:
            from ..ops import acs_pallas
            fwd = functools.partial(acs_pallas.forward_regs, ckpt=ckpt,
                                    interpret=interpret)
        else:
            fwd = acs.forward

        # (1) warm-up ACS over the block tail -> boundary metrics
        warm_syms = syms[:, -C.RATE * warm:]
        init1 = jnp.where(is_first,
                          acs.init_metrics(B), _uniform_metrics(B))
        if warm < tb_block:
            _, bmetrics = fwd(warm_syms, warm, initial_metrics=init1)
        else:
            _, bmetrics = fwd(syms, tb_block, initial_metrics=init1)

        # (2) boundary metrics ride the ICI ring to the right neighbor
        recv_metrics = jax.lax.ppermute(bmetrics, mesh_mod.SEQ_AXIS, right)
        entry = jnp.where(is_first, acs.init_metrics(B), recv_metrics)

        # (3) overlap symbols from the right neighbor's prefix
        prefix = syms[:, : C.RATE * overlap]
        recv_prefix = jax.lax.ppermute(prefix, mesh_mod.SEQ_AXIS, left)
        tail_ext = jnp.concatenate(
            [tail_syms,
             jnp.zeros((B, C.RATE * (overlap - C.TAIL_BITS)), syms.dtype)],
            axis=1)
        ext = jnp.where(is_last, tail_ext, recv_prefix)
        full = jnp.concatenate([syms, ext], axis=1)

        hist, fmetrics = fwd(full, tb_block + overlap,
                             initial_metrics=entry)

        # (4) anchored traceback; final block anchors the terminated end
        best = jnp.argmin(fmetrics, axis=1).astype(jnp.int32)
        anchor_state = jnp.where(is_last, jnp.zeros_like(best), best)
        if use_pallas:
            # hist = register checkpoints [K, 64, B]; anchor by index
            anchor_k = jnp.where(is_last,
                                 (tb_block + C.TAIL_BITS) // ckpt - 1,
                                 (tb_block + overlap) // ckpt - 1)
            out = _stream_chainback_regs(hist, anchor_k, anchor_state,
                                         ckpt, tb_block)
        else:
            # hist = decision words [T, B, 2]; anchor by step index
            anchor_j = jnp.where(is_last,
                                 tb_block + C.TAIL_BITS - 1,
                                 tb_block + overlap - 1)
            out = _anchored_chainback(hist, anchor_j, anchor_state,
                                      tb_block + overlap, tb_block)
        return out[:, None, :]   # [B, 1, tb_block // 8]

    sharded = jax.shard_map(
        _shard_body, mesh=mesh,
        in_specs=(P(mesh_mod.DATA_AXIS, mesh_mod.SEQ_AXIS, None),
                  P(mesh_mod.DATA_AXIS, None)),
        out_specs=P(mesh_mod.DATA_AXIS, mesh_mod.SEQ_AXIS, None),
        check_vma=False)  # pallas_call outputs carry no vma info

    @jax.jit
    def decode(symbols, tail_syms):
        B = symbols.shape[0]
        blocks = symbols.astype(jnp.int32).reshape(
            B, n_seq, C.RATE * tb_block)
        out = sharded(blocks, tail_syms.astype(jnp.int32))
        return out.reshape(B, stream_bits // 8)

    return decode


def decode_stream(symbols, framebits: int, mesh=None,
                  overlap: int | None = None,
                  use_pallas: bool | None = None, interpret: bool = False,
                  warmup: int | None = None):
    """Convenience wrapper: ``symbols`` int[B, 4*(framebits+6)] for a
    terminated stream; splits data/tail symbols and decodes sharded."""
    if mesh is None:
        mesh = mesh_mod.make_mesh(n_data=1, n_seq=len(jax.devices()))
    symbols = jnp.asarray(symbols, dtype=jnp.int32)
    data_syms = symbols[:, : C.RATE * framebits]
    tail_syms = symbols[:, C.RATE * framebits: C.RATE * (framebits
                                                         + C.TAIL_BITS)]
    return make_stream_decoder(mesh, framebits, overlap,
                               use_pallas=use_pallas, interpret=interpret,
                               warmup=warmup)(data_syms, tail_syms)
